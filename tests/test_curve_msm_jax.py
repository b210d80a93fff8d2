"""Device Jacobian ops + MSM vs. the exact engine (bls12_377 G1/G2)."""

import random

import numpy as np
import pytest
import jax

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.msm.fixed_base import batch_mul_device, build_window_table
from groth16_tpu.msm.pippenger import msm_device, window_digits
from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.ref.group import FpCtx, JacobianOps
from groth16_tpu.ref.field import Fp2Ctx

CURVE = "bls12_377"


@pytest.fixture(scope="module")
def env():
    c = get_curve(CURVE)
    ref = RefGroups(CURVE)
    return c, ref


def _g1_points(ref, n, seed=3):
    r = random.Random(seed)
    base = ref.g1_sample(5)
    return [ref.g1_mul(base, r.randrange(1, ref.c.r)) for _ in range(n)]


def test_g1_add_double_vs_exact(env):
    c, ref = env
    g = codec.g1_ops(c)
    pts = _g1_points(ref, 8)
    # include special cases: infinity, doubling pairs, negation pairs
    a_pts = pts + [None, pts[0], pts[1], None]
    b_pts = pts[::-1] + [pts[2], pts[0], ref.g1_neg(pts[1]), None]
    A = codec.g1_to_device(c, a_pts)
    B = codec.g1_to_device(c, b_pts)
    got = codec.g1_from_device(c, g, jax.jit(g.add)(A, B))
    expect = [ref.g1_add(x, y) for x, y in zip(a_pts, b_pts)]
    assert got == expect

    got_dbl = codec.g1_from_device(c, g, jax.jit(g.double)(A))
    expect_dbl = [ref.g1_add(x, x) for x in a_pts]
    assert got_dbl == expect_dbl


def test_g2_add_double_vs_exact(env):
    c, ref = env
    g = codec.g2_ops(c)
    r = random.Random(7)
    base = ref.g2_sample(1)
    pts = [ref.g2_mul(base, r.randrange(1, c.r)) for _ in range(6)]
    a_pts = pts + [None, pts[0]]
    b_pts = pts[::-1] + [pts[1], pts[0]]
    A = codec.g2_to_device(c, a_pts)
    B = codec.g2_to_device(c, b_pts)
    got = codec.g2_from_device(c, g, jax.jit(g.add)(A, B))
    expect = [ref.g2_add(x, y) for x, y in zip(a_pts, b_pts)]
    assert got == expect


def test_window_digits():
    c = get_curve(CURVE)
    from groth16_tpu.fields.spec import make_spec

    fr = make_spec(c.r)
    vals = [random.Random(11).randrange(c.r) for _ in range(5)]
    s = codec.scalars_to_device(vals, fr)
    for cbits, w in [(16, 0), (16, 3), (13, 2), (8, 7), (5, 11)]:
        got = list(np.asarray(window_digits(s, cbits, w)))
        expect = [(v >> (cbits * w)) & ((1 << cbits) - 1) for v in vals]
        assert got == expect, (cbits, w)


def test_msm_g1_vs_exact(env):
    c, ref = env
    g = codec.g1_ops(c)
    from groth16_tpu.fields.spec import make_spec

    fr = make_spec(c.r)
    n = 64
    r = random.Random(17)
    pts = _g1_points(ref, n)
    pts[5] = None  # infinity base must be handled
    scalars = [r.randrange(c.r) for _ in range(n)]
    scalars[3] = 0
    P = codec.g1_to_device(c, pts)
    S = codec.scalars_to_device(scalars, fr)
    fn = jax.jit(lambda P, S: msm_device(g, P, S, c.r.bit_length()))
    got = codec.g1_from_device(c, g, fn(P, S))

    exact = JacobianOps(FpCtx(c.p))
    expect = exact.to_affine(exact.msm(pts, scalars))
    assert got == expect


def test_msm_g2_vs_exact(env):
    c, ref = env
    g = codec.g2_ops(c)
    from groth16_tpu.fields.spec import make_spec

    fr = make_spec(c.r)
    n = 16
    r = random.Random(19)
    base = ref.g2_sample(1)
    pts = [ref.g2_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    scalars = [r.randrange(c.r) for _ in range(n)]
    P = codec.g2_to_device(c, pts)
    S = codec.scalars_to_device(scalars, fr)
    fn = jax.jit(lambda P, S: msm_device(g, P, S, c.r.bit_length()))
    got = codec.g2_from_device(c, g, fn(P, S))

    exact = JacobianOps(Fp2Ctx(c.p, c.fp2_nonresidue))
    expect = exact.to_affine(exact.msm(pts, scalars))
    assert got == expect


def test_fixed_base_batch_mul_vs_exact(env):
    c, ref = env
    g = codec.g1_ops(c)
    from groth16_tpu.fields.spec import make_spec

    fr = make_spec(c.r)
    base = ref.g1_sample(5)
    r = random.Random(23)
    scalars = [r.randrange(c.r) for _ in range(17)] + [0, 1]
    cbits = 8
    num_windows = -(-c.r.bit_length() // cbits)
    B = codec.g1_to_device(c, [base])
    base_single = tuple(a[..., 0] for a in B)
    table = jax.jit(
        lambda b: build_window_table(g, b, cbits, num_windows)
    )(base_single)
    S = codec.scalars_to_device(scalars, fr)
    got = codec.g1_from_device(
        c,
        g,
        jax.jit(
            lambda t, s: batch_mul_device(g, t, s, cbits, c.r.bit_length())
        )(table, S),
    )
    expect = [ref.g1_mul(base, s) for s in scalars]
    assert got == expect


def test_g1_add_fused_batch_vs_exact(env):
    """Batch >= the Pallas threshold: exercises the fused RCB kernel on
    TPU (XLA path on CPU); values must match the exact engine and digits
    must match the XLA path."""
    c, ref = env
    g = codec.g1_ops(c)
    r = random.Random(31)
    base = ref.g1_sample(5)
    n = 512
    pts = [ref.g1_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    qts = [ref.g1_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    pts[7] = None
    qts[9] = None
    qts[11] = pts[11]
    qts[12] = ref.g1_neg(pts[12])
    A = codec.g1_to_device(c, pts)
    B = codec.g1_to_device(c, qts)
    out = jax.jit(g.add)(A, B)
    got = codec.g1_from_device(c, g, out)
    assert got == [ref.g1_add(x, y) for x, y in zip(pts, qts)]
    from groth16_tpu.config import configure

    with configure(use_pallas="off"):
        xla = jax.jit(g.add)(A, B)
    for a, b in zip(out, xla):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_g2_add_fused_batch_vs_exact(env):
    c, ref = env
    g = codec.g2_ops(c)
    r = random.Random(33)
    base = ref.g2_sample(1)
    n = 256
    pts = [ref.g2_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    qts = [ref.g2_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    pts[3] = None
    qts[5] = pts[5]
    A = codec.g2_to_device(c, pts)
    B = codec.g2_to_device(c, qts)
    got = codec.g2_from_device(c, g, jax.jit(g.add)(A, B))
    assert got == [ref.g2_add(x, y) for x, y in zip(pts, qts)]


@pytest.mark.parametrize("signed", [True, False])
@pytest.mark.parametrize("wbits", [3, 9])
def test_msm_digit_mode_matrix(env, signed, wbits):
    """Signed-digit recode x packed-sort-key regimes (pippenger.py
    group_sums): wbits=3 at n=64 exercises multi-window carries with
    small buckets; wbits=9 makes c + 1 + idx_bits straddle the packed
    key budget only in one mode.  All four cells must equal the exact
    engine."""
    from groth16_tpu.config import configure
    from groth16_tpu.fields.spec import make_spec

    c, ref = env
    g = codec.g1_ops(c)
    fr = make_spec(c.r)
    n = 64
    r = random.Random(23)
    pts = _g1_points(ref, n, seed=11)
    pts[0] = None
    scalars = [r.randrange(c.r) for _ in range(n)]
    scalars[1] = 0
    scalars[2] = c.r - 1  # max scalar: full carry chain in signed mode
    P = codec.g1_to_device(c, pts)
    S = codec.scalars_to_device(scalars, fr)

    with configure(msm_signed_digits=signed):
        fn = jax.jit(
            lambda P, S: msm_device(g, P, S, c.r.bit_length(), wbits)
        )
        got = codec.g1_from_device(c, g, fn(P, S))

    exact = JacobianOps(FpCtx(c.p))
    expect = exact.to_affine(exact.msm(pts, scalars))
    assert got == expect
