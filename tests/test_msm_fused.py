"""Fused Pallas MSM scan (msm/pallas_scan.py) vs the capture-scan path.

The fused kernel only lowers on the TPU backend; on the CPU test mesh
these self-skip (the capture path IS the CPU path and is covered by
tests/test_curve_msm_jax.py).  Fixtures include duplicate points,
infinities and shared-scalar lanes — the completeness cases the RCB
formulas must absorb (duplicates arise in real circuits: equal
constraint rows give equal query points, /root/reference/src/test.rs:24-38
uses six duplicated constraints).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from groth16_tpu.config import configure, pallas_enabled
from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import encode, make_spec
from groth16_tpu.msm.pippenger import (
    choose_window_bits,
    first_ge_histogram,
    msm_device_lanes,
)
from groth16_tpu.ref.curve import RefGroups

pytestmark = pytest.mark.skipif(
    not pallas_enabled(), reason="fused scan kernel needs the TPU backend"
)

CURVE = "bls12_377"
N = 1 << 10


@pytest.fixture(scope="module")
def env():
    return get_curve(CURVE), RefGroups(CURVE)


def _run_both(g, P, S, sbits, wbits=None):
    with configure(msm_fused_scan=True):
        out_f = jax.jit(
            lambda p, s: msm_device_lanes(g, p, s, sbits, wbits)
        )(P, S)
    with configure(msm_fused_scan=False):
        out_o = jax.jit(
            lambda p, s: msm_device_lanes(g, p, s, sbits, wbits)
        )(P, S)
    return out_f, out_o


def test_first_ge_histogram_matches_searchsorted():
    rng = random.Random(5)
    B = 257
    digits = jnp.asarray(
        [[rng.randrange(B) for _ in range(512)] for _ in range(3)],
        jnp.uint32,
    )
    got = first_ge_histogram(digits, B)
    skeys = jnp.sort(digits, axis=-1)
    want = jax.vmap(
        lambda d, v: jnp.searchsorted(d, v, side="left")
    )(skeys, jnp.broadcast_to(jnp.arange(1, B, dtype=jnp.uint32), (3, B - 1)))
    assert (got == want).all()


def test_fused_g1_matches_capture_and_exact(env):
    c, ref = env
    g = codec.g1_ops(c)
    rng = random.Random(2)
    base = ref.g1_sample(5)
    pts = [ref.g1_mul(base, rng.randrange(1, c.r)) for _ in range(32)]
    pool = pts + [None, pts[0], pts[1]]  # duplicates + infinity
    chosen = [pool[rng.randrange(len(pool))] for _ in range(N)]
    P = tuple(
        jnp.stack([x, x], axis=-2) for x in codec.g1_to_device(c, chosen)
    )
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    s0 = [rng.randrange(c.r) for _ in range(N)]
    S = jnp.stack([jnp.asarray(encode(s, fr, mont=False)) for s in (s0, s0)])
    sbits = c.r.bit_length()
    out_f, out_o = _run_both(g, P, S, sbits)
    got_f = codec.g1_from_device(c, g, out_f)
    assert got_f == codec.g1_from_device(c, g, out_o)
    acc = None
    for p, s in zip(chosen, s0):
        if p is not None:
            acc = ref.g1_add(acc, ref.g1_mul(p, s))
    assert got_f == [acc, acc]


def test_fused_g2_matches_capture(env):
    c, ref = env
    g = codec.g2_ops(c)
    rng = random.Random(3)
    base = ref.g2_sample(1)
    pts = [ref.g2_mul(base, rng.randrange(1, c.r)) for _ in range(16)]
    pool = pts + [None, pts[0]]
    chosen = [pool[rng.randrange(len(pool))] for _ in range(N)]
    P = tuple(x[..., None, :] for x in codec.g2_to_device(c, chosen))
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    s0 = [rng.randrange(c.r) for _ in range(N)]
    S = jnp.asarray(encode(s0, fr, mont=False))[None]
    sbits = c.r.bit_length()
    out_f, out_o = _run_both(g, P, S, sbits)
    assert codec.g2_from_device(c, g, out_f) == codec.g2_from_device(
        c, g, out_o
    )


def test_fused_wide_window(env):
    """Wide windows (the fused tail's raison d'etre): B-1 > n."""
    c, ref = env
    g = codec.g1_ops(c)
    rng = random.Random(4)
    base = ref.g1_sample(5)
    chosen = [ref.g1_mul(base, rng.randrange(1, c.r)) for _ in range(256)]
    P = tuple(x[..., None, :] for x in codec.g1_to_device(c, chosen))
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    s0 = [rng.randrange(c.r) for _ in range(256)]
    S = jnp.asarray(encode(s0, fr, mont=False))[None]
    sbits = c.r.bit_length()
    out_f, out_o = _run_both(g, P, S, sbits, wbits=12)
    assert codec.g1_from_device(c, g, out_f) == codec.g1_from_device(
        c, g, out_o
    )


def test_chooser_uses_path_dependent_bucket_cost(env):
    c, _ = env
    sbits = c.r.bit_length()
    wide = choose_window_bits(1 << 16, sbits, signed=True, bucket_cost=4)
    narrow = choose_window_bits(1 << 16, sbits, signed=True, bucket_cost=50)
    assert wide > narrow


def test_histogram_exact_inside_msm_program_large_B():
    """Regression pin for the round-4 int8-dot miscompile
    (msm/pippenger.py first_ge_histogram): an int8->int32 dot_general
    variant of the histogram was CORRECT in isolation but produced
    wrong bucket boundaries when fused into the full MSM program on the
    v5e backend — silent wrong proofs.  The shipped kernel uses bf16
    one-hots with fp32 accumulation (exact for per-chunk counts <=
    2048 < 2^24).  This test reproduces the failing COMPOSITION shape:
    the histogram computed inside one jitted program next to real MSM
    work, at the B >= 2^11 bucket counts where the miscompile showed,
    checked against searchsorted-on-sorted host truth.  If someone
    "optimizes" the one-hots back to an integer dot, this fails on the
    TPU backend before the prover does."""
    import numpy as np

    c = get_curve(CURVE)
    g = codec.g1_ops(c)
    ref = RefGroups(CURVE)
    rng = random.Random(11)
    n = 1 << 12
    B = (1 << 12) + 1  # c=13 signed magnitudes
    digits_np = np.asarray(
        [[rng.randrange(B) for _ in range(n)] for _ in range(2)],
        dtype=np.uint32,
    )
    digits = jnp.asarray(digits_np)
    pts = [ref.g1_mul(ref.g1_sample(5), rng.randrange(1, c.r))
           for _ in range(64)]
    chosen = [pts[rng.randrange(len(pts))] for _ in range(n)]
    P = tuple(x[..., None, :] for x in codec.g1_to_device(c, chosen))
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    s0 = [rng.randrange(c.r) for _ in range(n)]
    S = jnp.asarray(encode(s0, fr, mont=False))[None]
    sbits = c.r.bit_length()

    @jax.jit
    def combined(d, p, s):
        # histogram co-resident with the MSM graph: the fusion context
        # that broke the int8 variant
        h = first_ge_histogram(d, B)
        acc = msm_device_lanes(g, p, s, sbits, 13)
        return h, acc

    got, _ = jax.block_until_ready(combined(digits, P, S))
    want = np.stack([
        np.searchsorted(np.sort(row), np.arange(1, B), side="left")
        for row in digits_np
    ])
    assert (np.asarray(got) == want).all()
