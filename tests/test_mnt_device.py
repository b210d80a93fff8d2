"""Device engine on the MNT curve cycle (a != 0, Fp3 G2 tower).

The reference instantiates MNT4-298 / MNT6-298 through ark-mnt4/6-298
(/root/reference/Cargo.toml:35-36; benches/bench.rs:154-155).  Their
nonzero short-Weierstrass a-coefficient routes the device engine to the
generic-a complete addition (curves/point.py:_add_general) and MNT6's G2
runs on the Fp3Ops tower (fields/ops.py) — both validated here against
the exact engine, plus full device-prover roundtrips.
"""

import random

import jax
import pytest

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.msm.pippenger import msm_device
from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
from groth16_tpu.protocol.prover import create_proof_with_reduction
from groth16_tpu.protocol.prover_tpu import TpuProver
from groth16_tpu.r1cs.circuits import MySillyCircuit
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.ref.group import g1_jacobian, g2_jacobian
from groth16_tpu.utils.rng import Rng

CURVES = ["mnt4_298", "mnt6_298"]


@pytest.fixture(scope="module", params=CURVES)
def env(request):
    name = request.param
    return name, get_curve(name), RefGroups(name)


def test_g1_add_double_vs_exact(env):
    name, c, ref = env
    g = codec.g1_ops(c)
    assert not g.a_is_zero
    r = random.Random(3)
    base = ref.g1_sample(5)
    pts = [ref.g1_mul(base, r.randrange(1, c.r)) for _ in range(8)]
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
    name, c, ref = env
    g = codec.g2_ops(c)
    assert not g.a_is_zero
    assert g.k.tower_deg == c.g2_field_degree
    r = random.Random(7)
    base = ref.g2_sample(1)
    pts = [ref.g2_mul(base, r.randrange(1, c.r)) for _ in range(6)]
    a_pts = pts + [None, pts[0], pts[1]]
    b_pts = pts[::-1] + [pts[1], pts[0], ref.g2_neg(pts[1])]
    A = codec.g2_to_device(c, a_pts)
    B = codec.g2_to_device(c, b_pts)
    got = codec.g2_from_device(c, g, jax.jit(g.add)(A, B))
    expect = [ref.g2_add(x, y) for x, y in zip(a_pts, b_pts)]
    assert got == expect

    got_dbl = codec.g2_from_device(c, g, jax.jit(g.double)(A))
    expect_dbl = [ref.g2_add(x, x) for x in a_pts]
    assert got_dbl == expect_dbl


def test_msm_g1_vs_exact(env):
    name, c, ref = env
    from groth16_tpu.fields.spec import make_spec

    g = codec.g1_ops(c)
    fr = make_spec(c.r)
    n = 32
    r = random.Random(17)
    base = ref.g1_sample(5)
    pts = [ref.g1_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    pts[5] = None
    scalars = [r.randrange(c.r) for _ in range(n)]
    scalars[3] = 0
    P = codec.g1_to_device(c, pts)
    S = codec.scalars_to_device(scalars, fr)
    fn = jax.jit(lambda P, S: msm_device(g, P, S, c.r.bit_length()))
    got = codec.g1_from_device(c, g, fn(P, S))

    exact = g1_jacobian(c)
    expect = exact.to_affine(exact.msm(pts, scalars))
    assert got == expect


def test_msm_g2_vs_exact(env):
    name, c, ref = env
    from groth16_tpu.fields.spec import make_spec

    g = codec.g2_ops(c)
    fr = make_spec(c.r)
    n = 8
    r = random.Random(19)
    base = ref.g2_sample(1)
    pts = [ref.g2_mul(base, r.randrange(1, c.r)) for _ in range(n)]
    scalars = [r.randrange(c.r) for _ in range(n)]
    P = codec.g2_to_device(c, pts)
    S = codec.scalars_to_device(scalars, fr)
    fn = jax.jit(lambda P, S: msm_device(g, P, S, c.r.bit_length()))
    got = codec.g2_from_device(c, g, fn(P, S))

    exact = g2_jacobian(c)
    expect = exact.to_affine(exact.msm(pts, scalars))
    assert got == expect


@pytest.mark.parametrize("name", CURVES)
def test_prover_device_silly(name):
    """Device prove == exact prove, verifies — mirroring the reference's
    own MNT instantiations (test strategy of src/test.rs:45-73)."""
    rng = Rng(5)
    c = get_curve(name)
    pk, vk = setup(MySillyCircuit(), name, rng)
    pvk = prepare_verifying_key(vk)
    a, b = rng.field_element(c.r), rng.field_element(c.r)
    cval = a * b % c.r
    r, s = rng.field_element(c.r), rng.field_element(c.r)

    expect = create_proof_with_reduction(MySillyCircuit(a=a, b=b), pk, r, s)

    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    MySillyCircuit(a=a, b=b)(cs)
    assert cs.is_satisfied()
    prover = TpuProver(pk, cs.to_matrices())
    got = prover.prove(cs.full_assignment(), r, s)

    assert got == expect
    assert verify_proof(pvk, got, [cval])
