"""Multi-device sharding tests (8-device CPU mesh; SURVEY.md §4).

Run with GROTH16_TEST_PLATFORM=cpu (the conftest then forces an
8-virtual-device CPU backend).  These tests self-skip when fewer than 8
devices are visible (e.g. the single-chip TPU run).
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import decode, encode, make_spec

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs an 8-device mesh"
)

CURVE = "bn254"


@pytest.fixture(scope="module")
def mesh():
    from groth16_tpu.par.mesh import make_mesh

    return make_mesh(8)


def test_sharded_ntt_matches_single(mesh):
    from groth16_tpu.ntt.ntt import NttDomain
    from groth16_tpu.par.mesh import shard_elements
    from groth16_tpu.par.ntt_cp import ShardedNtt

    c = get_curve(CURVE)
    n = 128
    d = NttDomain(c.fr, n)
    sntt = ShardedNtt(d, mesh)
    rng = random.Random(4)
    coeffs = [rng.randrange(c.r) for _ in range(n)]
    a = jnp.asarray(encode(coeffs, d.spec))
    a_sh = shard_elements(mesh, a)

    for fn_s, fn_1 in [
        (sntt.fft, d.fft),
        (sntt.ifft, d.ifft),
        (sntt.coset_fft, d.coset_fft),
        (sntt.coset_ifft, d.coset_ifft),
    ]:
        got = decode(np.asarray(fn_s(a_sh)), d.spec)
        expect = decode(np.asarray(fn_1(a)), d.spec)
        assert got == expect, fn_1.__name__


def test_sharded_msm_matches_exact(mesh):
    from groth16_tpu.curves import codec
    from groth16_tpu.par.prover_dp import msm_sharded_lanes
    from groth16_tpu.ref.curve import RefGroups
    from groth16_tpu.ref.group import FpCtx, JacobianOps

    c = get_curve(CURVE)
    ref = RefGroups(CURVE)
    g = codec.g1_ops(c)
    fr = make_spec(c.r)
    n = 32
    rng = random.Random(9)
    base = ref.g1_sample(3)
    pts = [ref.g1_mul(base, rng.randrange(1, c.r)) for _ in range(n)]
    scalars = [rng.randrange(c.r) for _ in range(n)]
    P1 = codec.g1_to_device(c, pts)
    pts2 = tuple(jnp.stack([x, x], axis=-2) for x in P1)  # 2 lanes
    S = codec.scalars_to_device(scalars, fr)
    S2 = jnp.stack([S, S], axis=0)
    acc = msm_sharded_lanes(g, pts2, S2, c.r.bit_length(), mesh)
    got = codec.g1_from_device(c, g, acc)

    exact = JacobianOps(FpCtx(c.p))
    expect = exact.to_affine(exact.msm(pts, scalars))
    assert got == [expect, expect]


def test_sharded_prover_end_to_end(mesh):
    from groth16_tpu.par.prover_dp import ShardedProver
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.r1cs.circuits import DummyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.rng import Rng

    c = get_curve(CURVE)
    rng = Rng(77)
    ncon, nvar = 126, 64
    pk, vk = setup(DummyCircuit(nvar, ncon), CURVE, rng)
    a, b = 3, 5
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(nvar, ncon, a=a, b=b)(cs)
    assert cs.is_satisfied()
    r_zk, s_zk = rng.field_element(c.r), rng.field_element(c.r)

    expect = create_proof_with_reduction(
        DummyCircuit(nvar, ncon, a=a, b=b), pk, r_zk, s_zk
    )
    prover = ShardedProver(pk, cs.to_matrices(), mesh=mesh)
    got = prover.prove(cs.full_assignment(), r_zk, s_zk)
    assert got == expect
    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, got, [15])

