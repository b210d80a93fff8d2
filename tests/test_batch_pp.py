"""Batch/pipeline parallelism (par/batch_pp.py) + the named collective
layer (par/collectives.py) on the 8-virtual-device CPU mesh
(SURVEY.md §2.4 "batch_pp" / §5.8)."""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from groth16_tpu.curves.params import get_curve

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs an 8-device mesh"
)

CURVE = "bn254"


@pytest.fixture(scope="module")
def mesh():
    from groth16_tpu.par.mesh import make_mesh

    return make_mesh(8)


def _silly_jobs(c, n_jobs, seed=9):
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode

    rng = random.Random(seed)
    zs, pubs, cs = [], [], None
    for _ in range(n_jobs):
        a, b = rng.randrange(1, c.r), rng.randrange(1, c.r)
        cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
        MySillyCircuit(a=a, b=b)(cs)
        zs.append(cs.full_assignment())
        pubs.append([a * b % c.r])
    return zs, pubs, cs.to_matrices()


def test_prove_batch_sharded(mesh):
    """8 proofs, batch axis sharded over the 8-device mesh; every proof
    verifies and matches the single-chip prover bit-exactly."""
    from groth16_tpu.par.batch_pp import prove_batch_sharded
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.utils.rng import Rng

    c = get_curve(CURVE)
    rng = Rng(0xBA7C)
    pk, vk = setup(MySillyCircuit(), CURVE, rng)
    zs, pubs, mats = _silly_jobs(c, 8)
    prover = TpuProver(pk, mats)
    rs = [rng.field_element(c.r) for _ in zs]
    ss = [rng.field_element(c.r) for _ in zs]

    proofs = prove_batch_sharded(prover, zs, rs, ss, mesh)
    pvk = prepare_verifying_key(vk)
    for proof, pub in zip(proofs, pubs):
        assert verify_proof(pvk, proof, pub)
    # bit-exact vs the single-chip prover on one sample
    single = prover.prove(zs[3], rs[3], ss[3])
    assert single == proofs[3]


def test_proof_stream_pipelined():
    """ProofStream yields in order with bounded in-flight depth; results
    match direct proves."""
    from groth16_tpu.par.batch_pp import ProofStream
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.utils.rng import Rng

    c = get_curve(CURVE)
    rng = Rng(0x51BE)
    pk, vk = setup(MySillyCircuit(), CURVE, rng)
    zs, pubs, mats = _silly_jobs(c, 5, seed=3)
    prover = TpuProver(pk, mats)
    rs = [rng.field_element(c.r) for _ in zs]
    ss = [rng.field_element(c.r) for _ in zs]
    stream = ProofStream(prover, depth=2)
    proofs = list(stream.prove_all(zip(zs, rs, ss)))
    assert len(proofs) == len(zs)
    pvk = prepare_verifying_key(vk)
    for proof, pub, z, r, s in zip(proofs, pubs, zs, rs, ss):
        assert verify_proof(pvk, proof, pub)
        assert proof == prover.prove(z, r, s)


def test_collectives_transpose_and_reduce(mesh):
    """transpose_a2a is the [R, C] -> [C, R] global transpose;
    gather_tree_reduce sums per-shard partials; psum_field reduces
    field vectors; ring_shift rotates shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from groth16_tpu.fields.spec import decode, encode, make_spec
    from groth16_tpu.fields import fp
    from groth16_tpu.par.collectives import (
        psum_field,
        ring_shift,
        transpose_a2a,
    )

    c = get_curve(CURVE)
    fr = make_spec(c.r, name="t.Fr")
    R, C = 16, 8
    x = np.arange(R * C, dtype=np.uint32).reshape(1, R, C)
    x = np.repeat(x, 2, axis=0)  # fake 2-limb field rows
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "data")))
    out = jax.jit(jax.shard_map(
        lambda v: transpose_a2a(v, "data"),
        mesh=mesh,
        in_specs=P(None, "data"),
        out_specs=P(None, "data"),
        check_vma=False,
    ))(xs)
    assert np.array_equal(np.asarray(out), x.transpose(0, 2, 1))

    # psum_field: 8 shards of field vectors sum mod p
    vals = [[random.Random(i).randrange(c.r) for _ in range(4)]
            for i in range(8)]
    flat = [v for row in vals for v in row]
    a = jax.device_put(
        jnp.asarray(encode(flat, fr)).reshape(fr.n_limbs, 8, 4),
        NamedSharding(mesh, P(None, "data")),
    )
    got = jax.jit(jax.shard_map(
        lambda v: psum_field(fr, v[:, 0], "data", 8),
        mesh=mesh,
        in_specs=P(None, "data"),
        out_specs=P(None),
        check_vma=False,
    ))(a)
    want = [sum(col) % c.r for col in zip(*vals)]
    assert decode(np.asarray(got), fr) == want

    # ring_shift by 3: shard i's block lands at shard (i+3) % 8
    blocks = jnp.arange(8, dtype=jnp.int32)[:, None]  # [8, 1]
    bs = jax.device_put(blocks, NamedSharding(mesh, P("data", None)))
    shifted = jax.jit(jax.shard_map(
        lambda v: ring_shift(v, "data", 8, offset=3),
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=P("data", None),
        check_vma=False,
    ))(bs)
    assert list(np.asarray(shifted)[:, 0]) == [(i - 3) % 8 for i in range(8)]
