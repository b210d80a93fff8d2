"""Multi-host (2D host x chip mesh) sharded prover.

BASELINE config 5 targets 2^24-constraint batches across hosts: the
outer mesh axis rides DCN, the inner one ICI.  The sharded prover and
four-step NTT take the combined axis tuple — XLA splits each collective
hierarchically — and the proof must equal the 1D-mesh (and exact)
result, since the group math is placement-invariant.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from groth16_tpu.curves.params import get_curve
from groth16_tpu.par.mesh import axis_size, make_mesh_2d
from groth16_tpu.par.prover_dp import ShardedProver
from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
from groth16_tpu.r1cs.circuits import DummyCircuit
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.utils.rng import Rng

CURVE = "bn254"
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (CPU mesh)"
)


def test_axis_size_helper():
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(4, 2), ("host", "chip"))
    assert axis_size(mesh, "host") == 4
    assert axis_size(mesh, ("host", "chip")) == 8


def test_prove_on_host_chip_mesh_matches_1d():
    c = get_curve(CURVE)
    nc, nv = 126, 63
    rng = Rng(0x2D)
    pk, vk = setup(DummyCircuit(nv, nc), CURVE, rng)
    a, b = 3, 5
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(nv, nc, a=a, b=b)(cs)
    assert cs.is_satisfied()
    z = cs.full_assignment()
    r, s = rng.field_element(c.r), rng.field_element(c.r)

    mesh2d = make_mesh_2d(4, 2)
    axes = ("host", "chip")
    p2d = ShardedProver(pk, cs.to_matrices(), mesh=mesh2d, axis=axes)
    proof2d = p2d.prove(z, r, s)

    p1d = ShardedProver(pk, cs.to_matrices())
    proof1d = p1d.prove(z, r, s)

    assert proof2d == proof1d
    assert verify_proof(prepare_verifying_key(vk), proof2d, [a * b % c.r])
