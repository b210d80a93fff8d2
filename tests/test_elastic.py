"""Failure detection / elastic recovery (SURVEY.md §5.3 build analog).

The reference has no such subsystem (single-process; errors are
SynthesisError results, /root/reference/src/lib.rs:49); these tests
cover the TPU-scale layer: proof self-verification as the detector,
per-shard MSM checksums as the localizer, and mesh-shrinking retry as
the recovery path.  Run on the 8-virtual-device CPU mesh
(GROTH16_TEST_PLATFORM=cpu).
"""

import dataclasses

import jax
import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.par.elastic import (
    ElasticProver,
    ProverFaultError,
    localize_faults,
)
from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
from groth16_tpu.r1cs.circuits import DummyCircuit
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.utils.rng import Rng

CURVE = "bn254"
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (CPU mesh)"
)


@pytest.fixture(scope="module")
def fixture():
    c = get_curve(CURVE)
    nc, nv = 126, 63
    rng = Rng(0xFA11)
    pk, vk = setup(DummyCircuit(nv, nc), CURVE, rng)
    a, b = 3, 5
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(nv, nc, a=a, b=b)(cs)
    assert cs.is_satisfied()
    z = cs.full_assignment()
    r, s = rng.field_element(c.r), rng.field_element(c.r)
    return c, pk, vk, cs.to_matrices(), z, r, s, a * b % c.r


def test_healthy_prove_checked_single_attempt(fixture):
    c, pk, vk, mats, z, r, s, out = fixture
    ep = ElasticProver(pk, mats)
    proof, report = ep.prove_checked(z, r, s)
    assert not report.retried and report.attempts[0].ok
    assert verify_proof(prepare_verifying_key(vk), proof, [out])


def test_checksums_deterministic_and_localize_empty(fixture):
    c, pk, vk, mats, z, r, s, out = fixture
    ep = ElasticProver(pk, mats)
    assert localize_faults(ep._prover, z, passes=3) == []


def test_sdc_detected_and_retried(fixture):
    """A corrupted proof (SDC model) must fail self-verification and be
    re-proved; the retry proof equals the clean one."""
    c, pk, vk, mats, z, r, s, out = fixture

    def corrupt_first(attempt, proof):
        if attempt == 0:
            ax, ay = proof.a
            return dataclasses.replace(proof, a=((ax + 1) % c.p, ay))
        return proof

    ep = ElasticProver(pk, mats, fault_hook=corrupt_first)
    clean = ElasticProver(pk, mats).prove_checked(z, r, s)[0]
    proof, report = ep.prove_checked(z, r, s)
    assert report.retried
    assert report.attempts[0].error == "proof failed self-verification"
    assert proof == clean


def test_device_loss_shrinks_mesh_same_proof(fixture):
    """Device-loss model: the first attempt raises; recovery rebuilds on
    half the devices and produces the identical proof (exact group math
    is mesh-shape-invariant)."""
    c, pk, vk, mats, z, r, s, out = fixture

    def lose_device(attempt, proof):
        if attempt == 0:
            raise RuntimeError("TPU backend error: device lost (injected)")
        return proof

    ep = ElasticProver(pk, mats, fault_hook=lose_device)
    n0 = ep.n_devices
    clean = ElasticProver(pk, mats).prove_checked(z, r, s)[0]
    proof, report = ep.prove_checked(z, r, s)
    assert report.retried and not report.attempts[0].ok
    assert ep.n_devices == n0 // 2
    assert proof == clean


def test_persistent_fault_exhausts_attempts(fixture):
    c, pk, vk, mats, z, r, s, out = fixture

    def always_corrupt(attempt, proof):
        ax, ay = proof.a
        return dataclasses.replace(proof, a=((ax + 1) % c.p, ay))

    ep = ElasticProver(pk, mats, max_attempts=2, fault_hook=always_corrupt)
    with pytest.raises(ProverFaultError):
        ep.prove_checked(z, r, s)
