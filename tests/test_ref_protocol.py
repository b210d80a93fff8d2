"""End-to-end Groth16 lifecycle on the exact reference engine.

Mirrors the reference's own test strategy (SURVEY.md §4):
- setup -> prove -> verify roundtrip + negative check (src/test.rs:45-73)
- rerandomization validity + distinctness (src/test.rs:75-118)
- MiMC-322 preimage circuit fixture (tests/mimc.rs:145-229)
"""

import pytest

from groth16_tpu.curves.params import get_curve, CURVES
from groth16_tpu.protocol import (
    prepare_verifying_key,
    prove,
    rerandomize_proof,
    setup,
    verify_proof,
)
from groth16_tpu.r1cs.circuits import MIMC_ROUNDS, MiMCDemo, MySillyCircuit, mimc
from groth16_tpu.utils.rng import Rng


@pytest.mark.parametrize("name", CURVES)
def test_prove_and_verify(name):
    rng = Rng(42)
    c = get_curve(name)
    pk, vk = setup(MySillyCircuit(), name, rng)
    pvk = prepare_verifying_key(vk)
    for _ in range(2):
        a = rng.field_element(c.r)
        b = rng.field_element(c.r)
        cval = a * b % c.r
        proof = prove(pk, MySillyCircuit(a=a, b=b), rng)
        assert verify_proof(pvk, proof, [cval])
        assert not verify_proof(pvk, proof, [a])


def test_rerandomize():
    name = "bn254"
    rng = Rng(7)
    c = get_curve(name)
    pk, vk = setup(MySillyCircuit(), name, rng)
    pvk = prepare_verifying_key(vk)
    a, b = rng.field_element(c.r), rng.field_element(c.r)
    cval = a * b % c.r
    proof1 = prove(pk, MySillyCircuit(a=a, b=b), rng)
    proof2 = rerandomize_proof(vk, proof1, rng)
    proof3 = rerandomize_proof(vk, proof2, rng)
    for pf in (proof1, proof2, proof3):
        assert verify_proof(pvk, pf, [cval])
        assert not verify_proof(pvk, pf, [a])
    assert proof1 != proof2 and proof1 != proof3 and proof2 != proof3


def test_no_zk_skips_g1_b():
    """r == 0 path (prover.rs:98-108, create_proof_with_reduction_no_zk)."""
    from groth16_tpu.protocol.prover import create_proof_with_reduction

    name = "bn254"
    rng = Rng(9)
    c = get_curve(name)
    pk, vk = setup(MySillyCircuit(), name, rng)
    pvk = prepare_verifying_key(vk)
    a, b = 3, 5
    proof = create_proof_with_reduction(MySillyCircuit(a=a, b=b), pk, 0, 0)
    assert verify_proof(pvk, proof, [15])


def test_mimc_bls12_377():
    """The canonical real-circuit fixture (tests/mimc.rs)."""
    name = "bls12_377"
    rng = Rng(1234)
    c = get_curve(name)
    constants = [rng.field_element(c.r) for _ in range(MIMC_ROUNDS)]

    pk, vk = setup(MiMCDemo(constants), name, rng)
    pvk = prepare_verifying_key(vk)

    xl = rng.field_element(c.r)
    xr = rng.field_element(c.r)
    image = mimc(xl, xr, constants, c.r)

    proof = prove(pk, MiMCDemo(constants, xl=xl, xr=xr), rng)
    assert verify_proof(pvk, proof, [image])
    assert not verify_proof(pvk, proof, [(image + 1) % c.r])
