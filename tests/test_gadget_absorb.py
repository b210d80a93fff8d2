"""Absorb / ToBytes gadgets vs the host transcript (protocol/absorb.py).

The in-circuit flattening (constraints.rs:78-110, 432-450 analogs) must
produce exactly the field-element and byte streams the native Absorb
impl produces, with a satisfied constraint system.
"""

import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.gadgets.absorb_var import (
    proof_to_field_elements_var,
    vk_to_sponge_bytes_var,
    vk_to_sponge_field_elements_var,
)
from groth16_tpu.gadgets.groth16_var import ProofVar, VerifyingKeyVar
from groth16_tpu.gadgets.r1cs_std import FpVar, to_bits_le, to_bytes_le
from groth16_tpu.protocol import absorb
from groth16_tpu.protocol.generator import setup
from groth16_tpu.protocol.prover import create_proof_with_reduction
from groth16_tpu.r1cs.circuits import MySillyCircuit
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.utils.rng import Rng

INNER = "bls12_377"  # outer constraint field = inner base field (bw6 Fr)


def _outer_cs():
    c = get_curve(INNER)
    return ConstraintSystem(c.p, mode=SynthesisMode.PROVE), c


def test_to_bits_le_canonical_and_satisfied():
    cs, c = _outer_cs()
    for v in (0, 1, 2, c.p - 1, 0x1234567890ABCDEF, c.p // 3):
        x = FpVar.new_witness(cs, v)
        bits = to_bits_le(x)
        got = sum(int(b.var.value) << i for i, b in enumerate(bits))
        assert got == v
    assert cs.is_satisfied()


def test_to_bytes_le_matches_host_encoding():
    cs, c = _outer_cs()
    nbytes = (c.p.bit_length() + 7) // 8
    v = 0xDEADBEEFCAFE12345678
    bs = to_bytes_le(FpVar.new_witness(cs, v))
    assert len(bs) == nbytes
    assert bytes(b.value for b in bs) == v.to_bytes(nbytes, "little")
    assert cs.is_satisfied()


@pytest.fixture(scope="module")
def inner_fixture():
    c = get_curve(INNER)
    rng = Rng(9)
    pk, vk = setup(MySillyCircuit(), INNER, rng)
    proof = create_proof_with_reduction(
        MySillyCircuit(a=4, b=7), pk, rng.field_element(c.r), rng.field_element(c.r)
    )
    return vk, proof


def test_vk_absorb_gadget_matches_host(inner_fixture):
    vk, _ = inner_fixture
    cs, c = _outer_cs()
    vkvar = VerifyingKeyVar(cs, INNER, vk=vk)
    els = vk_to_sponge_field_elements_var(vkvar)
    assert [e.value for e in els] == [
        v % c.p for v in absorb.vk_to_field_elements(vk)
    ]
    by = vk_to_sponge_bytes_var(vkvar)
    assert bytes(b.value for b in by) == absorb.vk_to_sponge_bytes(vk)
    assert cs.is_satisfied()


def test_proof_absorb_gadget_matches_host(inner_fixture):
    _, proof = inner_fixture
    cs, c = _outer_cs()
    pvar = ProofVar(cs, proof)
    els = proof_to_field_elements_var(pvar)
    assert [e.value for e in els] == [
        v % c.p for v in absorb.proof_to_field_elements(proof)
    ]
    assert cs.is_satisfied()
