"""MNT4-298 / MNT6-298 cycle: parameter self-validation, pairings,
prove/verify/serde (exact engine).  Reference parity targets:
benches/bench.rs:154-155 and the gadget test's curve cycle
(constraints.rs:452-589)."""

import math

import pytest

from groth16_tpu.curves.params import get_curve


def test_mnt_cycle_structure():
    m4, m6 = get_curve("mnt4_298"), get_curve("mnt6_298")
    # the 2-cycle: each curve's base field is the other's scalar field
    assert m4.p == m6.r and m4.r == m6.p
    # MNT4 family polynomials: r = l^2 + 1, p = l^2 + l + 1
    l = math.isqrt(m4.r - 1)
    assert l * l + 1 == m4.r and l * l + l + 1 == m4.p
    # embedding degrees exactly 4 and 6
    assert (m4.p**4 - 1) % m4.r == 0 and (m4.p**2 - 1) % m4.r != 0
    assert (m6.p**6 - 1) % m6.r == 0
    assert (m6.p**3 - 1) % m6.r != 0 and (m6.p**2 - 1) % m6.r != 0
    # prime order G1 (cofactor one)
    assert m4.h1 == 1 and m6.h1 == 1


@pytest.mark.parametrize("name", ["mnt4_298", "mnt6_298"])
def test_mnt_pairing_bilinear(name):
    from groth16_tpu.ref.curve import RefGroups
    from groth16_tpu.ref.pairing import make_pairing

    g = RefGroups(name)
    e = make_pairing(name)
    P = g.g1_sample(3)
    Q = g.g2_sample(5)
    base = e.pairing(P, Q)
    assert base != e.kgt.one()
    a, b = 76543, 13579
    assert e.pairing(g.g1_mul(P, a), g.g2_mul(Q, b)) == e.kgt.pow(base, a * b)


@pytest.mark.parametrize("name", ["mnt4_298", "mnt6_298"])
def test_mnt_prove_verify_serde(name):
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.serde import (
        deserialize_proof,
        deserialize_verifying_key,
        serialize_proof,
        serialize_verifying_key,
    )
    from groth16_tpu.utils.rng import Rng

    c = get_curve(name)
    rng = Rng(0x111)
    pk, vk = setup(MySillyCircuit(), name, rng)
    a, b = 11, 13
    proof = create_proof_with_reduction(
        MySillyCircuit(a=a, b=b), pk, rng.field_element(c.r), rng.field_element(c.r)
    )
    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, [a * b % c.r])
    assert not verify_proof(pvk, proof, [a])
    for compress in (True, False):
        pb = serialize_proof(proof, compress=compress)
        assert deserialize_proof(pb, name, compress=compress) == proof
        vb = serialize_verifying_key(vk, compress=compress)
        assert deserialize_verifying_key(vb, name, compress=compress) == vk
