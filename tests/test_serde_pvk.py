"""PreparedVerifyingKey + GT serialization across every curve family.

The reference derives CanonicalSerialize on PreparedVerifyingKey
(/root/reference/src/data_structures.rs:87-97), giving zero-recompute
PVK caching — e(alpha, beta) is stored, not recomputed.  These tests
cover the analog for the ate (Fp12) and Tate (BW6 Fq6, MNT4 Fp4, MNT6
Fp6) engines: byte roundtrip, no-pairing deserialization, and a proof
verifying against the deserialized PVK.
"""

import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
from groth16_tpu.protocol.prover import create_proof_with_reduction
from groth16_tpu.r1cs.circuits import MySillyCircuit
from groth16_tpu.serde import (
    deserialize_prepared_verifying_key,
    serialize_prepared_verifying_key,
)
from groth16_tpu.utils.rng import Rng

CURVES = ["bn254", "bls12_381", "bw6_761", "mnt4_298", "mnt6_298"]


@pytest.mark.parametrize("curve", CURVES)
@pytest.mark.parametrize("compress", [True, False])
def test_pvk_roundtrip_and_verify(curve, compress):
    c = get_curve(curve)
    rng = Rng(0x5E4DE)
    pk, vk = setup(MySillyCircuit(), curve, rng)
    pvk = prepare_verifying_key(vk)

    data = serialize_prepared_verifying_key(pvk, compress=compress)
    got = deserialize_prepared_verifying_key(data, curve, compress=compress)

    assert got.vk.alpha_g1 == vk.alpha_g1
    assert got.vk.gamma_abc_g1 == vk.gamma_abc_g1
    assert got.alpha_g1_beta_g2 == pvk.alpha_g1_beta_g2
    assert got.gamma_g2_neg == pvk.gamma_g2_neg
    assert got.delta_g2_neg == pvk.delta_g2_neg
    # stable length: vk bytes + |GT| Fp words + 2 G2 points
    assert serialize_prepared_verifying_key(got, compress=compress) == data

    a, b = 3, 5
    proof = create_proof_with_reduction(
        MySillyCircuit(a=a, b=b),
        pk,
        rng.field_element(c.r),
        rng.field_element(c.r),
    )
    assert verify_proof(got, proof, [a * b % c.r])


def test_pvk_trailing_bytes_rejected():
    from groth16_tpu.serde.canonical import SerializationError

    rng = Rng(1)
    pk, vk = setup(MySillyCircuit(), "bn254", rng)
    data = serialize_prepared_verifying_key(prepare_verifying_key(vk))
    with pytest.raises(SerializationError):
        deserialize_prepared_verifying_key(data + b"\x00", "bn254")
