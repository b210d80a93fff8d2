"""Serde: arkworks-format roundtrips, golden-byte stability, negatives."""

import hashlib

import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.protocol.data_structures import Proof, VerifyingKey
from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.serde import (
    deserialize_proof,
    deserialize_verifying_key,
    serialize_proof,
    serialize_verifying_key,
)
from groth16_tpu.serde.canonical import SerializationError

# (curve, sha256[:16] of compressed proof / uncompressed proof / compressed
# vk for the deterministic fixture below) — byte-format stability guards:
# these digests lock the wire format (sizes match ark-serialize: e.g.
# bn254 compressed proof = 32 + 64 + 32 = 128 bytes).
GOLDEN = {
    "bn254": (
        128, "98887a5ad2ceb1ec",
        256, "b915d038a84ee242",
        328, "b19d6d53bb2b621b",
    ),
    "bls12_377": (
        192, "fb5c2e1939fb687f",
        384, "6f34c5ed3d5bd66d",
        488, "e7693313850d7fde",
    ),
}


def _fixture(name):
    g = RefGroups(name)
    P = g.g1_sample(3)
    Q = g.g2_sample(1)
    proof = Proof(curve=name, a=P, b=Q, c=g.g1_mul(P, 7))
    vk = VerifyingKey(
        curve=name,
        alpha_g1=P,
        beta_g2=Q,
        gamma_g2=g.g2_mul(Q, 3),
        delta_g2=g.g2_mul(Q, 5),
        gamma_abc_g1=[P, g.g1_mul(P, 2), None],
    )
    return proof, vk


@pytest.mark.parametrize("name", ["bn254", "bls12_377"])
def test_roundtrip_and_golden_bytes(name):
    proof, vk = _fixture(name)
    lc, hc, lu, hu, lv, hv = GOLDEN[name]

    pc = serialize_proof(proof, True)
    assert (len(pc), hashlib.sha256(pc).hexdigest()[:16]) == (lc, hc)
    assert deserialize_proof(pc, name, True) == proof

    pu = serialize_proof(proof, False)
    assert (len(pu), hashlib.sha256(pu).hexdigest()[:16]) == (lu, hu)
    assert deserialize_proof(pu, name, False) == proof

    vc = serialize_verifying_key(vk, True)
    assert (len(vc), hashlib.sha256(vc).hexdigest()[:16]) == (lv, hv)
    assert deserialize_verifying_key(vc, name, True) == vk


def test_rejects_bad_points():
    name = "bn254"
    proof, vk = _fixture(name)
    c = get_curve(name)
    # an x with no point on the curve (x^3 + b a non-residue) must fail
    from groth16_tpu.ref.field import legendre

    x_bad = next(
        x for x in range(1, 100) if legendre(x**3 + c.b, c.p) == -1
    )
    nb = (c.p.bit_length() + 7) // 8
    blob = bytearray(serialize_proof(proof, True))
    blob[:nb] = x_bad.to_bytes(nb, "little")
    with pytest.raises(SerializationError):
        deserialize_proof(bytes(blob), name, True)

    # non-canonical field element (>= p) must be rejected
    nbytes = (c.p.bit_length() + 7) // 8
    bad = bytearray((c.p + 1).to_bytes(nbytes, "little")) + bytes(
        serialize_proof(proof, True)[nbytes:]
    )
    with pytest.raises(SerializationError):
        deserialize_proof(bytes(bad), name, True)

    # trailing garbage must be rejected
    with pytest.raises(SerializationError):
        deserialize_proof(serialize_proof(proof, True) + b"\x00", name, True)


def test_absorb_transcript():
    from groth16_tpu.protocol import vk_hash, vk_to_field_elements

    _, vk = _fixture("bn254")
    elems = vk_to_field_elements(vk)
    # alpha(2) + 3 G2 (4 each) + 3 gamma_abc (2 each) = 20 elements
    assert len(elems) == 2 + 12 + 6
    h1 = vk_hash(vk)
    vk2 = deserialize_verifying_key(
        serialize_verifying_key(vk, True), "bn254", True
    )
    assert vk_hash(vk2) == h1
