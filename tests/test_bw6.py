"""BW6-761 end-to-end: parameter re-derivation, pairing, prove/verify on
both engines, serde — mirroring /root/reference/src/test.rs:135-149
(`test_prove_and_verify::<BW6_761>(1)`)."""

import pytest

from groth16_tpu.curves.params import get_curve

CURVE = "bw6_761"


def test_bw6_params_rederive():
    """q is the unique Cocks-Pinch k=6/D=-3 prime over r = p_{BLS12-377}
    with the (13, 9) lift — re-derive it from scratch."""
    c = get_curve(CURVE)
    bls = get_curve("bls12_377")
    r = bls.p
    assert c.r == r
    # sqrt(-3) mod r via Tonelli-Shanks
    def sqrt_mod(a, p):
        a %= p
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, cc, t, rr = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
        while t != 1:
            i, tt = 0, t
            while tt != 1:
                tt = tt * tt % p
                i += 1
            b = pow(cc, 1 << (m - i - 1), p)
            m, cc, t, rr = i, b * b % p, t * b * b % p, rr * b % p
        return rr

    s3 = sqrt_mod(-3 % r, r)
    found = set()
    for s in (s3, r - s3):
        t0 = (3 + s) * pow(2, r - 2, r) % r
        for y0 in ((t0 - 2) * pow(s, r - 2, r) % r,
                   (2 - t0) * pow(s, r - 2, r) % r):
            for ht, hy in ((13, 9), (20, 2), (13, -10), (20, -3)):
                t = t0 + ht * r
                y = y0 + hy * r
                if (t * t + 3 * y * y) % 4 == 0:
                    q = (t * t + 3 * y * y) // 4
                    if q == c.p:
                        found.add((ht, hy))
    assert found, "registry q not reachable from the documented construction"
    assert 4 * c.p == c.bw6_t**2 + 3 * c.bw6_y**2


def test_bw6_pairing_bilinear():
    from groth16_tpu.ref.curve import RefGroups
    from groth16_tpu.ref.pairing import make_pairing

    c = get_curve(CURVE)
    g = RefGroups(CURVE)
    e = make_pairing(CURVE)
    P = g.g1_sample(3)
    Q = g.g2_sample(5)
    base = e.pairing(P, Q)
    assert base != e.kgt.one(), "degenerate"
    a, b = 76543, 13579
    lhs = e.pairing(g.g1_mul(P, a), g.g2_mul(Q, b))
    assert lhs == e.kgt.pow(base, a * b)


def test_bw6_prove_verify_exact_and_device():
    """setup -> prove -> verify + negative check; device proof must be
    bit-identical to the exact prover's (test.rs:135-149 analog)."""
    import jax

    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.rng import Rng

    c = get_curve(CURVE)
    rng = Rng(0xB76)
    pk, vk = setup(MySillyCircuit(), CURVE, rng)
    a, b = 11, 13
    r_zk, s_zk = rng.field_element(c.r), rng.field_element(c.r)
    proof = create_proof_with_reduction(MySillyCircuit(a=a, b=b), pk, r_zk, s_zk)
    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, [a * b % c.r])
    assert not verify_proof(pvk, proof, [a])

    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    MySillyCircuit(a=a, b=b)(cs)
    assert cs.is_satisfied()
    prover = TpuProver(pk, cs.to_matrices())
    got = prover.prove(cs.full_assignment(), r_zk, s_zk)
    assert got == proof, "device proof != exact proof"

    # serde roundtrip (G2 = single-Fq points on the sextic twist)
    from groth16_tpu.serde import (
        deserialize_proof,
        deserialize_verifying_key,
        serialize_proof,
        serialize_verifying_key,
    )

    for compress in (True, False):
        pb = serialize_proof(proof, compress=compress)
        assert deserialize_proof(pb, CURVE, compress=compress) == proof
        vb = serialize_verifying_key(vk, compress=compress)
        assert deserialize_verifying_key(vb, CURVE, compress=compress) == vk
