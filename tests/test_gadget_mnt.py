"""The reference's own gadget cycle: a native MNT4-298 proof verified
inside an MNT6-298-scalar-field constraint system
(/root/reference/src/constraints.rs:452-589)."""

import itertools

import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode

INNER = "mnt4_298"


def test_general_a_complete_law_exhaustive():
    """The bidegree-(2,2) complete addition law used by G1Var for a != 0
    matches the affine group law on ALL point pairs of non-singular
    odd-order toy subgroups (including identity/doubling/inverse)."""
    from groth16_tpu.gadgets.curve_var import G1Var
    from groth16_tpu.gadgets.r1cs_std import FpVar

    def ref_add(p, a, A, B):
        if A is None:
            return B
        if B is None:
            return A
        x1, y1 = A
        x2, y2 = B
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1 + a) * pow(2 * y1, p - 2, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    for (p, a, b) in ((107, 2, 4), (109, 3, 5), (131, 11, 6)):
        assert (4 * a**3 + 27 * b * b) % p != 0
        pts = [None] + [
            (x, y)
            for x in range(p)
            for y in range(p)
            if (y * y - (x * x * x + a * x + b)) % p == 0
        ]
        n, two = len(pts), 1
        while n % 2 == 0:
            n //= 2
            two *= 2

        def mul(P, k):
            R, base = None, P
            while k:
                if k & 1:
                    R = ref_add(p, a, R, base)
                base = ref_add(p, a, base, base)
                k >>= 1
            return R

        sub = list({mul(P, two) for P in pts})
        cs = ConstraintSystem(p)

        def g1v(P):
            if P is None:
                return G1Var.identity(cs, 3 * b % p, a)
            return G1Var.from_affine_var(
                cs, FpVar.constant(cs, P[0]), FpVar.constant(cs, P[1]),
                3 * b % p, a,
            )

        for A, B in itertools.product(sub, sub):
            got = g1v(A).add(g1v(B)).value()
            assert got == ref_add(p, a, A, B), (p, a, b, A, B)


@pytest.fixture(scope="module")
def inner_proof():
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.utils.rng import Rng

    c = get_curve(INNER)
    rng = Rng(0x4427)
    pk, vk = setup(MySillyCircuit(), INNER, rng)
    a, b = 19, 29
    proof = create_proof_with_reduction(
        MySillyCircuit(a=a, b=b), pk, rng.field_element(c.r), rng.field_element(c.r)
    )
    pub = [a * b % c.r]
    assert verify_proof(prepare_verifying_key(vk), proof, pub)
    return vk, proof, pub


def test_mnt4_pairing_var_matches_exact(inner_proof):
    from groth16_tpu.gadgets.pairing_var import TatePairingVar
    from groth16_tpu.gadgets.r1cs_std import FpVar, _value_quad
    from groth16_tpu.ref.curve import RefGroups
    from groth16_tpu.ref.pairing import RefPairingTate

    c = get_curve(INNER)
    g = RefGroups(INNER)
    e_exact = RefPairingTate(INNER)
    P = g.g1_sample(7)
    Q = g.g2_sample(9)

    cs = ConstraintSystem(c.p, mode=SynthesisMode.PROVE)
    ev = TatePairingVar(cs, INNER)
    p_var = (FpVar.new_witness(cs, P[0]), FpVar.new_witness(cs, P[1]))
    q_var = (
        (FpVar.new_witness(cs, Q[0][0]), FpVar.new_witness(cs, Q[0][1])),
        (FpVar.new_witness(cs, Q[1][0]), FpVar.new_witness(cs, Q[1][1])),
    )
    m = ev.miller_loop(p_var, q_var)
    # compare against the affine oracle loop — the engine's default
    # projective path scales each line by an Fp constant (killed only
    # by the final exponentiation)
    assert _value_quad(m) == e_exact._miller_loop_affine(P, Q)
    out = ev.final_exp(m)
    assert _value_quad(out) == e_exact.pairing(P, Q)
    assert cs.is_satisfied()


def test_groth16_verifier_gadget_mnt_cycle(inner_proof):
    """constraints.rs:452-589: the MNT4 proof verifies inside an
    MNT6-scalar-field system; wrong input leaves it unsatisfied."""
    from groth16_tpu.gadgets import (
        Groth16VerifierGadget,
        ProofVar,
        VerifyingKeyVar,
    )
    from groth16_tpu.gadgets.groth16_var import allocate_input_bits

    vk, proof, pub = inner_proof
    inner = get_curve(INNER)
    outer = get_curve("mnt6_298")
    assert outer.r == inner.p  # the cycle property the gadget rides on

    cs = ConstraintSystem(outer.r, mode=SynthesisMode.PROVE)
    gadget = Groth16VerifierGadget(cs, INNER)
    vk_var = VerifyingKeyVar(cs, INNER, vk=vk)
    proof_var = ProofVar(cs, proof)
    bits = allocate_input_bits(cs, pub, len(pub), inner.r.bit_length())
    gadget.verify(vk_var, bits, proof_var)
    assert cs.is_satisfied(), "MNT gadget circuit unsatisfied"

    cs2 = ConstraintSystem(outer.r, mode=SynthesisMode.PROVE)
    gadget2 = Groth16VerifierGadget(cs2, INNER)
    vk_var2 = VerifyingKeyVar(cs2, INNER, vk=vk)
    proof_var2 = ProofVar(cs2, proof)
    bits2 = allocate_input_bits(
        cs2, [(pub[0] + 1) % inner.r], 1, inner.r.bit_length()
    )
    gadget2.verify(vk_var2, bits2, proof_var2)
    assert not cs2.is_satisfied(), "gadget accepted a wrong public input"
