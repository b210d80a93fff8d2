"""L7 recursive verifier gadget: a native BLS12-377 Groth16 proof
verified INSIDE a constraint system over BLS12-377's base field (=
BW6-761's scalar field) — the one-layer composition.  Mirrors
/root/reference/src/constraints.rs:452-589 (which runs the same flow on
the MNT4/MNT6 cycle)."""

import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode

INNER = "bls12_377"


@pytest.fixture(scope="module")
def inner_proof():
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.utils.rng import Rng

    c = get_curve(INNER)
    rng = Rng(0x6AD6E7)
    pk, vk = setup(MySillyCircuit(), INNER, rng)
    a, b = 17, 23
    proof = create_proof_with_reduction(
        MySillyCircuit(a=a, b=b), pk, rng.field_element(c.r), rng.field_element(c.r)
    )
    pub = [a * b % c.r]
    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, pub)
    return vk, proof, pub


def test_pairing_var_matches_exact(inner_proof):
    """In-circuit Miller+final-exp values equal (the cube of) the exact
    engine's pairing on the same points."""
    from groth16_tpu.gadgets.pairing_var import BlsPairingVar
    from groth16_tpu.gadgets.r1cs_std import FpVar, _value12
    from groth16_tpu.ref.curve import RefGroups
    from groth16_tpu.ref.pairing import RefPairing

    c = get_curve(INNER)
    g = RefGroups(INNER)
    e_exact = RefPairing(INNER)
    P = g.g1_sample(11)
    Q = g.g2_sample(13)

    cs = ConstraintSystem(c.p, mode=SynthesisMode.PROVE)
    ev = BlsPairingVar(cs, INNER)
    p_var = (FpVar.new_witness(cs, P[0]), FpVar.new_witness(cs, P[1]))
    q_var = (
        (FpVar.new_witness(cs, Q[0][0]), FpVar.new_witness(cs, Q[0][1])),
        (FpVar.new_witness(cs, Q[1][0]), FpVar.new_witness(cs, Q[1][1])),
    )
    m = ev.miller_loop(p_var, q_var)
    # the gadget runs the affine Miller loop; the exact engine's default
    # is the projective fast path whose raw value differs by subfield
    # scalars (killed by the final exponentiation) — compare against the
    # affine oracle
    assert _value12(m) == e_exact._miller_loop_affine(P, Q)
    out = ev.final_exp(m)
    want = e_exact.k12.pow(e_exact.pairing(P, Q), 81)  # gadget computes e^81
    assert _value12(out) == want
    assert cs.is_satisfied(), "pairing circuit unsatisfied"


def test_groth16_verifier_gadget(inner_proof):
    from groth16_tpu.gadgets import (
        Groth16VerifierGadget,
        ProofVar,
        VerifyingKeyVar,
    )
    from groth16_tpu.gadgets.groth16_var import allocate_input_bits

    vk, proof, pub = inner_proof
    c = get_curve(INNER)
    cs = ConstraintSystem(c.p, mode=SynthesisMode.PROVE)
    gadget = Groth16VerifierGadget(cs, INNER)
    vk_var = VerifyingKeyVar(cs, INNER, vk=vk)
    proof_var = ProofVar(cs, proof)
    bits = allocate_input_bits(cs, pub, len(pub), c.r.bit_length())
    gadget.verify(vk_var, bits, proof_var)
    n = cs.num_constraints
    assert cs.is_satisfied(), "verifier gadget circuit unsatisfied"
    print(f"gadget constraints: {n}")

    # negative: wrong public input must make the circuit unsatisfiable
    cs2 = ConstraintSystem(c.p, mode=SynthesisMode.PROVE)
    gadget2 = Groth16VerifierGadget(cs2, INNER)
    vk_var2 = VerifyingKeyVar(cs2, INNER, vk=vk)
    proof_var2 = ProofVar(cs2, proof)
    bad = [(pub[0] + 1) % c.r]
    bits2 = allocate_input_bits(cs2, bad, 1, c.r.bit_length())
    gadget2.verify(vk_var2, bits2, proof_var2)
    assert not cs2.is_satisfied(), "gadget accepted a wrong public input"


def test_gadget_setup_mode_shape(inner_proof):
    """SETUP-mode synthesis (no witness values) must produce the same
    constraint count as PROVE mode — the circuit shape is fixed."""
    from groth16_tpu.gadgets import (
        Groth16VerifierGadget,
        ProofVar,
        VerifyingKeyVar,
    )
    from groth16_tpu.gadgets.groth16_var import allocate_input_bits

    vk, proof, pub = inner_proof
    c = get_curve(INNER)

    def synth(mode, with_values):
        cs = ConstraintSystem(c.p, mode=mode)
        gadget = Groth16VerifierGadget(cs, INNER)
        vk_var = VerifyingKeyVar(
            cs, INNER, vk=vk if with_values else None,
            num_inputs=len(pub),
        )
        proof_var = ProofVar(cs, proof if with_values else None)
        bits = allocate_input_bits(
            cs, pub if with_values else None, len(pub), c.r.bit_length()
        )
        gadget.verify(vk_var, bits, proof_var)
        return cs.num_constraints, cs.num_witness_variables

    n_prove = synth(SynthesisMode.PROVE, True)
    n_setup = synth(SynthesisMode.SETUP, False)
    assert n_prove == n_setup
