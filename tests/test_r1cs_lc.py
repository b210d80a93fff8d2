"""Symbolic LC allocation + finalize() inlining/outlining
(ark-relations `new_lc` + generator.rs:73 / prover.rs:197 parity)."""

from groth16_tpu.r1cs.system import (
    ConstraintSystem,
    LinearCombination,
    ONE,
    OptimizationGoal,
    SynthesisMode,
    lc,
)

P = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001  # bn254 r


def test_inline_matches_hand_inlined():
    cs = ConstraintSystem(P)
    a = cs.new_witness_variable(lambda: 3)
    b = cs.new_witness_variable(lambda: 5)
    c = cs.new_input_variable(lambda: 64)
    l1 = cs.new_lc(a + 2 * b)
    l2 = cs.new_lc(lc((1, l1)) + c)  # nested symbolic reference
    cs.enforce_constraint(
        lc((2, l2)), LinearCombination.from_var(b), lc((1, l1))
    )
    m1 = cs.to_matrices()

    cs2 = ConstraintSystem(P)
    a2 = cs2.new_witness_variable(lambda: 3)
    b2 = cs2.new_witness_variable(lambda: 5)
    c2 = cs2.new_input_variable(lambda: 64)
    cs2.enforce_constraint(
        2 * a2 + 4 * b2 + 2 * c2, LinearCombination.from_var(b2), a2 + 2 * b2
    )
    m2 = cs2.to_matrices()
    assert (m1.a, m1.b, m1.c) == (m2.a, m2.b, m2.c)
    assert m1.num_witness_variables == m2.num_witness_variables


def test_outline_weight_goal():
    cs = ConstraintSystem(P)
    cs.set_optimization_goal(OptimizationGoal.WEIGHT)
    a = cs.new_witness_variable(lambda: 3)
    l1 = cs.new_lc(a + 1 * ONE)
    cs.enforce_constraint(lc((1, l1)), lc((1, ONE)), lc((4, ONE)))
    assert cs.is_satisfied()
    # the LC was outlined into a fresh witness + one defining constraint
    assert cs.num_constraints == 2
    assert cs.num_witness_variables == 2


def test_setup_mode_finalize():
    cs = ConstraintSystem(P, mode=SynthesisMode.SETUP)
    a = cs.new_witness_variable()
    l1 = cs.new_lc(2 * a)
    cs.enforce_constraint(lc((1, l1)), lc((1, ONE)), lc((1, l1)))
    m = cs.to_matrices()
    assert m.num_constraints == 1
    assert m.a[0] == [(2, 1)]  # column 1 = first witness (only ONE precedes)


def test_prove_with_symbolic_lcs_end_to_end():
    """A circuit written with LC handles proves and verifies."""
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.utils.rng import Rng
    from groth16_tpu.curves.params import get_curve

    c = get_curve("bn254")

    class LcCircuit:
        def __init__(self, x=None):
            self.x = x

        def __call__(self, cs):
            x = cs.new_witness_variable(
                None if self.x is None else (lambda: self.x)
            )
            out = cs.new_input_variable(
                None if self.x is None else (lambda: (self.x + 7) * self.x % c.r)
            )
            l1 = cs.new_lc(x + 7 * ONE)
            cs.enforce_constraint(
                lc((1, l1)), LinearCombination.from_var(x),
                LinearCombination.from_var(out),
            )

    rng = Rng(5)
    pk, vk = setup(LcCircuit(), "bn254", rng)
    proof = create_proof_with_reduction(
        LcCircuit(x=9), pk, rng.field_element(c.r), rng.field_element(c.r)
    )
    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, [(9 + 7) * 9 % c.r])
