"""Prover (reference: src/prover.rs) — exact-engine implementation.

Structure mirrors SURVEY.md §2.3(3) / prover.rs:26-132:
  h = witness_map(matrices, z)
  A  = r*delta + a0 + MSM(a_query[1:], rho) + alpha
  B1 = s*delta + b0 + MSM(b_g1_query[1:], rho) + beta       (skipped if r==0)
  B2 = same in G2
  C  = s*A + r*B1 - rs*delta + MSM(l_query, witness) + MSM(h_query, h)
with rho = instance[1:] ++ witness, and the h MSM zip-truncating to
len(h_query) == domain_size - 1 (prover.rs:66 / generator.rs:167-169).

The primary entry point takes prebuilt matrices + a full assignment
(prover.rs:26-51), which is also the shape of the TPU prover.
"""

from __future__ import annotations

from typing import Callable, List

from groth16_tpu.curves.params import get_curve
from groth16_tpu.protocol.data_structures import Proof, ProvingKey, VerifyingKey
from groth16_tpu.qap.reduction import LibsnarkReduction
from groth16_tpu.r1cs.matrices import ConstraintMatrices
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.ref.group import JacobianOps
from groth16_tpu.utils.rng import Rng


def _ops(curve: str):
    c = get_curve(curve)
    from groth16_tpu.ref.group import g1_jacobian, g2_jacobian

    return g1_jacobian(c), g2_jacobian(c)


def _calculate_coeff(ops: JacobianOps, initial, query, vk_param, assignment: List[int]):
    """prover.rs:252-270: initial + query[0] + MSM(query[1:], rho) + vk_param."""
    acc = ops.msm(query[1:], assignment)
    res = ops.add(initial, ops.from_affine(query[0]))
    res = ops.add(res, acc)
    res = ops.add(res, ops.from_affine(vk_param))
    return res


def create_proof_with_assignment(
    pk: ProvingKey,
    r: int,
    s: int,
    h: List[int],
    input_assignment: List[int],
    aux_assignment: List[int],
) -> Proof:
    """prover.rs:54-132."""
    curve = pk.vk.curve
    c = get_curve(curve)
    g1, g2 = _ops(curve)

    h_acc = g1.msm(pk.h_query, h)  # zip-truncates h to len(h_query)
    l_aux_acc = g1.msm(pk.l_query, aux_assignment)

    delta_g1 = g1.from_affine(pk.delta_g1)
    r_s_delta_g1 = g1.scalar_mul(delta_g1, (r * s) % c.r)

    assignment = list(input_assignment) + list(aux_assignment)

    # A
    r_g1 = g1.scalar_mul(delta_g1, r)
    g_a = _calculate_coeff(g1, r_g1, pk.a_query, pk.vk.alpha_g1, assignment)
    s_g_a = g1.scalar_mul(g_a, s)

    # B in G1 (only when r != 0; prover.rs:98-108)
    if r % c.r != 0:
        s_g1 = g1.scalar_mul(delta_g1, s)
        g1_b = _calculate_coeff(g1, s_g1, pk.b_g1_query, pk.beta_g1, assignment)
    else:
        g1_b = g1.infinity()

    # B in G2
    s_g2 = g2.scalar_mul(g2.from_affine(pk.vk.delta_g2), s)
    g2_b = _calculate_coeff(g2, s_g2, pk.b_g2_query, pk.vk.beta_g2, assignment)
    r_g1_b = g1.scalar_mul(g1_b, r)

    # C
    g_c = s_g_a
    g_c = g1.add(g_c, r_g1_b)
    g_c = g1.add(g_c, g1.neg(r_s_delta_g1))
    g_c = g1.add(g_c, l_aux_acc)
    g_c = g1.add(g_c, h_acc)

    return Proof(
        curve=curve,
        a=g1.to_affine(g_a),
        b=g2.to_affine(g2_b),
        c=g1.to_affine(g_c),
    )


def create_proof_with_reduction_and_matrices(
    pk: ProvingKey,
    r: int,
    s: int,
    matrices: ConstraintMatrices,
    num_inputs: int,
    num_constraints: int,
    full_assignment: List[int],
    qap=LibsnarkReduction,
) -> Proof:
    """prover.rs:26-51 — the matrices-direct entry point."""
    curve = pk.vk.curve
    fr = get_curve(curve).fr
    h = qap.witness_map_from_matrices(
        matrices, fr, num_inputs, num_constraints, full_assignment
    )
    return create_proof_with_assignment(
        pk, r, s, h, full_assignment[1:num_inputs], full_assignment[num_inputs:]
    )


def create_proof_with_reduction(
    circuit: Callable, pk: ProvingKey, r: int, s: int, qap=LibsnarkReduction
) -> Proof:
    """prover.rs:173-217 — synthesize, then prove."""
    curve = pk.vk.curve
    c = get_curve(curve)
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    circuit(cs)
    assert cs.is_satisfied(), "witness does not satisfy the constraint system"
    matrices = cs.to_matrices()
    return create_proof_with_reduction_and_matrices(
        pk, r, s, matrices, cs.num_instance_variables, cs.num_constraints,
        cs.full_assignment(), qap=qap,
    )


def prove(pk: ProvingKey, circuit: Callable, rng: Rng, qap=LibsnarkReduction) -> Proof:
    """SNARK::prove analog (lib.rs:76-82): zk randomness from rng."""
    c = get_curve(pk.vk.curve)
    r = rng.field_element(c.r)
    s = rng.field_element(c.r)
    return create_proof_with_reduction(circuit, pk, r, s, qap=qap)


def rerandomize_proof(vk: VerifyingKey, proof: Proof, rng: Rng) -> Proof:
    """prover.rs:223-250: A'=(1/r1)A, B'=r1*B + r1*r2*(delta G2), C'=C+r2*A."""
    c = get_curve(vk.curve)
    g1, g2 = _ops(vk.curve)
    r1 = rng.nonzero_field_element(c.r)
    r2 = rng.nonzero_field_element(c.r)
    r1_inv = pow(r1, c.r - 2, c.r)
    new_a = g1.scalar_mul(g1.from_affine(proof.a), r1_inv)
    new_b = g2.add(
        g2.scalar_mul(g2.from_affine(proof.b), r1),
        g2.scalar_mul(g2.from_affine(vk.delta_g2), r1 * r2 % c.r),
    )
    new_c = g1.add(g1.from_affine(proof.c), g1.scalar_mul(g1.from_affine(proof.a), r2))
    return Proof(
        curve=vk.curve,
        a=g1.to_affine(new_a),
        b=g2.to_affine(new_b),
        c=g1.to_affine(new_c),
    )
