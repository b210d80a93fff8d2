"""R1CS -> QAP reduction (exact reference implementation).

Re-implements the `R1CSToQAP` strategy trait and its `LibsnarkReduction`
impl (reference: src/r1cs_to_qap.rs:71-248) from the math spec in
SURVEY.md §2.3.  This exact version is the ground truth; the TPU engine
(groth16_tpu/protocol/prover_tpu.py) reproduces `witness_map_from_matrices`
on device and is tested for bit-identical output.

The reduction stays a pluggable strategy object (reference lib.rs:55), so
alternative reductions can slot in later.
"""

from __future__ import annotations

from typing import List, Tuple

from groth16_tpu.curves.params import FieldParams
from groth16_tpu.r1cs.matrices import ConstraintMatrices
from groth16_tpu.ref.domain import RefDomain


def evaluate_constraint(terms, assignment: List[int], p: int) -> int:
    """<terms, assignment> sparse inner product (r1cs_to_qap.rs:28-67)."""
    acc = 0
    for coeff, idx in terms:
        acc += coeff * assignment[idx]
    return acc % p


class LibsnarkReduction:
    """The libsnark-style reduction (r1cs_to_qap.rs:123-248)."""

    @staticmethod
    def instance_map_with_evaluation(
        matrices: ConstraintMatrices, field: FieldParams, t: int
    ) -> Tuple[List[int], List[int], List[int], int, int, int]:
        """Per-variable a_i(t), b_i(t), c_i(t) + Z(t) (r1cs_to_qap.rs:128-170).

        Returns (a, b, c, zt, qap_num_variables, domain_size).
        """
        p = field.modulus
        num_instance = matrices.num_instance_variables
        num_constraints = matrices.num_constraints
        domain = RefDomain(field, num_constraints + num_instance)

        zt = domain.evaluate_vanishing_polynomial(t)
        u = domain.evaluate_all_lagrange_coefficients(t)

        qap_num_variables = (num_instance - 1) + matrices.num_witness_variables
        a = [0] * (qap_num_variables + 1)
        b = [0] * (qap_num_variables + 1)
        c = [0] * (qap_num_variables + 1)

        # input-consistency rows pin public inputs (r1cs_to_qap.rs:150-155)
        a[:num_instance] = u[num_constraints : num_constraints + num_instance]

        for i in range(num_constraints):
            ui = u[i]
            for coeff, idx in matrices.a[i]:
                a[idx] = (a[idx] + ui * coeff) % p
            for coeff, idx in matrices.b[i]:
                b[idx] = (b[idx] + ui * coeff) % p
            for coeff, idx in matrices.c[i]:
                c[idx] = (c[idx] + ui * coeff) % p

        return a, b, c, zt, qap_num_variables, domain.size

    @staticmethod
    def witness_map_from_matrices(
        matrices: ConstraintMatrices,
        field: FieldParams,
        num_inputs: int,
        num_constraints: int,
        full_assignment: List[int],
    ) -> List[int]:
        """Witness -> h coefficient vector (r1cs_to_qap.rs:172-235).

        Order of operations matches SURVEY.md §2.3(2) exactly: sparse
        mat-vec, input-consistency splice, iNTT, coset-NTT, pointwise
        product, subtract c on the coset, divide by Z(g), coset-iNTT.
        """
        p = field.modulus
        domain = RefDomain(field, num_constraints + num_inputs)
        n = domain.size

        a = [0] * n
        b = [0] * n
        for i in range(num_constraints):
            a[i] = evaluate_constraint(matrices.a[i], full_assignment, p)
            b[i] = evaluate_constraint(matrices.b[i], full_assignment, p)
        # input-consistency splice (r1cs_to_qap.rs:195-199)
        a[num_constraints : num_constraints + num_inputs] = full_assignment[:num_inputs]

        a = domain.ifft(a)
        b = domain.ifft(b)

        coset = domain.get_coset(field.generator)
        a = coset.fft(a)
        b = coset.fft(b)

        ab = [x * y % p for x, y in zip(a, b)]

        c = [0] * n
        for i in range(num_constraints):
            c[i] = evaluate_constraint(matrices.c[i], full_assignment, p)
        c = domain.ifft(c)
        c = coset.fft(c)

        # Z evaluated at the coset offset is constant across the coset
        # (r1cs_to_qap.rs:223-230)
        zg_inv = pow(domain.evaluate_vanishing_polynomial(field.generator), p - 2, p)
        ab = [(x - y) * zg_inv % p for x, y in zip(ab, c)]

        return coset.ifft(ab)

    @staticmethod
    def h_query_scalars(
        max_power: int, t: int, zt: int, delta_inverse: int, field: FieldParams
    ) -> List[int]:
        """[Z(t) * delta^-1 * t^i for i in 0..max_power] (r1cs_to_qap.rs:237-247)."""
        p = field.modulus
        base = zt * delta_inverse % p
        out = []
        cur = base
        for _ in range(max_power):
            out.append(cur)
            cur = cur * t % p
        return out
