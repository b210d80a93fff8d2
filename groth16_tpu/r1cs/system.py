"""R1CS constraint-system frontend.

Python analog of the `ark-relations` behavior consumed by the reference
(SURVEY.md §2.2 "R1CS constraint system"): variable allocation
(instance/witness), linear combinations, `enforce_constraint(a, b, c)`
meaning <a,z> * <b,z> = <c,z>, setup vs. prove synthesis modes
(generator.rs:65), satisfiability checking (prover.rs:193), and export to
sparse constraint matrices (r1cs_to_qap.rs:83,132).

Variable/column layout matches the reference exactly
(r1cs_to_qap.rs:90-94): column 0 is the constant ONE, columns
1..num_instance are public inputs, then witnesses.  LCs are kept inlined
(the reference's `finalize()` LC-inlining pass, generator.rs:73, is a no-op
here because this frontend never allocates symbolic LCs).
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, List, Optional, Tuple


class SynthesisError(Exception):
    class Kind(enum.Enum):
        ASSIGNMENT_MISSING = "AssignmentMissing"
        UNSATISFIABLE = "Unsatisfiable"
        POLYNOMIAL_DEGREE_TOO_LARGE = "PolynomialDegreeTooLarge"
        MALFORMED_VERIFYING_KEY = "MalformedVerifyingKey"
        UNEXPECTED_IDENTITY = "UnexpectedIdentity"

    def __init__(self, kind: "SynthesisError.Kind"):
        super().__init__(kind.value)
        self.kind = kind


class SynthesisMode(enum.Enum):
    SETUP = "setup"  # no witness values materialized (generator.rs:65)
    PROVE = "prove"


class Variable:
    """A handle into the assignment vector."""

    __slots__ = ("kind", "index")

    ONE_KIND = 0
    INSTANCE = 1
    WITNESS = 2

    def __init__(self, kind: int, index: int):
        self.kind = kind
        self.index = index

    def __repr__(self):
        return f"Var({('one','x','w')[self.kind]}{self.index})"

    def __hash__(self):
        return hash((self.kind, self.index))

    def __eq__(self, other):
        return (self.kind, self.index) == (other.kind, other.index)

    # building LCs with +/-/* sugar
    def __add__(self, other):
        return LinearCombination.from_var(self) + other

    def __sub__(self, other):
        return LinearCombination.from_var(self) - other

    def __mul__(self, coeff: int):
        return LinearCombination.from_var(self) * coeff

    __rmul__ = __mul__


ONE = Variable(Variable.ONE_KIND, 0)


class LinearCombination:
    """Sparse sum of (coeff, variable) terms over the scalar field."""

    __slots__ = ("terms",)

    def __init__(self, terms: Optional[Dict[Variable, int]] = None):
        self.terms: Dict[Variable, int] = terms or {}

    @staticmethod
    def zero() -> "LinearCombination":
        return LinearCombination()

    @staticmethod
    def from_var(v: Variable, coeff: int = 1) -> "LinearCombination":
        return LinearCombination({v: coeff})

    def _merge(self, other, sign: int) -> "LinearCombination":
        if isinstance(other, Variable):
            other = LinearCombination.from_var(other)
        out = dict(self.terms)
        for v, c in other.terms.items():
            out[v] = out.get(v, 0) + sign * c
        return LinearCombination(out)

    def __add__(self, other):
        return self._merge(other, 1)

    def __sub__(self, other):
        return self._merge(other, -1)

    def __mul__(self, coeff: int):
        return LinearCombination({v: c * coeff for v, c in self.terms.items()})

    __rmul__ = __mul__


def lc(*pairs: Tuple[int, Variable]) -> LinearCombination:
    """lc((coeff, var), ...) — analog of the reference's `lc!()` macro."""
    out = LinearCombination()
    for coeff, var in pairs:
        out = out + LinearCombination.from_var(var, coeff)
    return out


class ConstraintSystem:
    """Constraint collector + assignment store for one circuit synthesis."""

    def __init__(self, modulus: int, mode: SynthesisMode = SynthesisMode.PROVE):
        self.modulus = modulus
        self.mode = mode
        # instance_assignment[0] == 1 (r1cs_to_qap.rs:90-94)
        self.instance_assignment: List[int] = [1]
        self.witness_assignment: List[int] = []
        self.a_rows: List[List[Tuple[int, int]]] = []  # (coeff, column)
        self.b_rows: List[List[Tuple[int, int]]] = []
        self.c_rows: List[List[Tuple[int, int]]] = []

    # -- allocation ---------------------------------------------------------

    @property
    def num_instance_variables(self) -> int:
        # In SETUP mode assignments are placeholder zeros; the count is
        # still tracked through the same list.
        return len(self.instance_assignment)

    def new_input_variable(self, f: Optional[Callable[[], int]] = None) -> Variable:
        idx = self._alloc_instance(f)
        return Variable(Variable.INSTANCE, idx)

    def new_witness_variable(self, f: Optional[Callable[[], int]] = None) -> Variable:
        idx = self._alloc_witness(f)
        return Variable(Variable.WITNESS, idx)

    def _value(self, f) -> int:
        if self.mode == SynthesisMode.SETUP:
            return 0
        if f is None:
            raise SynthesisError(SynthesisError.Kind.ASSIGNMENT_MISSING)
        return f() % self.modulus

    def _alloc_instance(self, f) -> int:
        idx = len(self.instance_assignment)
        self.instance_assignment.append(self._value(f))
        return idx

    def _alloc_witness(self, f) -> int:
        idx = len(self.witness_assignment)
        self.witness_assignment.append(self._value(f))
        return idx

    # -- constraints ---------------------------------------------------------

    def _column(self, v: Variable) -> int:
        """Column index in the final matrices.  Only valid after synthesis
        completes (instance variables may be allocated at any time, so
        witness columns shift until the end — ark-relations also resolves
        columns at to_matrices() time)."""
        if v.kind == Variable.ONE_KIND:
            return 0
        if v.kind == Variable.INSTANCE:
            return v.index
        return len(self.instance_assignment) + v.index

    def _lc_to_row(self, comb) -> List[Tuple[int, Variable]]:
        if isinstance(comb, Variable):
            comb = LinearCombination.from_var(comb)
        row = []
        for v, c in comb.terms.items():
            c %= self.modulus
            if c:
                row.append((c, v))
        return row

    def _materialize(self, rows) -> List[List[Tuple[int, int]]]:
        out = []
        for row in rows:
            mrow = [(c, self._column(v)) for c, v in row]
            mrow.sort(key=lambda t: t[1])
            out.append(mrow)
        return out

    def enforce_constraint(self, a, b, c) -> None:
        self.a_rows.append(self._lc_to_row(a))
        self.b_rows.append(self._lc_to_row(b))
        self.c_rows.append(self._lc_to_row(c))

    # -- inspection ----------------------------------------------------------

    @property
    def num_constraints(self) -> int:
        return len(self.a_rows)

    @property
    def num_witness_variables(self) -> int:
        return len(self.witness_assignment)

    def full_assignment(self) -> List[int]:
        """[1, instance..., witness...] (r1cs_to_qap.rs:90-94)."""
        return list(self.instance_assignment) + list(self.witness_assignment)

    def to_matrices(self):
        from groth16_tpu.r1cs.matrices import ConstraintMatrices

        return ConstraintMatrices(
            num_instance_variables=len(self.instance_assignment),
            num_witness_variables=len(self.witness_assignment),
            num_constraints=self.num_constraints,
            a=self._materialize(self.a_rows),
            b=self._materialize(self.b_rows),
            c=self._materialize(self.c_rows),
        )

    def is_satisfied(self) -> bool:
        z = self.full_assignment()
        p = self.modulus

        def ev(row):
            return sum(c * z[i] for c, i in row) % p

        for ra, rb, rc in zip(
            self._materialize(self.a_rows),
            self._materialize(self.b_rows),
            self._materialize(self.c_rows),
        ):
            if ev(ra) * ev(rb) % p != ev(rc):
                return False
        return True
