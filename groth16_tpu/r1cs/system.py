"""R1CS constraint-system frontend.

Python analog of the `ark-relations` behavior consumed by the reference
(SURVEY.md §2.2 "R1CS constraint system"): variable allocation
(instance/witness), linear combinations, `enforce_constraint(a, b, c)`
meaning <a,z> * <b,z> = <c,z>, setup vs. prove synthesis modes
(generator.rs:65), satisfiability checking (prover.rs:193), and export to
sparse constraint matrices (r1cs_to_qap.rs:83,132).

Variable/column layout matches the reference exactly
(r1cs_to_qap.rs:90-94): column 0 is the constant ONE, columns
1..num_instance are public inputs, then witnesses.  Symbolic linear
combinations (`new_lc`, ark-relations' `new_lc`/`Variable::SymbolicLc`)
are supported; `finalize()` resolves them per the optimization goal —
inlining for `Constraints` (the Groth16 setting, generator.rs:64+73,
prover.rs:197) or outlining into fresh witnesses for `Weight`.
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


class OptimizationGoal(enum.Enum):
    """ark-relations OptimizationGoal (generator.rs:64 sets Constraints)."""

    NONE = "none"
    CONSTRAINTS = "constraints"  # inline symbolic LCs
    WEIGHT = "weight"  # outline symbolic LCs into fresh witnesses


class Variable:
    """A handle into the assignment vector."""

    __slots__ = ("kind", "index")

    ONE_KIND = 0
    INSTANCE = 1
    WITNESS = 2
    SYMBOLIC_LC = 3

    def __init__(self, kind: int, index: int):
        self.kind = kind
        self.index = index

    def __repr__(self):
        return f"Var({('one','x','w','lc')[self.kind]}{self.index})"

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
        self.optimization_goal = OptimizationGoal.CONSTRAINTS
        # instance_assignment[0] == 1 (r1cs_to_qap.rs:90-94)
        self.instance_assignment: List[int] = [1]
        self.witness_assignment: List[int] = []
        self.a_rows: List[List[Tuple[int, int]]] = []  # (coeff, column)
        self.b_rows: List[List[Tuple[int, int]]] = []
        self.c_rows: List[List[Tuple[int, int]]] = []
        self.lc_map: List[List[Tuple[int, Variable]]] = []  # symbolic LCs
        self._finalized = False

    def set_optimization_goal(self, goal: OptimizationGoal) -> None:
        """Must be called before any symbolic LC is resolved
        (generator.rs:64)."""
        self.optimization_goal = goal

    def set_mode(self, mode: SynthesisMode) -> None:
        self.mode = mode

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

    def new_lc(self, comb) -> Variable:
        """Allocate a symbolic linear combination and return its handle
        (ark-relations `new_lc`); resolved by `finalize()`."""
        self.lc_map.append(self._lc_to_row(comb))
        return Variable(Variable.SYMBOLIC_LC, len(self.lc_map) - 1)

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
        assert v.kind == Variable.WITNESS, "symbolic LC survived finalize()"
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
        self.finalize()
        return list(self.instance_assignment) + list(self.witness_assignment)

    # -- symbolic-LC resolution (generator.rs:73, prover.rs:197) -------------

    def _resolved_lcs(self) -> List[List[Tuple[int, Variable]]]:
        """Each symbolic LC expanded to ONE/instance/witness terms only.
        Handles can only reference earlier handles, so one forward pass
        suffices."""
        p = self.modulus
        resolved: List[Dict[Variable, int]] = []
        for row in self.lc_map:
            terms: Dict[Variable, int] = {}
            for coeff, v in row:
                if v.kind == Variable.SYMBOLIC_LC:
                    for vv, cc in resolved[v.index].items():
                        terms[vv] = (terms.get(vv, 0) + coeff * cc) % p
                else:
                    terms[v] = (terms.get(v, 0) + coeff) % p
            resolved.append(terms)
        return [
            [(c, v) for v, c in t.items() if c % p] for t in resolved
        ]

    def _lc_value(self, row) -> int:
        p = self.modulus
        acc = 0
        for c, v in row:
            if v.kind == Variable.ONE_KIND:
                acc += c
            elif v.kind == Variable.INSTANCE:
                acc += c * self.instance_assignment[v.index]
            else:
                acc += c * self.witness_assignment[v.index]
        return acc % p

    def finalize(self) -> None:
        """Resolve symbolic LCs: inline them into constraint rows
        (OptimizationGoal.CONSTRAINTS — the Groth16 path) or outline each
        into a fresh witness plus one defining constraint (WEIGHT).
        Idempotent; called automatically by to_matrices()/is_satisfied().
        """
        if self._finalized:
            return
        self._finalized = True
        if not self.lc_map:
            return
        resolved = self._resolved_lcs()
        if self.optimization_goal == OptimizationGoal.WEIGHT:
            # one fresh witness + defining constraint per symbolic LC
            substitution: Dict[int, Variable] = {}
            for i, row in enumerate(resolved):
                if self.mode == SynthesisMode.PROVE:
                    val = self._lc_value(row)
                    w = self.new_witness_variable(lambda v=val: v)
                else:
                    w = self.new_witness_variable(lambda: 0)
                substitution[i] = w
                self.a_rows.append(list(row))
                self.b_rows.append([(1, ONE)])
                self.c_rows.append([(1, w)])

            def subst(row):
                return [
                    (c, substitution[v.index] if v.kind == Variable.SYMBOLIC_LC else v)
                    for c, v in row
                ]

            sub_rows = subst
        else:

            def inline(row):
                p = self.modulus
                terms: Dict[Variable, int] = {}
                for c, v in row:
                    if v.kind == Variable.SYMBOLIC_LC:
                        for cc, vv in resolved[v.index]:
                            terms[vv] = (terms.get(vv, 0) + c * cc) % p
                    else:
                        terms[v] = (terms.get(v, 0) + c) % p
                return [(c, v) for v, c in terms.items() if c % p]

            sub_rows = inline
        for rows in (self.a_rows, self.b_rows, self.c_rows):
            for i, row in enumerate(rows):
                if any(v.kind == Variable.SYMBOLIC_LC for _, v in row):
                    rows[i] = sub_rows(row)
        self.lc_map = []

    def to_matrices(self):
        from groth16_tpu.r1cs.matrices import ConstraintMatrices

        self.finalize()
        return ConstraintMatrices(
            num_instance_variables=len(self.instance_assignment),
            num_witness_variables=len(self.witness_assignment),
            num_constraints=self.num_constraints,
            a=self._materialize(self.a_rows),
            b=self._materialize(self.b_rows),
            c=self._materialize(self.c_rows),
        )

    def is_satisfied(self) -> bool:
        self.finalize()
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
