"""Canonical test circuits, mirroring the reference's fixtures.

- MySillyCircuit: a*b=c with 6 duplicate constraints (src/test.rs:14-43).
- MiMCDemo: 322-round LongsightF322p3 preimage circuit, 644 constraints
  (tests/mimc.rs:46-143) — the primary cross-validation fixture.
- DummyCircuit: benches/bench.rs:22-64 — one multiplication constraint
  plus padding constraints/variables up to a target size.
"""

from __future__ import annotations

from typing import List, Optional

from groth16_tpu.r1cs.system import ConstraintSystem, LinearCombination, ONE, lc

MIMC_ROUNDS = 322


def mimc(xl: int, xr: int, constants: List[int], p: int) -> int:
    """Native LongsightF322p3 (tests/mimc.rs:46-61)."""
    assert len(constants) == MIMC_ROUNDS
    for ci in constants:
        t = (xl + ci) % p
        xl, xr = (t * t % p * t + xr) % p, xl
    return xl


class MiMCDemo:
    """Preimage-of-MiMC circuit (tests/mimc.rs:74-143): 2 constraints per
    round; the final round output is the public image."""

    def __init__(self, constants: List[int], xl: Optional[int] = None, xr: Optional[int] = None):
        assert len(constants) == MIMC_ROUNDS
        self.constants = constants
        self.xl = xl
        self.xr = xr

    def __call__(self, cs: ConstraintSystem) -> None:
        p = cs.modulus
        xl_value, xr_value = self.xl, self.xr
        xl = cs.new_witness_variable(None if xl_value is None else (lambda v=xl_value: v))
        xr = cs.new_witness_variable(None if xr_value is None else (lambda v=xr_value: v))

        for i, ci in enumerate(self.constants):
            # tmp = (xl + ci)^2
            tmp_value = None
            if xl_value is not None:
                e = (xl_value + ci) % p
                tmp_value = e * e % p
            tmp = cs.new_witness_variable(None if tmp_value is None else (lambda v=tmp_value: v))
            cs.enforce_constraint(
                xl + lc((ci, ONE)),
                xl + lc((ci, ONE)),
                LinearCombination.from_var(tmp),
            )

            # new_xl = xr + tmp * (xl + ci)
            new_xl_value = None
            if xl_value is not None:
                new_xl_value = ((xl_value + ci) * tmp_value + xr_value) % p
            maker = None if new_xl_value is None else (lambda v=new_xl_value: v)
            if i == MIMC_ROUNDS - 1:
                new_xl = cs.new_input_variable(maker)
            else:
                new_xl = cs.new_witness_variable(maker)
            cs.enforce_constraint(
                LinearCombination.from_var(tmp),
                xl + lc((ci, ONE)),
                new_xl - xr,
            )

            xr, xr_value = xl, xl_value
            xl, xl_value = new_xl, new_xl_value


class MySillyCircuit:
    """a*b = c six times over (src/test.rs:14-43)."""

    def __init__(self, a: Optional[int] = None, b: Optional[int] = None):
        self.a = a
        self.b = b

    def __call__(self, cs: ConstraintSystem) -> None:
        p = cs.modulus
        a = cs.new_witness_variable(None if self.a is None else (lambda: self.a))
        b = cs.new_witness_variable(None if self.b is None else (lambda: self.b))
        c = cs.new_input_variable(
            None if self.a is None else (lambda: self.a * self.b % p)
        )
        for _ in range(6):
            cs.enforce_constraint(
                LinearCombination.from_var(a),
                LinearCombination.from_var(b),
                LinearCombination.from_var(c),
            )


class DummyCircuit:
    """benches/bench.rs:22-64: c = a*b public, padded to a target size."""

    def __init__(self, num_variables: int, num_constraints: int,
                 a: Optional[int] = None, b: Optional[int] = None):
        self.num_variables = num_variables
        self.num_constraints = num_constraints
        self.a = a
        self.b = b

    def __call__(self, cs: ConstraintSystem) -> None:
        p = cs.modulus
        a = cs.new_witness_variable(None if self.a is None else (lambda: self.a))
        b = cs.new_witness_variable(None if self.b is None else (lambda: self.b))
        c = cs.new_input_variable(
            None if self.a is None else (lambda: self.a * self.b % p)
        )
        for _ in range(self.num_variables - 3):
            cs.new_witness_variable(None if self.a is None else (lambda: self.a))
        for _ in range(self.num_constraints - 1):
            cs.enforce_constraint(
                LinearCombination.from_var(a),
                LinearCombination.from_var(b),
                LinearCombination.from_var(c),
            )
        # final constraint: 0 * 0 = 0 (bench.rs:60-62 enforces with zero lc)
        cs.enforce_constraint(
            LinearCombination.zero(), LinearCombination.zero(), LinearCombination.zero()
        )
