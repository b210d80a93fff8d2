"""Protocol data structures (reference: src/data_structures.rs).

Points are stored in affine form: G1 as (x, y) int tuples, G2 as
((x0,x1), (y0,y1)) Fp2 tuples; None is the point at infinity.  Field
elements are standard-form ints.  The TPU engine keeps its own
device-resident structure-of-arrays mirror of the ProvingKey
(protocol/device_keys.py); these host structures are the canonical /
serializable form.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

G1 = Optional[Tuple[int, int]]
G2 = Any  # Optional[Tuple[Fp2El, Fp2El]]


@dataclasses.dataclass
class Proof:
    """3-element proof {a: G1, b: G2, c: G1} (data_structures.rs:9-16)."""

    curve: str
    a: G1
    b: G2
    c: G1

    def __eq__(self, other):
        return (self.curve, self.a, self.b, self.c) == (other.curve, other.a, other.b, other.c)


@dataclasses.dataclass
class VerifyingKey:
    """(data_structures.rs:32-44)."""

    curve: str
    alpha_g1: G1
    beta_g2: G2
    gamma_g2: G2
    delta_g2: G2
    gamma_abc_g1: List[G1]


@dataclasses.dataclass
class PreparedVerifyingKey:
    """(data_structures.rs:88-97).  gamma/delta negations are stored as
    plain affine points; line-coefficient precomputation is an internal
    detail of the pairing engine."""

    vk: VerifyingKey
    alpha_g1_beta_g2: Any  # GT (Fp12 element)
    gamma_g2_neg: G2
    delta_g2_neg: G2


@dataclasses.dataclass
class ProvingKey:
    """(data_structures.rs:126-143)."""

    vk: VerifyingKey
    beta_g1: G1
    delta_g1: G1
    a_query: List[G1]
    b_g1_query: List[G1]
    b_g2_query: List[G2]
    h_query: List[G1]
    l_query: List[G1]
