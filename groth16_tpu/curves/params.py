"""Pairing-friendly curve parameter registry.

Every constant here is either (a) derived from the curve family's seed `x`
via the published family polynomials, or (b) a small hand-chosen constant of
the standard instantiation (tower non-residues, multiplicative generators),
each validated numerically at registry-build time.

Reference behavior consumed (see SURVEY.md §2.2): the `ark-bls12-377`,
`ark-bls12-381`, `ark-bn254` curve configs used by /root/reference via the
`Pairing` trait (reference call sites: src/verifier.rs:49-64,
src/generator.rs:26-32).  Nothing is copied; families are reconstructed from
their defining polynomials:

  BLS12:  r = x^4 - x^2 + 1,  p = ((x-1)^2 * r)/3 + x,  trace t = x + 1
  BN:     p = 36x^4 + 36x^3 + 24x^2 + 6x + 1,
          r = 36x^4 + 36x^3 + 18x^2 + 6x + 1,  trace t = 6x^2 + 1
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

Fp2 = Tuple[int, int]  # c0 + c1*u


def _v2(n: int) -> int:
    """2-adic valuation."""
    s = 0
    while n % 2 == 0:
        n //= 2
        s += 1
    return s


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """A prime field with the constants the NTT/Montgomery layers need."""

    name: str
    modulus: int
    # Smallest multiplicative generator as chosen by the standard arkworks
    # config (validated to be a quadratic non-residue with a full-order
    # 2-adic subgroup; primitivity itself is the standard published choice).
    generator: int
    two_adicity: int = dataclasses.field(init=False)
    two_adic_root_of_unity: int = dataclasses.field(init=False)

    def __post_init__(self):
        p = self.modulus
        s = _v2(p - 1)
        object.__setattr__(self, "two_adicity", s)
        root = pow(self.generator, (p - 1) >> s, p)
        object.__setattr__(self, "two_adic_root_of_unity", root)
        # generator must be a non-residue (Euler criterion) so that the
        # 2-adic subgroup it generates has full order 2^s.
        assert pow(self.generator, (p - 1) // 2, p) == p - 1, self.name
        assert pow(root, 1 << s, p) == 1
        assert pow(root, 1 << (s - 1), p) == p - 1

    @property
    def bit_length(self) -> int:
        return self.modulus.bit_length()

    @property
    def byte_length(self) -> int:
        """Serialized byte length (ark-serialize: ceil(bits/8))."""
        return (self.bit_length + 7) // 8


@dataclasses.dataclass(frozen=True)
class CurveParams:
    """Everything needed to run Groth16 over one pairing-friendly curve."""

    name: str
    family: str  # "bls12" | "bn"
    x_seed: int  # signed seed
    p: int  # base field modulus
    r: int  # scalar field modulus (group order)
    b: int  # G1: y^2 = x^3 + b
    fp2_nonresidue: int  # u^2 = fp2_nonresidue  (mod p)
    xi: Fp2  # sextic non-residue in Fp2; Fp6 = Fp2[v]/(v^3 - xi)
    twist_type: str  # "M": b2 = b*xi, "D": b2 = b/xi
    fq_generator: int
    fr_generator: int
    # derived:
    trace: int = dataclasses.field(init=False)
    h1: int = dataclasses.field(init=False)  # G1 cofactor
    h2: int = dataclasses.field(init=False)  # G2 cofactor
    n2: int = dataclasses.field(init=False)  # #E'(Fp2)
    b2: Fp2 = dataclasses.field(init=False)  # G2: y^2 = x^3 + b2
    fr: FieldParams = dataclasses.field(init=False)
    fq: FieldParams = dataclasses.field(init=False)

    def __post_init__(self):
        p, r, x = self.p, self.r, self.x_seed
        if self.family == "bls12":
            t = x + 1
        elif self.family == "bn":
            t = 6 * x * x + 1
        else:
            raise ValueError(self.family)
        object.__setattr__(self, "trace", t)

        n1 = p + 1 - t
        assert n1 % r == 0, f"{self.name}: r must divide #E(Fp)"
        object.__setattr__(self, "h1", n1 // r)

        # G2 twist coefficient.
        nr = self.fp2_nonresidue % p
        xi0, xi1 = self.xi
        if self.twist_type == "M":
            b2 = (self.b * xi0 % p, self.b * xi1 % p)
        else:  # D: b / xi
            # inverse of xi = xi0 + xi1*u in Fp2: conj / norm
            norm = (xi0 * xi0 - nr * xi1 * xi1) % p
            inv_norm = pow(norm, p - 2, p)
            inv = (xi0 * inv_norm % p, (-xi1) * inv_norm % p)
            b2 = (self.b * inv[0] % p, self.b * inv[1] % p)
        object.__setattr__(self, "b2", b2)

        # Order of the correct sextic twist E'(Fp2).  With t2 = t^2 - 2p the
        # candidate traces are (±t2 ± 3f)/2 where f^2 = (4p^2 - t2^2)/3.
        t2 = t * t - 2 * p
        f_sq, rem = divmod(4 * p * p - t2 * t2, 3)
        assert rem == 0
        f = _isqrt(f_sq)
        assert f * f == f_sq, f"{self.name}: twist discriminant not square"
        p2 = p * p
        candidates = []
        for tw in (t2, -t2):
            for s in (3 * f, -3 * f):
                num = tw + s
                if num % 2 == 0:
                    candidates.append(p2 + 1 - num // 2)
        candidates += [p2 + 1 - t2, p2 + 1 + t2]
        n2 = [n for n in candidates if n % r == 0]
        assert n2, f"{self.name}: no twist candidate divisible by r"
        # Disambiguate empirically: the real order annihilates curve points.
        n2_real = _select_twist_order(p, nr, b2, n2)
        object.__setattr__(self, "n2", n2_real)
        object.__setattr__(self, "h2", n2_real // r)

        object.__setattr__(self, "fr", FieldParams(f"{self.name}.Fr", r, self.fr_generator))
        object.__setattr__(self, "fq", FieldParams(f"{self.name}.Fq", p, self.fq_generator))

    # ---- pairing machinery constants (computed lazily) ----

    @functools.cached_property
    def ate_loop_count(self) -> int:
        """|loop| for the optimal ate Miller loop (sign via x_seed)."""
        if self.family == "bls12":
            return abs(self.x_seed)
        return abs(6 * self.x_seed + 2)

    @functools.cached_property
    def ate_loop_is_negative(self) -> bool:
        if self.family == "bls12":
            return self.x_seed < 0
        return 6 * self.x_seed + 2 < 0

    @functools.cached_property
    def final_exp_easy(self) -> int:
        p = self.p
        return (p**6 - 1) * (p**2 + 1)

    @functools.cached_property
    def final_exp_hard(self) -> int:
        """(p^4 - p^2 + 1)/r — the cyclotomic hard part, exact."""
        p = self.p
        num = p**4 - p**2 + 1
        assert num % self.r == 0
        return num // self.r


def _isqrt(n: int) -> int:
    import math

    return math.isqrt(n)


def _select_twist_order(p: int, nr: int, b2: Fp2, candidates: list) -> int:
    """Pick the candidate order that annihilates random points of E'(Fp2)."""
    from groth16_tpu.ref import curve as refcurve
    from groth16_tpu.ref import field as reffield

    k2 = reffield.Fp2Ctx(p, nr)
    pt = refcurve.sample_point_fp2(k2, b2, seed=1)
    alive = []
    for n in candidates:
        if refcurve.mul_fp2(k2, b2, pt, n) is None:  # None == infinity
            alive.append(n)
    assert len(alive) >= 1, "no candidate twist order verified"
    # If several candidates annihilate (shared factors), more points decide.
    for seed in range(2, 6):
        if len(alive) == 1:
            break
        pt = refcurve.sample_point_fp2(k2, b2, pt=None, seed=seed)
        alive = [n for n in alive if refcurve.mul_fp2(k2, b2, pt, n) is None]
    assert len(alive) == 1, f"ambiguous twist order: {alive}"
    return alive[0]


# ---------------------------------------------------------------------------
# Standard instantiations.
# ---------------------------------------------------------------------------


def _bls12(name, x, b, fp2_nonresidue, xi, twist_type, fq_gen, fr_gen):
    r = x**4 - x**2 + 1
    p = ((x - 1) ** 2 * r) // 3 + x
    assert ((x - 1) ** 2 * r) % 3 == 0
    return CurveParams(
        name=name, family="bls12", x_seed=x, p=p, r=r, b=b,
        fp2_nonresidue=fp2_nonresidue, xi=xi, twist_type=twist_type,
        fq_generator=fq_gen, fr_generator=fr_gen,
    )


def _bn(name, x, b, fp2_nonresidue, xi, twist_type, fq_gen, fr_gen):
    p = 36 * x**4 + 36 * x**3 + 24 * x**2 + 6 * x + 1
    r = 36 * x**4 + 36 * x**3 + 18 * x**2 + 6 * x + 1
    return CurveParams(
        name=name, family="bn", x_seed=x, p=p, r=r, b=b,
        fp2_nonresidue=fp2_nonresidue, xi=xi, twist_type=twist_type,
        fq_generator=fq_gen, fr_generator=fr_gen,
    )


@functools.lru_cache(maxsize=None)
def get_curve(name: str) -> CurveParams:
    name = name.lower().replace("-", "_")
    if name == "bls12_377":
        # Seed from the Zexe paper; Fp2 = Fp[u]/(u^2+5); xi = u; D-twist.
        c = _bls12(
            "bls12_377", x=0x8508C00000000001, b=1,
            fp2_nonresidue=-5, xi=(0, 1), twist_type="D",
            fq_gen=15, fr_gen=22,
        )
    elif name == "bls12_381":
        # Seed -0xd201000000010000; Fp2 = Fp[u]/(u^2+1); xi = 1+u; M-twist.
        c = _bls12(
            "bls12_381", x=-0xD201000000010000, b=4,
            fp2_nonresidue=-1, xi=(1, 1), twist_type="M",
            fq_gen=2, fr_gen=7,
        )
    elif name == "bn254":
        # alt_bn128 seed; Fp2 = Fp[u]/(u^2+1); xi = 9+u; D-twist.
        c = _bn(
            "bn254", x=4965661367192848881, b=3,
            fp2_nonresidue=-1, xi=(9, 1), twist_type="D",
            fq_gen=3, fr_gen=5,
        )
    else:
        raise KeyError(f"unknown curve {name}")
    return c


CURVES = ("bls12_377", "bls12_381", "bn254")
