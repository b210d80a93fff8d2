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
    family: str  # "bls12" | "bn" | "bw6" | "mnt4" | "mnt6"
    x_seed: int  # signed seed
    p: int  # base field modulus
    r: int  # scalar field modulus (group order)
    b: int  # G1: y^2 = x^3 + b
    fp2_nonresidue: int  # u^2 = fp2_nonresidue  (mod p); for bw6: the
    # CUBIC/sextic tower nonresidue (Fq3 = Fq[u]/(u^3 - nr), v^2 = u)
    xi: Fp2  # sextic non-residue in Fp2; Fp6 = Fp2[v]/(v^3 - xi)
    twist_type: str  # "M": b2 = b*xi, "D": b2 = b/xi
    fq_generator: int
    fr_generator: int
    # bw6 family only: CM trace t and y (4q = t^2 + 3y^2), from which G1
    # and sextic-twist G2 orders derive; both are validated numerically
    # at build time
    bw6_t: Optional[int] = None
    bw6_y: Optional[int] = None
    # MNT families: nonzero short-Weierstrass a-coefficient
    a: int = 0
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
        elif self.family == "bw6":
            self._post_init_bw6()
            return
        elif self.family in ("mnt4", "mnt6"):
            self._post_init_mnt()
            return
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

    def _post_init_bw6(self):
        """BW6 family (embedding degree 6; G2 is over Fq itself).

        4q = t^2 + 3y^2 (CM discriminant -3); G1: y^2 = x^3 + b has order
        q + 1 - t; G2 = the M-sextic twist y^2 = x^3 + b*nr with order
        q + 1 - (t + 3y)/2.  All divisibility and annihilation properties
        are validated here (see tests/test_bw6_params.py for the full
        re-derivation of q from the Cocks-Pinch construction over the
        inner curve's base field)."""
        p, r, t, y = self.p, self.r, self.bw6_t, self.bw6_y
        assert 4 * p == t * t + 3 * y * y, "CM equation"
        object.__setattr__(self, "trace", t)
        n1 = p + 1 - t
        assert n1 % r == 0, f"{self.name}: r must divide #E(Fq)"
        object.__setattr__(self, "h1", n1 // r)
        nr = self.fp2_nonresidue % p
        b2 = self.b * nr % p  # M-twist by the sextic nonresidue
        object.__setattr__(self, "b2", b2)
        n2 = p + 1 - (t + 3 * y) // 2
        assert (t + 3 * y) % 2 == 0 and n2 % r == 0
        # empirical annihilation checks for both orders
        from groth16_tpu.ref import curve as refcurve

        pt1 = refcurve.sample_point_fp(p, self.b % p, seed=7)
        assert refcurve.mul_fp(p, pt1, n1) is None, "G1 order"
        pt2 = refcurve.sample_point_fp(p, b2, seed=9)
        assert refcurve.mul_fp(p, pt2, n2) is None, "G2 twist order"
        object.__setattr__(self, "n2", n2)
        object.__setattr__(self, "h2", n2 // r)
        object.__setattr__(self, "fr", FieldParams(f"{self.name}.Fr", r, self.fr_generator))
        object.__setattr__(self, "fq", FieldParams(f"{self.name}.Fq", p, self.fq_generator))

    def _post_init_mnt(self):
        """MNT4 (k=4, quadratic twist over Fp2) / MNT6 (k=6, quadratic
        twist over Fp3).  The two 298-bit instantiations form the
        classic 2-cycle: mnt4.Fq = mnt6.Fr and mnt4.Fr = mnt6.Fq.

        G2 lives on the quadratic twist of E base-changed to the half
        extension Kh (Fp2 for mnt4, Fp3 for mnt6); with the full tower
        Kh[v]/(v^2 - u),  E' : y^2 = x^3 + a*u^2 x + b*u^3, of order
        |E(Kh)| twisted:  q_h + 1 + t_h  (t_h the power trace).  All
        orders are validated by annihilation at build."""
        from groth16_tpu.ref import curve as refcurve
        from groth16_tpu.ref import field as reffield

        p, r = self.p, self.r
        t = p + 1 - r * 1  # MNT curves have prime order: #E(Fp) = r
        object.__setattr__(self, "trace", t)
        object.__setattr__(self, "h1", 1)
        assert p + 1 - t == r
        pt1 = refcurve.sample_point_fp(p, self.b % p, seed=3, A=self.a % p)
        assert refcurve.mul_fp(p, pt1, r, A=self.a % p) is None, "G1 order"

        nr = self.fp2_nonresidue % p
        if self.family == "mnt4":
            kh = reffield.Fp2Ctx(p, nr)
            # u^2 = nr is a SCALAR here, so a*u^2 stays in Fp
            a2 = (self.a * nr % p, 0)
            b2 = (0, self.b * nr % p)  # b * u^3 = b*nr*u
            t2 = t * t - 2 * p
            n2 = p * p + 1 + t2  # quadratic twist: trace flips sign
        else:  # mnt6
            kh = reffield.Fp3Ctx(p, nr)
            a2 = (0, 0, self.a % p)  # a * u^2
            b2 = (self.b * nr % p, 0, 0)  # b * u^3 = b*nr
            t3 = t**3 - 3 * p * t
            n2 = p**3 + 1 + t3
        assert n2 % r == 0, f"{self.name}: r must divide twist order"
        pt2 = refcurve.sample_point_fp2(kh, b2, seed=5, A2=a2)
        assert refcurve.mul_fp2(kh, b2, pt2, n2, A2=a2) is None, "G2 order"
        object.__setattr__(self, "a2", a2)
        object.__setattr__(self, "b2", b2)
        object.__setattr__(self, "n2", n2)
        object.__setattr__(self, "h2", n2 // r)
        object.__setattr__(self, "fr", FieldParams(f"{self.name}.Fr", r, self.fr_generator))
        object.__setattr__(self, "fq", FieldParams(f"{self.name}.Fq", p, self.fq_generator))

    @property
    def g2_over_base(self) -> bool:
        """True when G2 lives over Fq itself (degree-6 BW6 curves)."""
        return self.family == "bw6"

    @property
    def g2_field_degree(self) -> int:
        """Extension degree of the field G2 coordinates live in."""
        return {"bls12": 2, "bn": 2, "bw6": 1, "mnt4": 2, "mnt6": 3}[self.family]

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
    elif name == "bw6_761":
        c = _bw6_761()
    elif name in ("mnt4_298", "mnt6_298"):
        c = _mnt298(name)
    else:
        raise KeyError(f"unknown curve {name}")
    return c


def _bw6_761() -> CurveParams:
    """BW6-761 (Housni-Guillevic): the outer curve of the BLS12-377
    one-layer composition — its SCALAR field is BLS12-377's BASE field,
    so BLS12-377 proofs verify natively in BW6-761 circuits
    (/root/reference/src/test.rs:135-149 instantiates it).

    q, t, y are the unique solution of the Cocks-Pinch k=6 / D=-3
    construction over r = p_{BLS12-377} with lift (ht, hy) = (13, 9):
    t = t0 + 13 r, y = y0 + 9 r where t0 = (3 - s)/2 mod r,
    y0 = (t0 - 2)/(-s) mod r, s^2 = -3 mod r; q = (t^2 + 3 y^2)/4.
    The search over |ht|,|hy| <= 30 and all root/sign choices yields
    EXACTLY ONE 761-bit prime (tests/test_bw6_params.py re-derives it),
    and every structural property (orders, nonresidues) is asserted at
    build time."""
    q = int(
        "0x122e824fb83ce0ad187c94004faff3eb926186a81d14688528275ef8087be4"
        "1707ba638e584e91903cebaff25b423048689c8ed12f9fd9071dcd3dc73ebff2"
        "e98a116c25667a8f8160cf8aeeaf0a437e6913e6870000082f49d00000000008b",
        16,
    )
    t = int(
        "0x15d8f58f3501dbec1ab2f9cb6145aeecb55fc0d440cb48f058490fb4098694"
        "0170b5d44300000007467a800000000010",
        16,
    )
    y = int(
        "0xf200c76d5ed9840fb4f18c5c607e562b66d395f6f661e41588824c567582c0"
        "0e671a4a9e0000004d9a700000000000a",
        16,
    )
    inner = get_curve("bls12_377")
    return CurveParams(
        name="bw6_761", family="bw6", x_seed=inner.x_seed, p=q, r=inner.p,
        b=-1,
        fp2_nonresidue=-4,  # sextic tower: Fq3 = Fq[u]/(u^3 + 4), v^2 = u
        xi=(0, 0), twist_type="M",
        fq_generator=2, fr_generator=15,  # validated QNRs (FieldParams)
        bw6_t=t, bw6_y=y,
    )


def _mnt298(name: str) -> CurveParams:
    """The MNT4-298 / MNT6-298 curve cycle (k=4 / k=6; SCIPR Lab's
    libff instantiation, consumed by the reference gadget test,
    /root/reference/src/constraints.rs:452-589 and benches/bench.rs:154).

    Field structure is fully self-validating: r4 = l^2 + 1 and
    p4 = l^2 + l + 1 for the integer l below (the MNT4 family
    polynomials), with the cycle p6 = r4, r6 = p4; embedding degrees
    (4 and 6 exactly) and curve/twist orders are asserted at build.
    Curve coefficients are libff's published constants, validated by
    order-annihilation (a wrong b cannot put random points in an
    order-r curve)."""
    l = 689871209842287392837045615510547309923794944
    r4 = l * l + 1
    p4 = l * l + l + 1
    b4 = 423894536526684178289416011533888240029318103673896002803341544124054745019340795360841685
    b6 = 106700080510851735677967319632585352256454251201367587890185989362936000262606668469523074
    if name == "mnt4_298":
        return CurveParams(
            name="mnt4_298", family="mnt4", x_seed=l, p=p4, r=r4,
            a=2, b=b4,
            fp2_nonresidue=17, xi=(0, 0), twist_type="M",
            fq_generator=_smallest_qnr(p4), fr_generator=_smallest_qnr(r4),
        )
    return CurveParams(
        name="mnt6_298", family="mnt6", x_seed=l, p=r4, r=p4,
        a=11, b=b6,
        fp2_nonresidue=5, xi=(0, 0), twist_type="M",
        fq_generator=_smallest_qnr(r4), fr_generator=_smallest_qnr(p4),
    )


@functools.lru_cache(maxsize=None)
def _smallest_qnr(p: int) -> int:
    g = 2
    while pow(g, (p - 1) // 2, p) != p - 1:
        g += 1
    return g


CURVES = ("bls12_377", "bls12_381", "bn254", "bw6_761", "mnt4_298", "mnt6_298")
