"""Exact short-Weierstrass group ops (reference engine).

Implements the behavior the reference consumes from `ark-ec` (SURVEY.md §2.2
row 2): affine/projective add, double, negate, scalar-mul for G1 (over Fp)
and G2 (over Fp2), plus point sampling and subgroup membership.

Representation: affine points as (x, y) tuples, infinity as None.
Curve: y^2 = x^3 + A*x + b  (A = 0 for the BLS/BN/BW6 families; the MNT
families carry A != 0 through the optional `A` parameter).
"""

from __future__ import annotations

from typing import Optional, Tuple

from groth16_tpu.ref import field as F

G1Point = Optional[Tuple[int, int]]
G2Point = Optional[Tuple[F.Fp2El, F.Fp2El]]


# ---------------------------------------------------------------------------
# G1 (over Fp)
# ---------------------------------------------------------------------------


def is_on_curve_fp(p: int, b: int, pt: G1Point, A: int = 0) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - (x * x * x + A * x + b)) % p == 0


def add_fp(p: int, a: G1Point, b_pt: G1Point, A: int = 0) -> G1Point:
    if a is None:
        return b_pt
    if b_pt is None:
        return a
    x1, y1 = a
    x2, y2 = b_pt
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 + A) * F.inv(2 * y1, p) % p
    else:
        lam = (y2 - y1) * F.inv(x2 - x1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def neg_fp(p: int, a: G1Point) -> G1Point:
    if a is None:
        return None
    return (a[0], (-a[1]) % p)


def mul_fp(p: int, a: G1Point, k: int, A: int = 0) -> G1Point:
    if k < 0:
        return mul_fp(p, neg_fp(p, a), -k, A)
    res, base = None, a
    while k > 0:
        if k & 1:
            res = add_fp(p, res, base, A)
        base = add_fp(p, base, base, A)
        k >>= 1
    return res


def sample_point_fp(p: int, b: int, seed: int = 1, A: int = 0) -> Tuple[int, int]:
    """Deterministically find a curve point (NOT subgroup-cleared)."""
    x = seed
    while True:
        rhs = (x * x * x + A * x + b) % p
        y = F.sqrt_fp(rhs, p)
        if y is not None and y != 0:
            return (x, min(y, p - y))
        x += 1


# ---------------------------------------------------------------------------
# G2 (over Fp2)
# ---------------------------------------------------------------------------


def is_on_curve_fp2(k2, b2, pt, A2=None) -> bool:
    """Generic over the coordinate field ctx (Fp2Ctx or Fp3Ctx)."""
    if pt is None:
        return True
    x, y = pt
    lhs = k2.sqr(y)
    rhs = k2.add(k2.mul(k2.sqr(x), x), b2)
    if A2 is not None:
        rhs = k2.add(rhs, k2.mul(A2, x))
    return lhs == rhs


def add_fp2(k2, a: G2Point, b_pt: G2Point, A2=None) -> G2Point:
    if a is None:
        return b_pt
    if b_pt is None:
        return a
    x1, y1 = a
    x2, y2 = b_pt
    if x1 == x2:
        if k2.is_zero(k2.add(y1, y2)):
            return None
        num = k2.mul_fp(k2.sqr(x1), 3)
        if A2 is not None:
            num = k2.add(num, A2)
        lam = k2.mul(num, k2.inv(k2.mul_fp(y1, 2)))
    else:
        lam = k2.mul(k2.sub(y2, y1), k2.inv(k2.sub(x2, x1)))
    x3 = k2.sub(k2.sub(k2.sqr(lam), x1), x2)
    y3 = k2.sub(k2.mul(lam, k2.sub(x1, x3)), y1)
    return (x3, y3)


def neg_fp2(k2, a: G2Point) -> G2Point:
    if a is None:
        return None
    return (a[0], k2.neg(a[1]))


def mul_fp2(k2, b2, a: G2Point, k: int, A2=None) -> G2Point:
    if k < 0:
        return mul_fp2(k2, b2, neg_fp2(k2, a), -k, A2)
    res, base = None, a
    while k > 0:
        if k & 1:
            res = add_fp2(k2, res, base, A2)
        base = add_fp2(k2, base, base, A2)
        k >>= 1
    return res


def sample_point_fp2(k2, b2, pt=None, seed: int = 1, A2=None):
    """Deterministically find a twist-curve point (NOT subgroup-cleared).
    Generic over the coordinate ctx (needs .sqrt/.is_zero/.one)."""
    ncomp = len(k2.zero())
    x = tuple([seed % k2.p] + [seed // k2.p + seed] + [0] * (ncomp - 2))
    while True:
        rhs = k2.add(k2.mul(k2.sqr(x), x), b2)
        if A2 is not None:
            rhs = k2.add(rhs, k2.mul(A2, x))
        y = k2.sqrt(rhs)
        if y is not None and not k2.is_zero(y):
            return (x, y)
        x = tuple([(x[0] + 1) % k2.p] + list(x[1:]))


# ---------------------------------------------------------------------------
# Curve-level helpers tied to the registry
# ---------------------------------------------------------------------------


class RefGroups:
    """G1/G2 exact group ops for one registered curve, with subgroup gens."""

    def __init__(self, curve_name: str):
        from groth16_tpu.curves.params import get_curve

        self.c = get_curve(curve_name)
        self.A1 = self.c.a % self.c.p if self.c.a else 0
        self.A2 = None
        if self.c.g2_over_base:
            self.k2 = self.k6 = self.k12 = None  # degree-6 curve: no Fp12 tower
        elif self.c.family in ("mnt4", "mnt6"):
            nr = self.c.fp2_nonresidue % self.c.p
            self.k2 = (
                F.Fp2Ctx(self.c.p, nr)
                if self.c.family == "mnt4"
                else F.Fp3Ctx(self.c.p, nr)
            )
            self.k6 = self.k12 = None
            self.A2 = self.c.a2
        else:
            self.k2, self.k6, self.k12 = F.towers(curve_name)

    # G1 ------------------------------------------------------------------
    def g1_add(self, a, b):
        return add_fp(self.c.p, a, b, A=self.A1)

    def g1_neg(self, a):
        return neg_fp(self.c.p, a)

    def g1_mul(self, a, k):
        return mul_fp(self.c.p, a, k % self.c.r if a is not None else 0, A=self.A1)

    def g1_in_subgroup(self, a) -> bool:
        return (
            is_on_curve_fp(self.c.p, self.c.b, a, A=self.A1)
            and mul_fp(self.c.p, a, self.c.r, A=self.A1) is None
        )

    def g1_sample(self, seed: int = 1):
        # Cofactor clearing can hit small-torsion points (e.g. (2,3) on
        # BLS12-377 has order 6); retry with the next x until nontrivial.
        while True:
            pt = sample_point_fp(self.c.p, self.c.b, seed, A=self.A1)
            cleared = mul_fp(self.c.p, pt, self.c.h1, A=self.A1)
            if cleared is not None:
                return cleared
            seed = pt[0] + 1

    # G2 ------------------------------------------------------------------
    # (bw6-family curves carry G2 over Fq itself; same Fp machinery as G1)
    def g2_add(self, a, b):
        if self.c.g2_over_base:
            return add_fp(self.c.p, a, b)
        return add_fp2(self.k2, a, b, A2=self.A2)

    def g2_neg(self, a):
        if self.c.g2_over_base:
            return neg_fp(self.c.p, a)
        return neg_fp2(self.k2, a)

    def g2_mul(self, a, k):
        k = k % self.c.r if a is not None else 0
        if self.c.g2_over_base:
            return mul_fp(self.c.p, a, k)
        return mul_fp2(self.k2, self.c.b2, a, k, A2=self.A2)

    def g2_in_subgroup(self, a) -> bool:
        if self.c.g2_over_base:
            return (
                is_on_curve_fp(self.c.p, self.c.b2, a)
                and mul_fp(self.c.p, a, self.c.r) is None
            )
        return (
            is_on_curve_fp2(self.k2, self.c.b2, a, A2=self.A2)
            and mul_fp2(self.k2, self.c.b2, a, self.c.r, A2=self.A2) is None
        )

    def g2_sample(self, seed: int = 1):
        if self.c.g2_over_base:
            while True:
                pt = sample_point_fp(self.c.p, self.c.b2, seed)
                cleared = mul_fp(self.c.p, pt, self.c.h2)
                if cleared is not None:
                    return cleared
                seed = pt[0] + 1
        while True:
            pt = sample_point_fp2(self.k2, self.c.b2, seed=seed, A2=self.A2)
            cleared = mul_fp2(self.k2, self.c.b2, pt, self.c.h2, A2=self.A2)
            if cleared is not None:
                return cleared
            seed = pt[0][0] + 1
