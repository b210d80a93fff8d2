"""Validate the exact-int reference engine: params, fields, curves, pairing,
domains.  These are the ground-truth components every TPU kernel is later
checked against."""

import random

import pytest

from groth16_tpu.curves.params import get_curve, CURVES
from groth16_tpu.ref import field as F
from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.ref.domain import RefDomain
from groth16_tpu.ref.pairing import RefPairing

import sympy


@pytest.mark.parametrize("name", CURVES)
def test_params_sane(name):
    c = get_curve(name)
    assert sympy.isprime(c.p)
    assert sympy.isprime(c.r)
    assert (c.p + 1 - c.trace) == c.h1 * c.r
    assert c.n2 == c.h2 * c.r
    # known moduli spot checks
    if name == "bls12_381":
        assert c.p == int(
            "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
            "1eabfffeb153ffffb9feffffffffaaab",
            16,
        )
        assert c.r == int(
            "73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16
        )
        assert c.fr.two_adicity == 32
    if name == "bn254":
        assert c.r == 21888242871839275222246405745257275088548364400416034343698204186575808495617
        assert c.p == 21888242871839275222246405745257275088696311157297823662689037894645226208583
        assert c.fr.two_adicity == 28
    if name == "bls12_377":
        assert c.fr.two_adicity == 47
        assert c.r == int(
            "12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001", 16
        )


@pytest.mark.parametrize("name", CURVES)
def test_fp2_and_sqrt(name):
    c = get_curve(name)
    k2, k6, k12 = F.towers(name)
    rng = random.Random(7)
    for _ in range(5):
        a = (rng.randrange(c.p), rng.randrange(c.p))
        b = (rng.randrange(c.p), rng.randrange(c.p))
        assert k2.mul(a, k2.inv(a)) == k2.one()
        assert k2.mul(a, b) == k2.mul(b, a)
        s = k2.sqr(a)
        r = k2.sqrt(s)
        assert r is not None and k2.sqr(r) == s
    # Fp sqrt
    for _ in range(5):
        a = rng.randrange(1, c.p)
        s = a * a % c.p
        r = F.sqrt_fp(s, c.p)
        assert r in (a, c.p - a)


@pytest.mark.parametrize("name", CURVES)
def test_fp12_frobenius(name):
    c = get_curve(name)
    k2, k6, k12 = F.towers(name)
    rng = random.Random(3)

    def rand_fp12():
        def r2():
            return (rng.randrange(c.p), rng.randrange(c.p))

        return ((r2(), r2(), r2()), (r2(), r2(), r2()))

    a = rand_fp12()
    for power in (1, 2, 3):
        assert k12.frobenius(a, power) == k12.pow(a, c.p**power)
    # inverse / mul consistency
    assert k12.mul(a, k12.inv(a)) == k12.one()


@pytest.mark.parametrize("name", CURVES)
def test_groups(name):
    g = RefGroups(name)
    p1 = g.g1_sample(seed=5)
    assert g.g1_in_subgroup(p1)
    assert g.g1_mul(p1, g.c.r - 1) == g.g1_neg(p1)
    q1 = g.g2_sample(seed=5)
    assert g.g2_in_subgroup(q1)
    assert g.g2_mul(q1, g.c.r - 1) == g.g2_neg(q1)
    # associativity smoke: (2P + 3P) == 5P
    assert g.g1_add(g.g1_mul(p1, 2), g.g1_mul(p1, 3)) == g.g1_mul(p1, 5)
    assert g.g2_add(g.g2_mul(q1, 2), g.g2_mul(q1, 3)) == g.g2_mul(q1, 5)


@pytest.mark.parametrize("name", CURVES)
def test_pairing_bilinear(name):
    from groth16_tpu.ref.pairing import make_pairing

    g = RefGroups(name)
    e = make_pairing(name)  # ate (Fp12) or Tate (Fq6/Fp4) per family
    P = g.g1_sample(seed=11)
    Q = g.g2_sample(seed=13)
    base = e.pairing(P, Q)
    assert base != e.k12.one(), "pairing must be non-degenerate"
    a, b = 127, 523
    lhs = e.pairing(g.g1_mul(P, a), g.g2_mul(Q, b))
    rhs = e.k12.pow(base, a * b)
    assert lhs == rhs
    # e(aP, Q) * e(-aP, Q) == 1
    prod = e.final_exponentiation(
        e.multi_miller_loop(
            [g.g1_mul(P, a), g.g1_neg(g.g1_mul(P, a))], [Q, Q]
        )
    )
    assert prod == e.k12.one()


@pytest.mark.parametrize("name", CURVES)
def test_domain(name):
    c = get_curve(name)
    d = RefDomain(c.fr, 6)  # rounds to 8
    assert d.size == 8
    rng = random.Random(1)
    coeffs = [rng.randrange(c.r) for _ in range(8)]
    evals = d.fft(coeffs)
    # check against naive evaluation
    for x, ev in zip(d.elements(), evals):
        acc = 0
        for co in reversed(coeffs):
            acc = (acc * x + co) % c.r
        assert acc == ev
    assert d.ifft(evals) == coeffs
    # coset round trip
    coset = d.get_coset(c.fr.generator)
    cevals = coset.fft(coeffs)
    assert coset.ifft(cevals) == coeffs
    for x, ev in zip(coset.elements(), cevals):
        acc = 0
        for co in reversed(coeffs):
            acc = (acc * x + co) % c.r
        assert acc == ev
    # vanishing polynomial & lagrange
    t = 12345678901234567890 % c.r
    zt = d.evaluate_vanishing_polynomial(t)
    assert zt == (pow(t, 8, c.r) - 1) % c.r
    lag = d.evaluate_all_lagrange_coefficients(t)
    # sum_i L_i(t) * f(x_i) == f(t) for our poly
    acc = 0
    for li, ev in zip(lag, evals):
        acc = (acc + li * ev) % c.r
    ft = 0
    for co in reversed(coeffs):
        ft = (ft * t + co) % c.r
    assert acc == ft
    # indicator behavior inside the domain
    lag_in = d.evaluate_all_lagrange_coefficients(d.elements()[3])
    assert lag_in[3] == 1 and sum(lag_in) == 1
