"""Mixed-radix evaluation domains (ark-poly MixedRadixEvaluationDomain
fallback, consumed via GeneralEvaluationDomain for low-2-adicity scalar
fields — benches/bench.rs:154-155 run MNT curves at 2^20)."""

import random

from groth16_tpu.curves.params import FieldParams, get_curve
from groth16_tpu.ref.domain import RefDomain


def test_radix2_unchanged():
    fp = get_curve("bn254").fr
    d = RefDomain(fp, 12)
    assert d.size == 16
    p = fp.modulus
    rng = random.Random(1)
    coeffs = [rng.randrange(p) for _ in range(12)]
    evs = d.fft(coeffs)
    xs = d.elements()
    for i in (0, 1, 7, 15):
        want = sum(c * pow(xs[i], j, p) for j, c in enumerate(coeffs)) % p
        assert evs[i] == want
    assert d.ifft(evs)[:12] == [c % p for c in coeffs]


def test_small_mixed_domain_vs_naive_dft():
    # p = 181: p - 1 = 2^2 * 3^2 * 5 — tiny 2-adicity forces mixed sizes
    f = FieldParams("t181.Fr", 181, 2)
    for n_req, expect_size in ((5, 5), (7, 9), (10, 10), (13, 15)):
        d = RefDomain(f, n_req)
        assert d.size == expect_size, (n_req, d.size)
        rng = random.Random(n_req)
        coeffs = [rng.randrange(181) for _ in range(n_req)]
        evs = d.fft(coeffs)
        xs = d.elements()
        for i in range(d.size):
            want = sum(c * pow(xs[i], j, 181) for j, c in enumerate(coeffs)) % 181
            assert evs[i] == want
        assert d.ifft(evs)[:n_req] == [c % 181 for c in coeffs]
        # coset round-trip
        dc = d.get_coset(f.generator)
        assert dc.ifft(dc.fft(coeffs))[:n_req] == [c % 181 for c in coeffs]


def test_mnt6_mixed_domain_beyond_two_adicity():
    m6 = get_curve("mnt6_298")
    assert m6.fr.two_adicity == 17
    d = RefDomain(m6.fr, (1 << 17) + 1)
    # smallest smooth 2^a*3^b*5^c*7^d size above 2^17
    assert d.size == 143360 and d.size % (1 << 12) == 0
    assert pow(d.group_gen, d.size, m6.r) == 1
    assert pow(d.group_gen, d.size // 2, m6.r) != 1
    assert pow(d.group_gen, d.size // 5, m6.r) != 1
    assert pow(d.group_gen, d.size // 7, m6.r) != 1


def test_mnt_lagrange_and_vanishing():
    m4 = get_curve("mnt4_298")
    d = RefDomain(m4.fr, 8)
    rng = random.Random(3)
    t = d.sample_element_outside_domain(
        type("R", (), {"field_element": lambda self, p: rng.randrange(p)})()
    )
    coeffs = [rng.randrange(m4.r) for _ in range(8)]
    evs = d.fft(coeffs)
    ls = d.evaluate_all_lagrange_coefficients(t)
    via_lagrange = sum(l * e for l, e in zip(ls, evs)) % m4.r
    direct = sum(c * pow(t, j, m4.r) for j, c in enumerate(coeffs)) % m4.r
    assert via_lagrange == direct
