"""Radix-2 and mixed-radix evaluation domains (reference engine, exact ints).

Implements the `ark-poly` domain behavior consumed by the reference
(SURVEY.md §2.2 row "Radix-2 / mixed-radix NTT"): construction rounding
up to a power of two when the field's 2-adicity allows, otherwise to the
smallest 2^a*3^b*5^c*7^d smooth size dividing p-1 (the
GeneralEvaluationDomain -> MixedRadixEvaluationDomain fallback that the
MNT6 benches rely on, benches/bench.rs:154-155); forward/inverse NTT,
coset domains via an offset, the vanishing polynomial Z(x) = x^n - 1,
Lagrange-coefficient evaluation, and out-of-domain sampling (call sites:
/root/reference/src/r1cs_to_qap.rs:133-141, 201-234;
src/generator.rs:88-90).

Domain element order is [g*w^0, g*w^1, ..., g*w^{n-1}] (offset g = 1 for the
plain domain); fft maps coefficients -> evaluations in that order, matching
ark-poly's Radix2EvaluationDomain semantics.
"""

from __future__ import annotations

from typing import List

from groth16_tpu.curves.params import FieldParams


def _smooth_sizes(p_minus_1: int, two_adicity: int):
    """All 2^a*3^b*5^c*7^d divisors of p-1 (a <= two_adicity), sorted."""
    parts = {2: two_adicity}
    for q in (3, 5, 7):
        v, m = 0, p_minus_1
        while m % q == 0:
            m //= q
            v += 1
        parts[q] = v
    sizes = [1]
    for q, vmax in parts.items():
        sizes = [s * q**e for s in sizes for e in range(vmax + 1)]
    return sorted(set(sizes))


class RefDomain:
    def __init__(self, field: FieldParams, num_coeffs: int, offset: int = 1):
        n = 1
        log_n = 0
        while n < num_coeffs:
            n <<= 1
            log_n += 1
        self.field = field
        self.p = field.modulus
        if log_n <= field.two_adicity:
            self.size = n
            self.log_size = log_n
            # group_gen = 2-adic root ^ (2^(s - log_n))
            self.group_gen = pow(
                field.two_adic_root_of_unity,
                1 << (field.two_adicity - log_n),
                self.p,
            )
        else:
            # mixed-radix fallback: smallest smooth size >= num_coeffs
            cands = [
                m
                for m in _smooth_sizes(self.p - 1, field.two_adicity)
                if m >= num_coeffs
            ]
            if not cands:
                raise ValueError("PolynomialDegreeTooLarge")
            m = cands[0]
            self.size = m
            self.log_size = m.bit_length() - 1  # informational only
            self.group_gen = _element_of_order(self.p, m)
        self.group_gen_inv = pow(self.group_gen, self.p - 2, self.p)
        self.offset = offset % self.p
        self.offset_inv = pow(self.offset, self.p - 2, self.p)
        self.size_inv = pow(self.size, self.p - 2, self.p)

    def get_coset(self, offset: int) -> "RefDomain":
        d = RefDomain.__new__(RefDomain)
        d.__dict__.update(self.__dict__)
        d.offset = offset % self.p
        d.offset_inv = pow(d.offset, self.p - 2, self.p)
        return d

    def elements(self) -> List[int]:
        out, cur = [], self.offset
        for _ in range(self.size):
            out.append(cur)
            cur = cur * self.group_gen % self.p
        return out

    # -- NTT ----------------------------------------------------------------

    def _fft_core(self, vals: List[int], root: int) -> List[int]:
        """Recursive mixed-radix Cooley-Tukey NTT (exact).  Reduces to
        the classic radix-2 transform — and identical outputs, since any
        correct algorithm computes the same DFT — on power-of-two sizes.
        """
        p, n = self.p, self.size
        a = [v % p for v in vals]
        assert len(a) == n
        ws = [1] * n
        for i in range(1, n):
            ws[i] = ws[i - 1] * root % p
        return _ct_ntt(a, ws, 1, p)

    def fft(self, coeffs: List[int]) -> List[int]:
        """coefficients -> evaluations on [offset * w^i]."""
        p = self.p
        c = list(coeffs) + [0] * (self.size - len(coeffs))
        if self.offset != 1:
            cur = 1
            for i in range(self.size):
                c[i] = c[i] * cur % p
                cur = cur * self.offset % p
        return self._fft_core(c, self.group_gen)

    def ifft(self, evals: List[int]) -> List[int]:
        """evaluations -> coefficients."""
        p = self.p
        c = self._fft_core(list(evals), self.group_gen_inv)
        c = [v * self.size_inv % p for v in c]
        if self.offset != 1:
            cur = 1
            for i in range(self.size):
                c[i] = c[i] * cur % p
                cur = cur * self.offset_inv % p
        return c

    # -- polynomial helpers ---------------------------------------------------

    def evaluate_vanishing_polynomial(self, t: int) -> int:
        """Z(t) = t^n * offset_pow_n_adjust - ... for plain domain: t^n - 1.

        For a coset gH the vanishing polynomial is t^n - g^n; the reference
        only calls this on plain domains and at the coset generator
        (r1cs_to_qap.rs:137,224), where the plain-domain formula applies.
        """
        p = self.p
        return (pow(t, self.size, p) - pow(self.offset, self.size, p)) % p

    def evaluate_all_lagrange_coefficients(self, t: int) -> List[int]:
        """[L_i(t)] for the domain points, matching ark-poly semantics.

        If t is in the domain this degenerates to an indicator vector.
        """
        p, n = self.p, self.size
        zt = self.evaluate_vanishing_polynomial(t)
        if zt == 0:
            # t = offset * w^i for some i
            out = [0] * n
            cur = self.offset
            for i in range(n):
                if cur == t % p:
                    out[i] = 1
                    return out
                cur = cur * self.group_gen % p
            raise AssertionError("vanishing but not found in domain")
        # L_i(t) = Z(t) / (Z'(x_i) * (t - x_i)) with Z(x) = x^n - g^n and
        # Z'(x) = n x^{n-1}.  On the domain x_i^n = g^n (constant), so
        # x_i^{n-1} = g^n / x_i and Z'(x_i) = n g^n / x_i — which removes
        # the per-point modexp and makes the whole pass O(n) mulmods
        # (this is the setup hot loop at 2^20+, r1cs_to_qap.rs:141).
        xs = self.elements()
        denoms = [(t - x) % p for x in xs]
        inv_denoms = _batch_inv(denoms, p)
        gn = pow(self.offset, n, p)
        c0 = zt * pow(n * gn % p, p - 2, p) % p  # Z(t) / (n g^n)
        return [c0 * x % p * invd % p for x, invd in zip(xs, inv_denoms)]

    def sample_element_outside_domain(self, rng) -> int:
        t = rng.field_element(self.p)
        while self.evaluate_vanishing_polynomial(t) == 0:
            t = rng.field_element(self.p)
        return t


def _element_of_order(p: int, m: int) -> int:
    """Deterministically find an element of EXACT multiplicative order m
    (m | p-1): h = x^((p-1)/m) for successive x until every maximal
    proper power is nontrivial."""
    assert (p - 1) % m == 0
    primes = [q for q in (2, 3, 5, 7) if m % q == 0]
    x = 2
    while True:
        h = pow(x, (p - 1) // m, p)
        if h != 1 and all(pow(h, m // q, p) != 1 for q in primes):
            return h
        x += 1


def _ct_ntt(a: List[int], ws: List[int], stride: int, p: int) -> List[int]:
    """DFT of `a` where the needed twiddles are ws[stride * t]:
    out[k] = sum_j ws[stride*j*k mod n'] a[j].  Recursive Cooley-Tukey
    splitting off the smallest prime factor each level."""
    n = len(a)
    if n == 1:
        return a
    for q in (2, 3, 5, 7):
        if n % q == 0:
            break
    else:
        raise ValueError(f"non-smooth NTT size {n}")
    m = n // q
    subs = [_ct_ntt(a[i::q], ws, stride * q, p) for i in range(q)]
    nfull = len(ws)
    out = [0] * n
    for k in range(n):
        acc = 0
        for i in range(q):
            acc += ws[stride * i * k % nfull] * subs[i][k % m]
        out[k] = acc % p
    return out


def _batch_inv(vals: List[int], p: int) -> List[int]:
    """Montgomery batch inversion (zeros not allowed)."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % p
    inv_all = pow(prefix[n], p - 2, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % p
        inv_all = inv_all * vals[i] % p
    return out
