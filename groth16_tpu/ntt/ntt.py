"""Radix-2 (coset) NTT over the limb engine (single-chip).

TPU-native realization of the `ark-poly` Radix2EvaluationDomain behavior
consumed by the witness map (reference call sites:
src/r1cs_to_qap.rs:201-234): in-place forward/inverse NTT on the subgroup
H = <w> of size n, coset domains g*H via pre/post scaling, identical output
ordering ([f(g*w^0), f(g*w^1), ...]) and 1/n normalization.

Design (SURVEY.md §2.4 "ntt_cp"): the coefficient vector lives as
uint32[L, ..., n] limb-major limbs (fields/fp.py convention: limb axis
leads, the element axis trails; extra row-batch dims in between are
supported — the sharded four-step transform in par/ntt_cp.py runs
row-batches).  Each butterfly
stage is one vectorized mont_mul + add/sub on full-width slices inside a
`lax.fori_loop`, so the whole transform is an O(L)-primitive graph
executed log2(n) times.  Twiddle and offset power tables are built on
device by log-doubling (no host bignum loops).

The multi-chip all-to-all variant lives in par/ntt_cp.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.curves.params import FieldParams
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec, encode, make_spec


@functools.lru_cache(maxsize=None)
def _jitted_ntt_core(spec: FpSpec):
    return jax.jit(functools.partial(_ntt_core, spec))


@functools.lru_cache(maxsize=None)
def _jitted_mul(spec: FpSpec):
    return jax.jit(functools.partial(fp.mont_mul, spec))


def powers_device(spec: FpSpec, base: int, n: int) -> jnp.ndarray:
    """[base^0, ..., base^(n-1)] in Montgomery form, built on device by
    log-doubling: p_{2k} = p_k * (base^k); log2(n) wide multiplies."""
    assert n & (n - 1) == 0, "power-of-two table"
    p = spec.modulus
    cur = jnp.asarray(encode([1], spec))  # [L, 1]
    length = 1
    b_pow = base % p
    while length < n:
        scale = jnp.asarray(encode([b_pow], spec))
        nxt = fp.mont_mul(spec, cur, scale)
        cur = jnp.concatenate([cur, nxt], axis=-1)
        b_pow = b_pow * b_pow % p
        length *= 2
    return cur


@functools.lru_cache(maxsize=None)
def powers(spec: FpSpec, base: int, n: int) -> jnp.ndarray:
    """Cached device-resident power table.

    Built even when first requested inside a jit trace
    (ensure_compile_time_eval), so the cache always holds concrete
    arrays, never tracers.  The whole builder runs as ONE jitted
    zero-arg program: compile-time-eval otherwise executes the doubling
    loop op-by-op, which is pathological over a high-latency device
    tunnel."""
    with jax.ensure_compile_time_eval():
        fn = jax.jit(lambda: powers_device(spec, base, n))
        return jax.block_until_ready(fn())


def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _dif_tables(n: int):
    """Per-stage gather tables for the in-place DIF network.

    Stage s has block size m = n>>s, half h = m/2, in-block position
    q = j mod m.  Position j pairs with j±h; the lower half takes u+v,
    the upper half takes (u - v) * root^((q-h) * 2^s).
    Returns (mask[log,n] bool lower-half, partner[log,n], twexp[log,n]).
    """
    log_n = n.bit_length() - 1
    j = np.arange(n, dtype=np.int32)
    masks, partners, twexps = [], [], []
    for s in range(log_n):
        m = n >> s
        h = m >> 1
        q = j & (m - 1)
        lower = q < h
        masks.append(lower)
        partners.append(np.where(lower, j + h, j - h).astype(np.int32))
        twexps.append(np.where(lower, 0, (q - h) << s).astype(np.int32))
    return (
        np.stack(masks),
        np.stack(partners),
        np.stack(twexps),
    )


def _ntt_core(spec: FpSpec, a: jnp.ndarray, root_powers: jnp.ndarray) -> jnp.ndarray:
    """Radix-2 DIF NTT along the trailing element axis; natural order in
    and out.

    a: uint32[L, ..., n]; root_powers: [L, n] table (pass inverse-root
    powers for the inverse transform).  One masked full-width butterfly
    body is compiled and iterated log2(n) times via lax.fori_loop.
    """
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    if log_n == 0:
        return a
    masks, partners, twexps = _dif_tables(n)
    masks_d = jnp.asarray(masks)
    partners_d = jnp.asarray(partners)
    twexps_d = jnp.asarray(twexps)

    def stage(s, x):
        # invariant: stage inputs/outputs < 2p, exact digits
        part = jnp.take(x, partners_d[s], axis=-1)
        tw = jnp.take(root_powers, twexps_d[s], axis=-1)
        sum_ = fp.cond_sub(spec, x + part, spec.two_p_limbs)
        diff = fp.mont_mul(spec, fp.sub(spec, part, x, k=2), tw)
        return fp.select(masks_d[s], sum_, diff)

    a = jax.lax.fori_loop(0, log_n, stage, a)
    return jnp.take(a, jnp.asarray(_bitrev_perm(n)), axis=-1)


class NttDomain:
    """Evaluation domain of size n (power of two) over field `field`.

    Mirrors RefDomain (groth16_tpu/ref/domain.py) semantics on device.
    Tables are device-resident and cached per (field, n).
    """

    def __init__(self, field: FieldParams, num_coeffs: int):
        n = 1
        log_n = 0
        while n < num_coeffs:
            n <<= 1
            log_n += 1
        if log_n > field.two_adicity:
            raise ValueError("PolynomialDegreeTooLarge")
        self.field = field
        self.spec = make_spec(field.modulus, name=field.name)
        self.size = n
        self.log_size = log_n
        p = field.modulus
        self.group_gen = pow(field.two_adic_root_of_unity, 1 << (field.two_adicity - log_n), p)
        self.group_gen_inv = pow(self.group_gen, p - 2, p)
        self.size_inv = pow(n, p - 2, p)

    # -- cached device tables ------------------------------------------------

    @functools.cached_property
    def _fwd_powers(self) -> jnp.ndarray:
        return powers(self.spec, self.group_gen, self.size)

    @functools.cached_property
    def _inv_powers(self) -> jnp.ndarray:
        return powers(self.spec, self.group_gen_inv, self.size)

    def _offset_powers(self, offset: int) -> jnp.ndarray:
        return powers(self.spec, offset, self.size)

    # -- transforms ------------------------------------------------------------

    def fft(self, coeffs: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
        """coefficients -> evaluations on offset*H.  coeffs: uint32[L, n]
        Montgomery form; shorter inputs must be pre-padded by the caller."""
        spec = self.spec
        a = coeffs
        assert a.shape[-1] == self.size
        if offset != 1:
            a = _jitted_mul(spec)(a, self._offset_powers(offset))
        return _jitted_ntt_core(spec)(a, self._fwd_powers)

    def ifft(self, evals: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
        spec = self.spec
        a = _jitted_ntt_core(spec)(evals, self._inv_powers)
        a = _jitted_mul(spec)(a, fp.const(spec, self.size_inv, (1,)))
        if offset != 1:
            p = self.field.modulus
            a = _jitted_mul(spec)(a, self._offset_powers(pow(offset, p - 2, p)))
        return a

    def coset_fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluations on GENERATOR*H (r1cs_to_qap.rs:204-207)."""
        return self.fft(coeffs, offset=self.field.generator)

    def coset_ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self.ifft(evals, offset=self.field.generator)

    # -- scalar helpers (host ints; O(1)) ---------------------------------------

    def evaluate_vanishing_polynomial(self, t: int, offset: int = 1) -> int:
        p = self.field.modulus
        return (pow(t, self.size, p) - pow(offset, self.size, p)) % p
