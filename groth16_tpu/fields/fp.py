"""Vectorized Montgomery field arithmetic on uint32 limb tensors (JAX).

Element layout: `uint32[..., L]` of 16-bit little-endian limbs, Montgomery
form, redundant range [0, 2p) (see fields/spec.py).  All functions are pure
and jit-compatible; `spec` is static (hashable dataclass).

This is the TPU-native realization of `ark-ff`'s Montgomery backend
(SURVEY.md §2.2 row 1): same math, data model inverted to structure-of-
arrays so the VPU vectorizes across elements, not limbs.

Design for compile-friendliness AND width (the engine sits inside deeply
nested scans — MSM windows, NTT stages — so per-op graph size matters as
much as FLOPs):

- mont_mul is the *non-interleaved* REDC:  T = a*b;  m = (T mod R)*n' mod
  R;  U = T + m*p;  result = U >> 16L.  Each big product accumulates
  16x16->32 split columns into a [.., 2L+1] buffer via one `lax.scan`
  over limbs (graph O(1), work O(L^2) vectorized over the batch).
  Column bound: <= 2L terms * (2^16-1) + carries < 2^22 for L <= 32.
- Carry propagation is log-time: two local folds reduce columns to
  digits <= 2^16, then a Kogge-Stone (generate, propagate) prefix
  resolves binary carries in ceil(log2(W)) vector steps.
- add/sub/normalize are fully vectorized: limb-complement addition
  (x - y  ==  x + (MASK - y) + 1 mod R) turns subtraction and the
  conditional reductions into the same carry-resolve machinery.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FpSpec, int_to_limbs

_U32 = jnp.uint32
MASK = jnp.uint32(LIMB_MASK)


def const(spec: FpSpec, value: int, shape=(), mont: bool = True) -> jnp.ndarray:
    """Broadcast a host integer constant to limb-tensor form."""
    v = value % spec.modulus
    if mont:
        v = spec.to_mont_int(v)
    limbs = np.array(int_to_limbs(v, spec.n_limbs), dtype=np.uint32)
    return jnp.broadcast_to(jnp.asarray(limbs), tuple(shape) + (spec.n_limbs,))


def zeros(spec: FpSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (spec.n_limbs,), dtype=_U32)


def _const_vec(limbs: Sequence[int]) -> jnp.ndarray:
    return jnp.asarray(np.array(limbs, dtype=np.uint32))


# -- carry resolution ----------------------------------------------------------


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Multiply by 2^(16d): digits move to higher index; width preserved."""
    nd = x.ndim
    return jnp.pad(x, [(0, 0)] * (nd - 1) + [(d, 0)])[..., : x.shape[-1]]


def resolve(cols: jnp.ndarray, n_out: int, want_carry: bool = False):
    """Exact digit resolution of a column vector.

    cols: uint32[..., W] with value V = sum_i cols_i * 2^(16 i), every
    column < 2^30.  Returns uint32[..., n_out] = digits of V mod 2^(16
    n_out).  With want_carry=True also returns the bit at position n_out
    (caller guarantees V < 2^(16 (n_out + 1))).
    """
    W = n_out + 1 if want_carry else n_out
    cur = cols.shape[-1]
    if cur < W:
        x = jnp.pad(cols, [(0, 0)] * (cols.ndim - 1) + [(0, W - cur)])
    else:
        x = cols[..., :W]
    # two folds: 2^30 -> < 2^16 + 2^14 -> <= 2^16
    x = (x & MASK) + _shift_up(x >> LIMB_BITS, 1)
    x = (x & MASK) + _shift_up(x >> LIMB_BITS, 1)
    # Kogge-Stone binary-carry prefix: digits u <= 2^16
    g = x >> LIMB_BITS  # {0, 1}
    p = (x == MASK).astype(_U32)
    d = 1
    while d < W:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    digits = (x + _shift_up(g, 1)) & MASK
    if want_carry:
        return digits[..., :n_out], digits[..., n_out]
    return digits


def _cond_sub(spec: FpSpec, x: jnp.ndarray, m_limbs: Sequence[int]) -> jnp.ndarray:
    """x if x < m else x - m (x exact digits, m a host constant < R)."""
    L = spec.n_limbs
    comp = _const_vec([LIMB_MASK - v for v in m_limbs[:L]])
    one0 = _const_vec([1] + [0] * (L - 1))
    u = x + comp + one0  # value = x - m + R; digits < 2^17
    digits, carry = resolve(u, L, want_carry=True)
    return jnp.where((carry > 0)[..., None], digits, x)


# -- add / sub / neg ---------------------------------------------------------


def add(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) in [0, 2p), inputs in [0, 2p).  Sum < 4p <= R fits L limbs."""
    s = resolve(a + b, spec.n_limbs)
    return _cond_sub(spec, s, spec.two_p_limbs)


def sub(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) in [0, 2p): a - b + 2p via limb-complement addition."""
    L = spec.n_limbs
    two_p = _const_vec(spec.two_p_limbs[:L])
    one0 = _const_vec([1] + [0] * (L - 1))
    u = a + (MASK - b) + two_p + one0  # value = a - b + 2p + R; digits < 3*2^16
    s = resolve(u, L)  # mod R drops the +R; a - b + 2p < 4p <= R exact
    return _cond_sub(spec, s, spec.two_p_limbs)


def neg(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(spec, jnp.zeros_like(a), a)


def double(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


# -- Montgomery multiplication ------------------------------------------------


def _accumulate_product(
    cols: jnp.ndarray, a: jnp.ndarray, b_vec: jnp.ndarray
) -> jnp.ndarray:
    """cols += a * b_vec in split 16-bit columns.

    a: uint32[..., La] digits (< 2^16); b_vec: [..., Lb] or [Lb] digits.
    One lax.scan over La — graph O(1), work O(La*Lb) across the batch.
    Column growth per call: <= 2*La * (2^16 - 1).
    """
    La = a.shape[-1]
    W = cols.shape[-1]
    Lb = b_vec.shape[-1]
    aT = jnp.moveaxis(a, -1, 0)  # [La, ...]
    nd_batch = cols.ndim - 1

    def step(acc, xs):
        ai, i = xs
        prod = ai[..., None] * b_vec  # exact 16x16 in u32
        contrib = jnp.pad(prod & MASK, [(0, 0)] * nd_batch + [(0, 1)]) + _shift_up(
            jnp.pad(prod >> LIMB_BITS, [(0, 0)] * nd_batch + [(0, 1)]), 1
        )  # [..., Lb+1]
        sl = jax.lax.dynamic_slice_in_dim(acc, i, Lb + 1, axis=-1)
        acc = jax.lax.dynamic_update_slice_in_dim(acc, sl + contrib, i, axis=-1)
        return acc, None

    idx = jnp.arange(La, dtype=jnp.int32)
    cols, _ = jax.lax.scan(step, cols, (aT, idx))
    return cols


def mont_mul(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product abR^-1 mod p, inputs/outputs in [0, 2p).

    Non-interleaved REDC over split-column accumulators; see module
    docstring for the shape of the algorithm and the bounds.
    """
    L = spec.n_limbs
    W = 2 * L + 1
    batch_shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch_shape + (L,))
    b = jnp.broadcast_to(b, batch_shape + (L,))

    # T = a * b
    cols = jnp.zeros(batch_shape + (W,), dtype=_U32)
    cols = _accumulate_product(cols, a, b)
    # m = (T mod R) * n' mod R
    t = resolve(cols[..., :L], L)
    n_prime = _const_vec(int_to_limbs(spec.nprime, L))
    mcols = jnp.zeros(batch_shape + (W,), dtype=_U32)
    mcols = _accumulate_product(mcols, t, n_prime)
    m = resolve(mcols[..., :L], L)
    # U = T + m * p;  result = U >> 16L  (U/R < 2p)
    p_vec = _const_vec(spec.p_limbs)
    cols = _accumulate_product(cols, m, p_vec)
    digits = resolve(cols, 2 * L)
    return digits[..., L:]


def mont_sqr(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mul_const(spec: FpSpec, a: jnp.ndarray, value: int, mont: bool = True) -> jnp.ndarray:
    """Multiply by a host constant (encoded in Montgomery form)."""
    return mont_mul(spec, a, const(spec, value, (), mont=True))


# -- normalization / comparisons ----------------------------------------------


def normalize(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """[0, 2p) -> canonical [0, p)."""
    return _cond_sub(spec, a, spec.p_limbs)


def is_zero(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    n = normalize(spec, a)
    return jnp.all(n == 0, axis=-1)


def eq(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return is_zero(spec, sub(spec, a, b))


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask broadcast over the limb axis."""
    return jnp.where(mask[..., None], a, b)


# -- Montgomery form conversion -------------------------------------------------


def to_mont(spec: FpSpec, a_std: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a_std, _const_vec(spec.r2_limbs))


def from_mont(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> standard form (canonical [0, p))."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return normalize(spec, mont_mul(spec, a, one))


# -- exponentiation -------------------------------------------------------------


def pow_const(spec: FpSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-int exponent, via lax.scan over the bit array
    (keeps the jaxpr small: one square + one select-mul per step)."""
    if e == 0:
        return const(spec, 1, a.shape[:-1])
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.bool_)

    def step(carry, bit):
        res, base = carry
        res2 = mont_mul(spec, res, base)
        res = jnp.where(bit, res2, res)
        base = mont_sqr(spec, base)
        return (res, base), None

    init = (const(spec, 1, a.shape[:-1]), a)
    (res, _), _ = jax.lax.scan(step, init, jnp.asarray(bits))
    return res


def inv(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse (0 maps to 0)."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inv(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over the leading axis: one Fermat inverse
    + O(N) muls via chunked product scans.  Zero entries map to zero."""
    n = a.shape[0]
    if n == 1:
        return inv(spec, a)
    one = const(spec, 1, a.shape[:-1])
    safe = select(is_zero(spec, a), one, a)

    def mul_op(x, y):
        return mont_mul(spec, x, y)

    prefix = _chunked_scan_mul(spec, safe, reverse=False)
    total_inv = inv(spec, prefix[-1])
    suffix = _chunked_scan_mul(spec, safe, reverse=True)
    one_row = one[:1] if one.ndim == a.ndim else one[None]
    suffix = jnp.concatenate([suffix[1:], one_row], axis=0)
    prefix_excl = jnp.concatenate([one_row, prefix[:-1]], axis=0)
    out = mont_mul(spec, mont_mul(spec, prefix_excl, suffix), total_inv)
    return select(is_zero(spec, a), zeros(spec, a.shape[:-1]), out)


def _chunked_scan_mul(spec: FpSpec, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Inclusive product scan over axis 0 with O(1) graph size: within-
    chunk lax.scan + Hillis-Steele over chunk totals (same decomposition
    as msm/scans.py, specialized to the field monoid)."""
    N = x.shape[0]
    C = min(1024, max(8, N // 8))
    while N % C:
        C -= 1
    K = N // C
    re = jnp.moveaxis(x.reshape((C, K) + x.shape[1:]), 1, 0)  # [K, C, ...]

    def step(carry, row):
        acc = mont_mul(spec, carry, row)
        return acc, acc

    ones = const(spec, 1, (C,) + x.shape[1:-1])
    totals, within = jax.lax.scan(step, ones, re, reverse=reverse)
    # Hillis-Steele across chunk totals
    steps = max(1, (C - 1).bit_length()) if C > 1 else 0
    pos = jnp.arange(C)

    def hs_body(k, buf):
        s = jnp.int32(1) << k
        if reverse:
            shifted = jnp.roll(buf, -s, axis=0)
            valid = pos + s < C
        else:
            shifted = jnp.roll(buf, s, axis=0)
            valid = pos >= s
        shifted = select(valid, shifted, ones)
        return mont_mul(spec, buf, shifted)

    cross = jax.lax.fori_loop(0, steps, hs_body, totals) if C > 1 else totals
    if reverse:
        cross_excl = select(pos < C - 1, jnp.roll(cross, -1, axis=0), ones)
    else:
        cross_excl = select(pos >= 1, jnp.roll(cross, 1, axis=0), ones)
    out = mont_mul(spec, within, cross_excl[None])
    return jnp.moveaxis(out, 0, 1).reshape((N,) + x.shape[1:])
