"""Vectorized Montgomery field arithmetic on uint32 limb tensors (JAX).

Element layout: `uint32[..., L]` of 16-bit little-endian limbs, Montgomery
form, redundant range [0, 2p) (see fields/spec.py).  All functions are pure
and jit-compatible; `spec` is static (hashable dataclass).

Core algorithm: product-scanning Montgomery multiplication with split
16-bit column accumulation —
  columns[k] = sum_{i+j=k} lo16(a_i*b_j) + sum_{i+j=k-1} hi16(a_i*b_j)
  bound: 2L terms * (2^16-1) < 2^23  << 2^32, no overflow for L <= 48;
then L interleaved reduction steps m = col_i * (-p^-1 mod 2^16) mod 2^16,
columns += m*p << 16i, with running carry folds.  With inputs < 2p and
4p <= R the result is < 2p (redundant-form closure), so no per-mul final
subtraction is needed.

This is the TPU-native realization of `ark-ff`'s Montgomery backend
(SURVEY.md §2.2 row 1): same math, data model inverted to structure-of-
arrays so the VPU vectorizes across elements, not limbs.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FpSpec, int_to_limbs

_U32 = jnp.uint32
_I32 = jnp.int32
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


# -- carry/borrow chains -----------------------------------------------------


def _carry_chain(cols: List[jnp.ndarray], n_out: int) -> List[jnp.ndarray]:
    """Propagate carries over uint32 columns; returns n_out 16-bit limbs.

    Caller guarantees the true value fits in n_out limbs.
    """
    out = []
    carry = None
    for i in range(n_out):
        t = cols[i] if i < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            t = t + carry
        out.append(t & MASK)
        carry = t >> LIMB_BITS
    return out


def _sub_limbs(a: List[jnp.ndarray], m: Sequence[int]):
    """a - m (constant); returns (diff limbs, underflow mask)."""
    diff = []
    borrow = None
    for i, ai in enumerate(a):
        t = ai.astype(_I32) - jnp.int32(m[i] if i < len(m) else 0)
        if borrow is not None:
            t = t + borrow
        diff.append((t & jnp.int32(LIMB_MASK)).astype(_U32))
        borrow = t >> LIMB_BITS  # arithmetic shift: 0 or -1
    underflow = borrow < 0
    return diff, underflow


def _cond_sub(a: List[jnp.ndarray], m: Sequence[int]) -> List[jnp.ndarray]:
    """a if a < m else a - m (m a host-int limb tuple)."""
    diff, under = _sub_limbs(a, m)
    return [jnp.where(under, ai, di) for ai, di in zip(a, diff)]


def _split(x: jnp.ndarray) -> List[jnp.ndarray]:
    return [x[..., i] for i in range(x.shape[-1])]


def _join(limbs: List[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(limbs, axis=-1)


# -- add / sub / neg ---------------------------------------------------------


def add(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) in [0, 2p), inputs in [0, 2p).  Sum < 4p <= R fits L limbs."""
    al, bl = _split(a), _split(b)
    s = _carry_chain([x + y for x, y in zip(al, bl)], spec.n_limbs)
    return _join(_cond_sub(s, spec.two_p_limbs))


def sub(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) in [0, 2p): computes a - b + 2p then one conditional sub."""
    al, bl = _split(a), _split(b)
    out = []
    carry = jnp.zeros(a.shape[:-1], dtype=_I32)
    for i in range(spec.n_limbs):
        t = al[i].astype(_I32) - bl[i].astype(_I32) + jnp.int32(spec.two_p_limbs[i]) + carry
        out.append((t & jnp.int32(LIMB_MASK)).astype(_U32))
        carry = t >> LIMB_BITS
    # 2p < R and a < 2p => a - b + 2p < 4p <= R; carry out is 0 or the
    # +2p top limb spill which is impossible since 2p < R.
    return _join(_cond_sub(out, spec.two_p_limbs))


def neg(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(spec, zeros(spec, a.shape[:-1]), a)


def double(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


# -- Montgomery multiplication ------------------------------------------------


def mont_mul(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product abR^-1 mod p, inputs/outputs in [0, 2p).

    Limb-axis-vectorized product scanning: each of the L outer steps does
    one [..., L]-wide 16x16 multiply plus shifted column accumulations, so
    the jaxpr stays O(L) ops (compile-friendly) and the VPU sees wide
    vector work.  Column bound: <= 2L split products of < 2^16 plus folded
    carries < 2^26 — far below the u32 ceiling.
    """
    L = spec.n_limbs
    batch_shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch_shape + (L,))
    b = jnp.broadcast_to(b, batch_shape + (L,))
    nd = len(batch_shape)

    def _shifted(x, off, width):
        # place x at column offset `off` in a width-column buffer (pad+concat
        # lowering — never scatter)
        return jnp.pad(x, [(0, 0)] * nd + [(off, width - off - x.shape[-1])])

    W = 2 * L + 1
    cols = jnp.zeros(batch_shape + (W,), dtype=_U32)
    # full product columns (split 16-bit accumulation, bound < 2^23)
    for i in range(L):
        prod = a[..., i : i + 1] * b  # exact in uint32 (16x16)
        cols = cols + _shifted(prod & MASK, i, W)
        cols = cols + _shifted(prod >> LIMB_BITS, i + 1, W)
    # interleaved reduction: clear limb i with m = cols[i] * n0inv mod 2^16
    n0 = jnp.uint32(spec.n0inv)
    p_vec = jnp.asarray(np.array(spec.p_limbs, dtype=np.uint32))
    for i in range(L):
        m = (cols[..., i : i + 1] * n0) & MASK
        prod = m * p_vec
        carry = (cols[..., i : i + 1] + ((prod[..., 0:1] & MASK))) >> LIMB_BITS
        cols = cols + _shifted(prod & MASK, i, W)
        cols = cols + _shifted(prod >> LIMB_BITS, i + 1, W)
        # limb i is now ≡ 0 mod 2^16; fold its carry upward
        cols = cols + _shifted(carry, i + 1, W)
    out = _carry_chain([cols[..., k] for k in range(L, 2 * L)], L)
    return _join(out)


def mont_sqr(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mul_const(spec: FpSpec, a: jnp.ndarray, value: int, mont: bool = True) -> jnp.ndarray:
    """Multiply by a host constant (encoded in Montgomery form)."""
    return mont_mul(spec, a, const(spec, value, a.shape[:-1], mont=True))


# -- normalization / comparisons ----------------------------------------------


def normalize(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """[0, 2p) -> canonical [0, p)."""
    return _join(_cond_sub(_split(a), spec.p_limbs))


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
    r2 = jnp.broadcast_to(
        jnp.asarray(np.array(spec.r2_limbs, dtype=np.uint32)),
        a_std.shape,
    )
    return mont_mul(spec, a_std, r2)


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
    + O(N) muls via inclusive product scans.  Zero entries map to zero."""
    n = a.shape[0]
    if n == 1:
        return inv(spec, a)
    one = const(spec, 1, a.shape[:-1])
    safe = select(is_zero(spec, a), one, a)

    def mul_op(x, y):
        return mont_mul(spec, x, y)

    prefix = jax.lax.associative_scan(mul_op, safe, axis=0)  # inclusive
    total_inv = inv(spec, prefix[-1])
    # suffix[i] = product of safe[i+1:]; prefix_excl[i] = product of safe[:i]
    suffix = jax.lax.associative_scan(mul_op, safe, axis=0, reverse=True)
    one_row = one[:1] if one.ndim == a.ndim else one[None]
    suffix = jnp.concatenate([suffix[1:], one_row], axis=0)
    prefix_excl = jnp.concatenate([one_row, prefix[:-1]], axis=0)
    out = mont_mul(spec, mont_mul(spec, prefix_excl, suffix), total_inv)
    return select(is_zero(spec, a), zeros(spec, a.shape[:-1]), out)
