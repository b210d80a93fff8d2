"""Vectorized Montgomery field arithmetic on uint32 limb tensors (JAX).

Element layout: `uint32[L, *batch]` of 15-bit little-endian digits,
Montgomery form — **limb-major**: the limb axis LEADS and element/batch
axes TRAIL, so the minor (lane) axis of every tensor is a large element
axis and the VPU's 8x128 lanes are fully utilized.  (The round-1 layout
`[*batch, L]` put L=18..52 on the lane axis and wasted ~7/8 of the
machine; this is the TPU-native inversion of `ark-ff`'s element-major
Montgomery backend, SURVEY.md §2.2 row 1.)

Batch conventions:
  - batch axes trail and broadcast with normal trailing-aligned jnp
    semantics — a mask of batch shape broadcasts against `[L, *batch]`
    with NO axis insertion;
  - column constants are `[W]` vectors aligned via `_cbc` (reshape to
    `[W, 1, ...]`);
  - mixed batch ranks are aligned by inserting axes after the limb axis
    (`_align`), so `[L, n] op [L, rows, n]` does the natural thing.

## The lazy-digit regime (why 15-bit limbs)

The engine sits inside deeply nested scans (MSM windows, NTT stages,
point formulas), so per-op graph size matters as much as FLOPs.  Two
redundancies are tracked separately:

- **digit class** — how large individual uint32 digits may be:
    * exact : digits < 2^15            (outputs of mul/sub/rex/cond_sub)
    * semi  : digits <= 2^15 + 2^12    (after one `fold` pass)
    * lazy  : digits < 2^27            (sums of a few exact/semi values)
  `add`/`dbl` are single vector adds producing lazy digits.  `fold` is 4
  cheap ops.  Full carry resolution (`rex`: two folds + a Kogge-Stone
  binary-carry prefix) appears only in sub/cond_sub/mul-final/boundaries.
  15-bit digits are what make this sound: semi*semi products fit uint32.

- **value class** — multiples of p bounding the represented value.
  Regime: R = 2^(15 L) >= 64 p (spec guarantees).  mont_mul accepts
  values < 8p and returns < 2p; add/dbl grow bounds additively;
  sub(a, b, k) returns a - b + k*p (caller picks k*p >= bound(b));
  cond_sub / normalize shrink bounds.  Callers (curve/NTT kernels) track
  bounds in comments; everything outside those kernels sees the strict
  [0, 2p) world via the *_strict helpers.

## mont_mul

Interleaved CIOS over the L digits of `a`:
  acc += a_i * b;  m = (-acc[0]/p mod 2^15);  acc += m * p;  acc >>= 15
with acc a [L+1, ...] uint32 column stack.  Per-step column growth is
< 2^17.3 and lifetimes are <= L steps, so columns stay < 2^23 for every
supported L — no intra-step carrying at all.  One final `rex` returns
exact digits.  Inputs are folded to semi first (any lazy input is fine).

Three interchangeable realizations (groth16_tpu/config.py):
  - Pallas kernel (fields/pallas_fp.py): the whole CIOS loop unrolled in
    VMEM — one HBM read per operand, one write (default on TPU);
  - XLA unrolled loop (cios_unroll=True);
  - XLA lax.scan (smallest graph; right for the CPU backend).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.config import CONFIG, pallas_enabled
from groth16_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FpSpec, int_to_limbs

_U32 = jnp.uint32
MASK = jnp.uint32(LIMB_MASK)


def const(spec: FpSpec, value: int, shape=(), mont: bool = True) -> jnp.ndarray:
    """Broadcast a host integer constant to limb-tensor form (exact)."""
    v = value % spec.modulus
    if mont:
        v = spec.to_mont_int(v)
    limbs = np.array(int_to_limbs(v, spec.n_limbs), dtype=np.uint32)
    limbs = limbs.reshape((spec.n_limbs,) + (1,) * len(tuple(shape)))
    return jnp.broadcast_to(jnp.asarray(limbs), (spec.n_limbs,) + tuple(shape))


def zeros(spec: FpSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros((spec.n_limbs,) + tuple(shape), dtype=_U32)


def _const_vec(limbs: Sequence[int]) -> jnp.ndarray:
    return jnp.asarray(np.array(limbs, dtype=np.uint32))


def _cbc(vec: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """[W] column constant -> [W, 1, ...] aligned to rank `ndim`."""
    return vec.reshape((vec.shape[0],) + (1,) * (ndim - 1))


def _align(a: jnp.ndarray, b: jnp.ndarray):
    """Insert missing batch axes (after the limb axis) so trailing-aligned
    jnp broadcasting matches the limb-leading convention."""
    nd = max(a.ndim, b.ndim)
    if a.ndim < nd:
        a = a.reshape(a.shape[:1] + (1,) * (nd - a.ndim) + a.shape[1:])
    if b.ndim < nd:
        b = b.reshape(b.shape[:1] + (1,) * (nd - b.ndim) + b.shape[1:])
    return a, b


# -- digit-class management ----------------------------------------------------


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Multiply by 2^(15 d): digits move to higher index; width preserved.
    Caller guarantees the dropped top digits are zero-valued."""
    return jnp.pad(x, [(d, 0)] + [(0, 0)] * (x.ndim - 1))[: x.shape[0]]


def fold(x: jnp.ndarray) -> jnp.ndarray:
    """lazy -> semi: one local carry fold.  digits < 2^27 -> <= 2^15+2^12.
    Value-preserving iff the top digit's high part is zero (callers
    guarantee value < R and digits lazy, which implies it)."""
    return (x & MASK) + _shift_up(x >> LIMB_BITS, 1)


def rex(cols: jnp.ndarray, n_out: int, want_carry: bool = False):
    """Exact digit resolution: columns (< 2^30) -> digits < 2^15.

    Value taken mod 2^(15 n_out).  Two folds bring digits to <= 2^15,
    then a Kogge-Stone binary-carry prefix resolves in ceil(log2(W))
    vector steps.  With want_carry=True also returns the bit at position
    n_out (caller guarantees value < 2^(15 (n_out+1)))."""
    W = n_out + 1 if want_carry else n_out
    cur = cols.shape[0]
    if cur < W:
        x = jnp.pad(cols, [(0, W - cur)] + [(0, 0)] * (cols.ndim - 1))
    else:
        x = cols[:W]
    x = (x & MASK) + _shift_up(x >> LIMB_BITS, 1)  # < 2^15 + 2^15
    x = (x & MASK) + _shift_up(x >> LIMB_BITS, 1)  # <= 2^15
    g = x >> LIMB_BITS  # {0, 1}
    p = (x == MASK).astype(_U32)
    d = 1
    while d < W:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    digits = (x + _shift_up(g, 1)) & MASK
    if want_carry:
        return digits[:n_out], digits[n_out]
    return digits


# -- lazy add / sub ------------------------------------------------------------


def add(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LAZY add: one vector op.  value(out) = value(a) + value(b);
    digits grow (fold/rex consumers handle any digits < 2^27)."""
    a, b = _align(a, b)
    return a + b


def dbl(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return a + a


def sub(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """a - b + k*p, EXACT output digits.

    Requires value(b) < k*p and value(a) + k*p < R (always true in the
    8p regime since 16p < R).  b may have any digit class (resolved
    internally); a may be lazy."""
    L = spec.n_limbs
    a, b = _align(a, b)
    b_x = rex(b, L)
    kp = k * spec.modulus
    # a + (R-1 - b) + 1 + kp == a - b + k*p + R; resolving to L digits
    # drops the explicit +R.
    off = _const_vec(int_to_limbs(kp, L + 1)[:L])  # kp < 8p < R fits L
    nd = max(a.ndim, b_x.ndim)
    u = a + (MASK - b_x) + _cbc(off, nd)
    u = u.at[0].add(1)
    return rex(u, L)


def sub_exact(spec: FpSpec, a: jnp.ndarray, b_exact: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Like sub but skips resolving b: b must already have exact digits
    (< 2^15) — true for mul/sub/cond_sub outputs and constants."""
    L = spec.n_limbs
    a, b_exact = _align(a, b_exact)
    off = _const_vec(int_to_limbs(k * spec.modulus, L + 1)[:L])
    u = a + (MASK - b_exact) + _cbc(off, a.ndim)
    u = u.at[0].add(1)
    return rex(u, L)


def neg(spec: FpSpec, a: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """k*p - a (exact digits).  Requires value(a) < k*p."""
    return sub(spec, jnp.zeros_like(a), a, k=k)


def double(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:  # legacy name
    return a + a


def cond_sub(spec: FpSpec, x: jnp.ndarray, m_limbs: Sequence[int]) -> jnp.ndarray:
    """x if x < m else x - m.  x: lazy ok, value < R; output exact."""
    L = spec.n_limbs
    x = rex(x, L)
    comp = _const_vec([LIMB_MASK - v for v in m_limbs[:L]])
    u = x + _cbc(comp, x.ndim)
    u = u.at[0].add(1)
    digits, carry = rex(u, L, want_carry=True)
    return jnp.where(carry > 0, digits, x)


def reduce_to_2p(spec: FpSpec, x: jnp.ndarray, bound_k: int = 8) -> jnp.ndarray:
    """value < bound_k * p -> [0, 2p), exact digits."""
    k = bound_k
    while k > 2:
        k = (k + 1) // 2
        x = cond_sub(spec, x, int_to_limbs(k * spec.modulus, spec.n_limbs))
    return x


# -- strict [0, 2p) API (for code outside the bound-audited kernels) ------------


def add_strict(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[0,2p) x [0,2p) -> [0,2p), exact digits."""
    return cond_sub(spec, add(spec, a, b), spec.two_p_limbs)


def sub_strict(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return cond_sub(spec, sub(spec, a, b, k=2), spec.two_p_limbs)


# -- Montgomery multiplication ------------------------------------------------


def mont_mul(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p.

    Inputs: any digit class, values < 8p (so a*b < 64 p^2 <= R*p).
    Output: exact digits, value < 2p."""
    L = spec.n_limbs
    a, b = _align(a, b)
    batch_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    if pallas_enabled():
        n_elems = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
        if n_elems >= CONFIG.pallas_min_elems:
            blk = min(CONFIG.pallas_block, n_elems & -n_elems)  # pow2 divisor
            if blk >= 128:
                from groth16_tpu.fields.pallas_fp import mont_mul_pallas

                af = jnp.broadcast_to(a, (L,) + batch_shape).reshape(L, n_elems)
                bf = jnp.broadcast_to(b, (L,) + batch_shape).reshape(L, n_elems)
                out = mont_mul_pallas(spec, af, bf, blk)
                return out.reshape((L,) + batch_shape)
    return _mont_mul_xla(spec, a, b, batch_shape)


def _mont_mul_xla(spec: FpSpec, a, b, batch_shape) -> jnp.ndarray:
    """Interleaved CIOS on the XLA path (lax.scan or unrolled)."""
    L = spec.n_limbs
    a = jnp.broadcast_to(fold(a), (L,) + batch_shape)
    b = jnp.broadcast_to(fold(b), (L,) + batch_shape)

    p_vec = _cbc(_const_vec(spec.p_limbs), 1 + len(batch_shape))
    n0 = jnp.uint32(spec.n0inv)
    pad_first = [(0, 1)] + [(0, 0)] * len(batch_shape)

    def step(acc, ai):
        # acc: [L+1, ...] columns, entries < 2^23
        prod = ai[None] * b  # semi*semi < 2^31
        acc = acc + jnp.pad(prod & MASK, pad_first)
        acc = acc + _shift_up(jnp.pad(prod >> LIMB_BITS, pad_first), 1)
        m = ((acc[0] & MASK) * n0) & MASK
        prod2 = m[None] * p_vec
        acc = acc + jnp.pad(prod2 & MASK, pad_first)
        acc = acc + _shift_up(jnp.pad(prod2 >> LIMB_BITS, pad_first), 1)
        carry = acc[0] >> LIMB_BITS  # acc[0] ≡ 0 mod 2^15 now
        lo = acc[1] + carry
        acc = jnp.concatenate(
            [lo[None], acc[2:], jnp.zeros_like(lo)[None]], axis=0
        )
        return acc, None

    acc = jnp.zeros((L + 1,) + batch_shape, dtype=_U32)
    n_elems = 1
    for d in batch_shape:
        n_elems *= d
    # tiny batches (single points in proof assembly / Horner combines)
    # unroll on TPU: a nested L-step lax.scan per multiply costs ~L tiny
    # device ops each — pure loop overhead at width 1 over the tunnel.
    # Off-TPU the scan stays: ~10x less HLO to compile (dryrun cost).
    small = (
        n_elems <= CONFIG.cios_small_unroll_max
        and jax.default_backend() == "tpu"
    )
    if CONFIG.cios_unroll or small:
        for i in range(L):
            acc, _ = step(acc, a[i])
    else:
        acc, _ = jax.lax.scan(step, acc, a)
    # value < 2p < R: top column is zero; resolve to exact digits
    return rex(acc, L)


def mont_sqr(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mul_const(spec: FpSpec, a: jnp.ndarray, value: int, mont: bool = True) -> jnp.ndarray:
    """Multiply by a host constant (encoded in Montgomery form)."""
    return mont_mul(spec, a, const(spec, value, (), mont=True))


# -- normalization / comparisons ----------------------------------------------


def normalize(spec: FpSpec, a: jnp.ndarray, bound_k: int = 8) -> jnp.ndarray:
    """value < bound_k*p -> canonical [0, p), exact digits."""
    a = reduce_to_2p(spec, a, bound_k=bound_k)
    return cond_sub(spec, a, spec.p_limbs)


def is_zero(spec: FpSpec, a: jnp.ndarray, bound_k: int = 8) -> jnp.ndarray:
    n = normalize(spec, a, bound_k=bound_k)
    return jnp.all(n == 0, axis=0)


def eq(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a == b mod p for values < 8p."""
    d = sub(spec, a, b, k=8)  # < 16p
    return is_zero(spec, d, bound_k=16)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b; a batch-shaped mask broadcasts naturally (trailing
    batch axes), no axis insertion needed."""
    return jnp.where(mask, a, b)


# -- Montgomery form conversion -------------------------------------------------


def to_mont(spec: FpSpec, a_std: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a_std, _cbc(_const_vec(spec.r2_limbs), a_std.ndim))


def from_mont(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> standard form (canonical [0, p))."""
    one = jnp.zeros_like(a).at[0].set(1)
    return normalize(spec, mont_mul(spec, a, one), bound_k=2)


# -- exponentiation -------------------------------------------------------------


def pow_const(spec: FpSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-int exponent, via lax.scan over the bit array
    (keeps the jaxpr small: one square + one select-mul per step)."""
    if e == 0:
        return const(spec, 1, a.shape[1:])
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.bool_)

    def step(carry, bit):
        res, base = carry
        res2 = mont_mul(spec, res, base)
        res = jnp.where(bit, res2, res)
        base = mont_sqr(spec, base)
        return (res, base), None

    init = (const(spec, 1, a.shape[1:]), a)
    (res, _), _ = jax.lax.scan(step, init, jnp.asarray(bits))
    return res


def inv(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse (0 maps to 0).  Input value < 8p."""
    return pow_const(spec, fold(a), spec.modulus - 2)


def batch_inv(spec: FpSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over the trailing element axis: one
    Fermat inverse + O(N) muls via chunked product scans.  Zero entries
    map to zero.  a: [L, N]."""
    n = a.shape[-1]
    if n == 1:
        return inv(spec, a)
    one = const(spec, 1, a.shape[1:])
    zmask = is_zero(spec, a)
    safe = select(zmask, one, a)

    prefix = _chunked_scan_mul(spec, safe, reverse=False)
    total_inv = inv(spec, prefix[..., -1])
    suffix = _chunked_scan_mul(spec, safe, reverse=True)
    one_col = one[..., :1]
    suffix = jnp.concatenate([suffix[..., 1:], one_col], axis=-1)
    prefix_excl = jnp.concatenate([one_col, prefix[..., :-1]], axis=-1)
    out = mont_mul(spec, mont_mul(spec, prefix_excl, suffix), total_inv[..., None])
    return select(zmask, zeros(spec, a.shape[1:]), out)


def _chunked_scan_mul(spec: FpSpec, x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Inclusive product scan over the trailing element axis with O(1)
    graph size: within-chunk lax.scan + Hillis-Steele over chunk totals
    (same decomposition as msm/scans.py, specialized to the field
    monoid).  x: [L, N] (1-D element batch)."""
    N = x.shape[-1]
    C = min(1024, max(8, N // 8))
    while N % C:
        C -= 1
    K = N // C
    # element j = c*K + k lives at [c, k]; scan along K (axis moved to 0)
    re = jnp.moveaxis(x.reshape(x.shape[:-1] + (C, K)), -1, 0)  # [K, L, C]

    def step(carry, row):
        acc = mont_mul(spec, carry, row)
        return acc, acc

    ones = const(spec, 1, (C,))
    totals, within = jax.lax.scan(step, ones, re, reverse=reverse)
    within = jnp.moveaxis(within, 0, -1)  # [L, C, K]
    steps = max(1, (C - 1).bit_length()) if C > 1 else 0
    pos = jnp.arange(C)

    def hs_body(k, buf):
        s = jnp.int32(1) << k
        if reverse:
            shifted = jnp.roll(buf, -s, axis=-1)
            valid = pos + s < C
        else:
            shifted = jnp.roll(buf, s, axis=-1)
            valid = pos >= s
        shifted = select(valid, shifted, ones)
        return mont_mul(spec, buf, shifted)

    cross = jax.lax.fori_loop(0, steps, hs_body, totals) if C > 1 else totals
    if reverse:
        cross_excl = select(pos < C - 1, jnp.roll(cross, -1, axis=-1), ones)
    else:
        cross_excl = select(pos >= 1, jnp.roll(cross, 1, axis=-1), ones)
    out = mont_mul(spec, within, cross_excl[..., None])  # [L, C, K]
    return out.reshape(x.shape[:-1] + (N,))
