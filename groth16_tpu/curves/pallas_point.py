"""Fused Pallas kernel for the complete G1 point addition (RCB, a = 0).

The XLA path (curves/point.py) realizes one addition as 3 stacked
Montgomery multiplies + ~6 resolving passes — each a separate HBM
round-trip.  This kernel runs the whole Renes-Costello-Batina formula in
VMEM: 12 Montgomery multiplies, the subtraction/reduction ledger, and the
final [0,2p) normalization, with HBM traffic of exactly 6 coordinate
reads + 3 writes.  Digit-level math is IDENTICAL to the XLA path (same
CIOS core, same fold/rex passes, same k*p offsets), so outputs are
bit-exact against it and against the exact integer engine.

Bound ledger mirrors curves/point.py:add (values as multiples of p):
inputs < 2p; pre-adds < 4p; M1 products <= 16p^2; t3/t4/t5 < 6p;
t0t < 6p; M2 <= 6p^2; Z3s/t1m < 4p; M3 products <= 36p^2; X3/Y3/Z3
pre-reduce < 4p; outputs < 2p exact.

Reference analog: the `ark-ec` short-Weierstrass group ops consumed at
/root/reference/src/prover.rs:127-130 (SURVEY.md §2.2 "Curve groups").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groth16_tpu.fields.pallas_fp import _M, _shift_up, cios
from groth16_tpu.fields.spec import LIMB_BITS, FpSpec, int_to_limbs


def _rex_cols(x: jnp.ndarray, n_out: int, want_carry: bool = False):
    """Kernel-side port of fp.rex: columns (< 2^30) -> exact digits."""
    W = n_out + 1 if want_carry else n_out
    if x.shape[0] < W:
        pad = x[: W - x.shape[0]]
        x = jnp.concatenate([x, pad ^ pad], axis=0)
    else:
        x = x[:W]
    x = (x & _M) + _shift_up(x >> LIMB_BITS, 1)
    x = (x & _M) + _shift_up(x >> LIMB_BITS, 1)
    g = x >> LIMB_BITS
    p = (x == _M).astype(jnp.uint32)
    d = 1
    while d < W:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    digits = (x + _shift_up(g, 1)) & _M
    if want_carry:
        return digits[:n_out], digits[n_out]
    return digits


def _ksub(a: jnp.ndarray, b: jnp.ndarray, kp_col: jnp.ndarray, L: int) -> jnp.ndarray:
    """a - b + k*p with exact output digits (mirrors fp.sub): a lazy,
    b any digit class, kp_col the k*p limb column (exact or lazy < 2^16)."""
    b_x = _rex_cols(b, L)
    u = a + (_M - b_x) + kp_col
    u = jnp.concatenate([u[:1] + 1, u[1:]], axis=0)
    return _rex_cols(u, L)


def _cond_sub2p(x: jnp.ndarray, twop_col: jnp.ndarray, L: int) -> jnp.ndarray:
    """value < 4p -> [0, 2p) (mirrors fp.cond_sub with m = 2p)."""
    x = _rex_cols(x, L)
    u = x + (_M - twop_col)
    u = jnp.concatenate([u[:1] + 1, u[1:]], axis=0)
    digits, carry = _rex_cols(u, L, want_carry=True)
    return jnp.where(carry > 0, digits, x)


def full_add_g1_math(p_c, twop, fourp, b3, P1, P2, n0: int, L: int):
    """Projective + projective RCB complete addition body, a = 0 —
    shared by the standalone add kernel and the MSM cross-pass scan
    kernel.  Inputs < 2p, outputs < 2p exact."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    mul = lambda a, b: cios(a, b, p_c, n0, L)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    m3 = mul(X1 + Y1, X2 + Y2)
    m4 = mul(Y1 + Z1, Y2 + Z2)
    m5 = mul(X1 + Z1, X2 + Z2)
    t3 = _ksub(m3, t0 + t1, fourp, L)  # X1Y2+X2Y1 < 6p
    t4 = _ksub(m4, t1 + t2, fourp, L)  # Y1Z2+Y2Z1 < 6p
    t5 = _ksub(m5, t0 + t2, fourp, L)  # X1Z2+X2Z1 < 6p
    t0t = t0 + t0 + t0  # 3*X1X2 < 6p lazy
    t2b = mul(t2, b3)
    t5b = mul(t5, b3)
    Z3s = t1 + t2b  # < 4p lazy
    t1m = _ksub(t1, t2b, twop, L)  # < 4p exact
    w0 = mul(t4, t5b)
    w1 = mul(t3, t1m)
    w2 = mul(t5b, t0t)
    w3 = mul(t1m, Z3s)
    w4 = mul(t0t, t3)
    w5 = mul(Z3s, t4)
    X3 = _ksub(w1, w0, twop, L)  # < 4p
    Y3 = w3 + w2  # < 4p lazy
    Z3 = w5 + w4  # < 4p lazy
    return (
        _cond_sub2p(X3, twop, L),
        _cond_sub2p(Y3, twop, L),
        _cond_sub2p(Z3, twop, L),
    )


@functools.lru_cache(maxsize=None)
def _add_kernel(spec: FpSpec, blk: int):
    L = spec.n_limbs
    n0 = int(spec.n0inv)

    def kernel(c_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
               x3_ref, y3_ref, z3_ref):
        # c_ref: [L, 4*blk] full-width constant planes (p, 2p, 4p,
        # b3_mont) — sub-lane-width columns crash/miscompile Mosaic, so
        # every constant is materialized at block width
        p_c = c_ref[:, 0 * blk : 1 * blk]
        twop = c_ref[:, 1 * blk : 2 * blk]
        fourp = c_ref[:, 2 * blk : 3 * blk]
        b3 = c_ref[:, 3 * blk : 4 * blk]
        X3, Y3, Z3 = full_add_g1_math(
            p_c, twop, fourp, b3,
            (x1_ref[...], y1_ref[...], z1_ref[...]),
            (x2_ref[...], y2_ref[...], z2_ref[...]),
            n0, L,
        )
        x3_ref[...] = X3
        y3_ref[...] = Y3
        z3_ref[...] = Z3

    return kernel


@functools.lru_cache(maxsize=None)
def _consts_np(spec: FpSpec, b3_val: int, blk: int) -> np.ndarray:
    L = spec.n_limbs
    cols = [
        int_to_limbs(spec.modulus, L),
        int_to_limbs(2 * spec.modulus, L),
        int_to_limbs(4 * spec.modulus, L),
        int_to_limbs(spec.to_mont_int(b3_val % spec.modulus), L),
    ]
    arr = np.array(cols, np.uint32)  # [4, L]
    return np.concatenate(
        [np.broadcast_to(c[:, None], (L, blk)) for c in arr], axis=1
    ).copy()  # [L, 4*blk]


def add_g1_pallas(spec: FpSpec, b3_val: int, p1, p2, blk: int):
    """(X1,Y1,Z1)+(X2,Y2,Z2) on [L, N] coords, blk | N; coords < 2p in,
    < 2p exact out."""
    L, N = p1[0].shape
    grid = (N // blk,)
    cspec = pl.BlockSpec((L, 4 * blk), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    flops_est = 12 * 4 * L * L * N
    out = pl.pallas_call(
        _add_kernel(spec, blk),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, N), jnp.uint32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[cspec] + [bspec] * 6,
        out_specs=(bspec, bspec, bspec),
        cost_estimate=pl.CostEstimate(
            flops=flops_est, bytes_accessed=9 * L * N * 4, transcendentals=0
        ),
    )(jnp.asarray(_consts_np(spec, b3_val, blk)), *p1, *p2)
    return out


# -- G1 mixed addition (affine second operand) ---------------------------------


def mixed_add_g1_math(p_c, twop, fourp, b3, P1, XY2, n0: int, L: int):
    """Projective + affine (Z2 = 1) RCB complete addition body, a = 0 —
    shared by the standalone mixed-add kernel and the MSM suffix-scan
    kernel (msm/pallas_scan.py).

    Substituting Z2 = 1 into the full formula: t2 = Z1,
    t4 = Y1 + Y2*Z1, t5 = X1 + X2*Z1 — 13 CIOS multiplies (vs 14) and no
    Z2 plane in HBM.  Affine infinity is encoded (0, 0) (y = 0 never
    occurs for odd-order subgroup points); those lanes pass X1/Y1/Z1
    through unchanged.  Bounds: t4/t5 < 4p lazy (tighter than the full
    add's 6p); everything else per the full-add ledger.  Inputs < 2p,
    outputs < 2p exact."""
    X1, Y1, Z1 = P1
    X2, Y2 = XY2
    inf2 = jnp.all(Y2 == 0, axis=0, keepdims=True)

    mul = lambda a, b: cios(a, b, p_c, n0, L)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    m3 = mul(X1 + Y1, X2 + Y2)
    t3 = _ksub(m3, t0 + t1, fourp, L)  # X1Y2+X2Y1 < 6p
    t4 = Y1 + mul(Y2, Z1)  # < 4p lazy
    t5 = X1 + mul(X2, Z1)  # < 4p lazy
    t0t = t0 + t0 + t0  # 3*X1X2 < 6p lazy
    t2b = mul(Z1, b3)
    t5b = mul(t5, b3)
    Z3s = t1 + t2b  # < 4p lazy
    t1m = _ksub(t1, t2b, twop, L)  # < 4p exact
    w0 = mul(t4, t5b)
    w1 = mul(t3, t1m)
    w2 = mul(t5b, t0t)
    w3 = mul(t1m, Z3s)
    w4 = mul(t0t, t3)
    w5 = mul(Z3s, t4)
    X3 = _ksub(w1, w0, twop, L)  # < 4p
    Y3 = w3 + w2  # < 4p lazy
    Z3 = w5 + w4  # < 4p lazy
    X3 = jnp.where(inf2, X1, _cond_sub2p(X3, twop, L))
    Y3 = jnp.where(inf2, Y1, _cond_sub2p(Y3, twop, L))
    Z3 = jnp.where(inf2, Z1, _cond_sub2p(Z3, twop, L))
    return X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def _add_mixed_kernel(spec: FpSpec, blk: int):
    """pallas_call wrapper around mixed_add_g1_math."""
    L = spec.n_limbs
    n0 = int(spec.n0inv)

    def kernel(c_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
               x3_ref, y3_ref, z3_ref):
        p_c = c_ref[:, 0 * blk : 1 * blk]
        twop = c_ref[:, 1 * blk : 2 * blk]
        fourp = c_ref[:, 2 * blk : 3 * blk]
        b3 = c_ref[:, 3 * blk : 4 * blk]
        X3, Y3, Z3 = mixed_add_g1_math(
            p_c, twop, fourp, b3,
            (x1_ref[...], y1_ref[...], z1_ref[...]),
            (x2_ref[...], y2_ref[...]),
            n0, L,
        )
        x3_ref[...] = X3
        y3_ref[...] = Y3
        z3_ref[...] = Z3

    return kernel


def add_mixed_g1_pallas(spec: FpSpec, b3_val: int, p1, xy2, blk: int):
    """(X1,Y1,Z1) + affine (X2,Y2) on [L, N] coords, blk | N.

    xy2 = (X2, Y2) with infinity encoded (0, 0); coords < 2p in, < 2p
    exact out."""
    L, N = p1[0].shape
    grid = (N // blk,)
    cspec = pl.BlockSpec((L, 4 * blk), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    flops_est = 13 * 4 * L * L * N
    return pl.pallas_call(
        _add_mixed_kernel(spec, blk),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, N), jnp.uint32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[cspec] + [bspec] * 5,
        out_specs=(bspec, bspec, bspec),
        cost_estimate=pl.CostEstimate(
            flops=flops_est, bytes_accessed=8 * L * N * 4, transcendentals=0
        ),
    )(jnp.asarray(_consts_np(spec, b3_val, blk)), *p1, *xy2)


# -- G2 (Fp2 coordinates) ------------------------------------------------------


def _reduce_chain(x, bound_p: int, consts, L: int):
    """value < bound_p * p -> [0, 2p) via power-of-two cond_subs.
    consts: dict with '8p','4p','2p' columns (each full block width)."""
    for name, m in (("8p", 8), ("4p", 4), ("2p", 2)):
        if bound_p > m:
            x = _cond_sub_m(x, consts[name], L)
            bound_p = m  # cond_sub(m) needs x < 2m; callers keep bound <= 2m
    return x


def _cond_sub_m(x, m_col, L: int):
    x = _rex_cols(x, L)
    u = x + (_M - m_col)
    u = jnp.concatenate([u[:1] + 1, u[1:]], axis=0)
    digits, carry = _rex_cols(u, L, want_carry=True)
    return jnp.where(carry > 0, digits, x)


def _small_chain(x, n: int):
    """x * n (n >= 1) via lazy add chain (mirrors ops._fp_mul_small_lazy)."""
    acc = None
    base = x
    while n:
        if n & 1:
            acc = base if acc is None else acc + base
        n >>= 1
        if n:
            base = base + base
    return acc


@functools.lru_cache(maxsize=None)
def _add_g2_kernel(spec: FpSpec, nr: int, blk: int):
    """Fused RCB addition over Fq2 = Fq[u]/(u^2 - nr), |nr| <= 16.

    Same formula/ledger as the G1 kernel, at the Fp2 level; Fp2
    multiplication is schoolbook (4 CIOS) with the nonresidue folded in
    as a lazy add chain, mirroring fields/ops.py:Fp2Ops.mul_many.
    """
    L = spec.n_limbs
    n0 = int(spec.n0inv)
    assert 1 <= abs(nr) <= 16

    def kernel(c_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
               x3_ref, y3_ref, z3_ref):
        # c_ref planes: p, 2p, 4p, 8p, 2|nr|p, b3_c0, b3_c1
        cc = lambda i: c_ref[:, i * blk : (i + 1) * blk]
        p_c, twop, fourp, eightp, nr2p, b3c0, b3c1 = (cc(i) for i in range(7))
        consts = {"2p": twop, "4p": fourp, "8p": eightp}
        mulp = lambda a, b: cios(a, b, p_c, n0, L)

        def f2mul(a, b, bound_c0_extra=0):
            """Schoolbook Fp2 product; inputs componentwise < 8p values,
            outputs < 2p exact."""
            a0, a1 = a
            b0, b1 = b
            v00 = mulp(a0, b0)
            v11 = mulp(a1, b1)
            v01 = mulp(a0, b1)
            v10 = mulp(a1, b0)
            t = _small_chain(v11, abs(nr))  # < 2|nr| p lazy
            if nr < 0:
                c0 = _ksub(v00, t, nr2p, L)  # < (2 + 2|nr|) p
            else:
                c0 = v00 + t  # < (2 + 2 nr) p lazy
            c0 = _reduce_chain(c0, 2 + 2 * abs(nr), consts, L)
            c1 = _cond_sub_m(v01 + v10, twop, L)  # < 4p -> < 2p
            return (c0, c1)

        def f2pair(r):  # [L, 2, blk] -> (c0, c1)
            return (r[:, 0], r[:, 1])

        P1 = tuple(f2pair(r[...]) for r in (x1_ref, y1_ref, z1_ref))
        P2 = tuple(f2pair(r[...]) for r in (x2_ref, y2_ref, z2_ref))
        (X1, Y1, Z1), (X2, Y2, Z2) = P1, P2
        b3 = (b3c0, b3c1)

        def f2add(a, b):
            return (a[0] + b[0], a[1] + b[1])

        def f2ksub(a, b, kp):
            return (_ksub(a[0], b[0], kp, L), _ksub(a[1], b[1], kp, L))

        t0 = f2mul(X1, X2)
        t1 = f2mul(Y1, Y2)
        t2 = f2mul(Z1, Z2)
        m3 = f2mul(f2add(X1, Y1), f2add(X2, Y2))
        m4 = f2mul(f2add(Y1, Z1), f2add(Y2, Z2))
        m5 = f2mul(f2add(X1, Z1), f2add(X2, Z2))
        t3 = f2ksub(m3, f2add(t0, t1), fourp)  # < 6p
        t4 = f2ksub(m4, f2add(t1, t2), fourp)
        t5 = f2ksub(m5, f2add(t0, t2), fourp)
        t0t = (t0[0] + t0[0] + t0[0], t0[1] + t0[1] + t0[1])  # < 6p lazy
        t2b = f2mul(t2, b3)
        t5b = f2mul(t5, b3)
        Z3s = f2add(t1, t2b)  # < 4p lazy
        t1m = f2ksub(t1, t2b, twop)  # < 4p
        w0 = f2mul(t4, t5b)
        w1 = f2mul(t3, t1m)
        w2 = f2mul(t5b, t0t)
        w3 = f2mul(t1m, Z3s)
        w4 = f2mul(t0t, t3)
        w5 = f2mul(Z3s, t4)
        X3 = f2ksub(w1, w0, twop)  # < 4p
        Y3 = f2add(w3, w2)  # < 4p lazy
        Z3 = f2add(w5, w4)  # < 4p lazy

        def out(ref, v):
            ref[...] = jnp.stack(
                [_cond_sub_m(v[0], twop, L), _cond_sub_m(v[1], twop, L)],
                axis=1,
            )

        out(x3_ref, X3)
        out(y3_ref, Y3)
        out(z3_ref, Z3)

    return kernel


@functools.lru_cache(maxsize=None)
def _consts_g2_np(spec: FpSpec, nr: int, b3_val, blk: int) -> np.ndarray:
    L = spec.n_limbs
    b3c0, b3c1 = b3_val
    cols = [
        int_to_limbs(spec.modulus, L),
        int_to_limbs(2 * spec.modulus, L),
        int_to_limbs(4 * spec.modulus, L),
        int_to_limbs(8 * spec.modulus, L),
        int_to_limbs(2 * abs(nr) * spec.modulus, L),
        int_to_limbs(spec.to_mont_int(b3c0 % spec.modulus), L),
        int_to_limbs(spec.to_mont_int(b3c1 % spec.modulus), L),
    ]
    arr = np.array(cols, np.uint32)  # [7, L]
    return np.concatenate(
        [np.broadcast_to(c[:, None], (L, blk)) for c in arr], axis=1
    ).copy()  # [L, 7*blk]


@functools.lru_cache(maxsize=None)
def _add_mixed_g2_kernel(spec: FpSpec, nr: int, blk: int):
    """Projective + affine RCB complete addition over Fq2 (Z2 = 1):
    13 Fp2 multiplies, no Z2 plane; same ledger as the full G2 kernel.
    Affine infinity encoded Y2 = (0, 0)."""
    L = spec.n_limbs
    n0 = int(spec.n0inv)
    assert 1 <= abs(nr) <= 16

    def kernel(c_ref, x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
               x3_ref, y3_ref, z3_ref):
        cc = lambda i: c_ref[:, i * blk : (i + 1) * blk]
        p_c, twop, fourp, eightp, nr2p, b3c0, b3c1 = (cc(i) for i in range(7))
        consts = {"2p": twop, "4p": fourp, "8p": eightp}
        mulp = lambda a, b: cios(a, b, p_c, n0, L)

        def f2mul(a, b):
            a0, a1 = a
            b0, b1 = b
            v00 = mulp(a0, b0)
            v11 = mulp(a1, b1)
            v01 = mulp(a0, b1)
            v10 = mulp(a1, b0)
            t = _small_chain(v11, abs(nr))
            if nr < 0:
                c0 = _ksub(v00, t, nr2p, L)
            else:
                c0 = v00 + t
            c0 = _reduce_chain(c0, 2 + 2 * abs(nr), consts, L)
            c1 = _cond_sub_m(v01 + v10, twop, L)
            return (c0, c1)

        def f2pair(r):
            return (r[:, 0], r[:, 1])

        X1, Y1, Z1 = (f2pair(r[...]) for r in (x1_ref, y1_ref, z1_ref))
        X2, Y2 = (f2pair(r[...]) for r in (x2_ref, y2_ref))
        inf2 = jnp.all((Y2[0] | Y2[1]) == 0, axis=0)[None, None, :]
        b3 = (b3c0, b3c1)

        def f2add(a, b):
            return (a[0] + b[0], a[1] + b[1])

        def f2ksub(a, b, kp):
            return (_ksub(a[0], b[0], kp, L), _ksub(a[1], b[1], kp, L))

        t0 = f2mul(X1, X2)
        t1 = f2mul(Y1, Y2)
        m3 = f2mul(f2add(X1, Y1), f2add(X2, Y2))
        t3 = f2ksub(m3, f2add(t0, t1), fourp)  # < 6p
        t4 = f2add(Y1, f2mul(Y2, Z1))  # < 4p lazy
        t5 = f2add(X1, f2mul(X2, Z1))  # < 4p lazy
        t0t = (t0[0] + t0[0] + t0[0], t0[1] + t0[1] + t0[1])
        t2b = f2mul(Z1, b3)
        t5b = f2mul(t5, b3)
        Z3s = f2add(t1, t2b)
        t1m = f2ksub(t1, t2b, twop)
        w0 = f2mul(t4, t5b)
        w1 = f2mul(t3, t1m)
        w2 = f2mul(t5b, t0t)
        w3 = f2mul(t1m, Z3s)
        w4 = f2mul(t0t, t3)
        w5 = f2mul(Z3s, t4)
        X3 = f2ksub(w1, w0, twop)
        Y3 = f2add(w3, w2)
        Z3 = f2add(w5, w4)

        def out(ref, v, keep):
            new = jnp.stack(
                [_cond_sub_m(v[0], twop, L), _cond_sub_m(v[1], twop, L)],
                axis=1,
            )
            ref[...] = jnp.where(inf2, keep, new)

        out(x3_ref, X3, x1_ref[...])
        out(y3_ref, Y3, y1_ref[...])
        out(z3_ref, Z3, z1_ref[...])

    return kernel


def add_mixed_g2_pallas(spec: FpSpec, nr: int, b3_val, p1, xy2, blk: int):
    """(X1,Y1,Z1) + affine (X2,Y2) on [L, 2, N] Fp2 coords, blk | N."""
    L, _, N = p1[0].shape
    grid = (N // blk,)
    cspec = pl.BlockSpec((L, 7 * blk), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, 2, blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    flops_est = 13 * 4 * 4 * L * L * N
    return pl.pallas_call(
        _add_mixed_g2_kernel(spec, nr, blk),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, 2, N), jnp.uint32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[cspec] + [bspec] * 5,
        out_specs=(bspec, bspec, bspec),
        cost_estimate=pl.CostEstimate(
            flops=flops_est, bytes_accessed=16 * L * N * 4, transcendentals=0
        ),
    )(jnp.asarray(_consts_g2_np(spec, nr, b3_val, blk)), *p1, *xy2)


def add_g2_pallas(spec: FpSpec, nr: int, b3_val, p1, p2, blk: int):
    """Fused G2 addition on [L, 2, N] coords, blk | N; coords < 2p in,
    < 2p exact out."""
    L, _, N = p1[0].shape
    grid = (N // blk,)
    cspec = pl.BlockSpec((L, 7 * blk), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((L, 2, blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    flops_est = 14 * 4 * 4 * L * L * N
    out = pl.pallas_call(
        _add_g2_kernel(spec, nr, blk),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, 2, N), jnp.uint32) for _ in range(3)
        ),
        grid=grid,
        in_specs=[cspec] + [bspec] * 6,
        out_specs=(bspec, bspec, bspec),
        cost_estimate=pl.CostEstimate(
            flops=flops_est, bytes_accessed=18 * L * N * 4, transcendentals=0
        ),
    )(jnp.asarray(_consts_g2_np(spec, nr, b3_val, blk)), *p1, *p2)
    return out
