"""Grid-carried Pallas suffix-scan kernel for MSM bucket accumulation.

Replaces the fori_loop + per-step-capture realization in msm/scans.py
(scan_storage_mixed_capture) on the TPU backend.  One pallas_call runs
the whole within-chunk suffix scan: the [blk]-wide projective
accumulator lives in VMEM scratch and persists across the sequential
grid steps (TPU grids execute in order, innermost dimension fastest), so
there is no per-step HBM round-trip of the accumulator and no per-step
XLA glue (dynamic_slice / capture gather / select).  The kernel writes

  * the FULL within-chunk inclusive suffix values ("prefix") in
    element-major rows [R, K*C, 3L] — X||Y||Z limbs contiguous per
    element — so the B-1 bucket-boundary values are ONE fast row-gather
    afterwards (element-major row gathers run ~10x faster than
    limb-major column gathers on TPU; measured round 4), and
  * the chunk totals [L, R, C] in limb-major for the cross pass.

Math per step: the complete RCB mixed (projective + affine) addition —
bit-identical to curves/pallas_point.py:add_mixed_g1_pallas (the bodies
are literally shared, see mixed_add_g1_math).  Affine infinity is
encoded (0, 0); the projective identity is (0, 1, 0).

Reference analog: the bucket-accumulation inner loop of
`ark-ec::VariableBaseMSM::msm_bigint` (SURVEY.md §2.2 "Variable-base
MSM"; consumed at /root/reference/src/prover.rs:66,74,262).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groth16_tpu.curves.pallas_point import (
    _cond_sub_m,
    _ksub,
    _reduce_chain,
    _small_chain,
    mixed_add_g1_math,
)
from groth16_tpu.fields.pallas_fp import cios
from groth16_tpu.fields.spec import FpSpec, int_to_limbs


def _pick_blk(C: int, cap: int = 1024) -> int:
    blk = min(C, cap)
    while C % blk:
        blk -= 1
    return blk


@functools.lru_cache(maxsize=None)
def _consts5_np(spec: FpSpec, b3_val: int, blk: int) -> np.ndarray:
    """[L, 5*blk] planes: p, 2p, 4p, b3_mont, one_mont."""
    L = spec.n_limbs
    cols = [
        int_to_limbs(spec.modulus, L),
        int_to_limbs(2 * spec.modulus, L),
        int_to_limbs(4 * spec.modulus, L),
        int_to_limbs(spec.to_mont_int(b3_val % spec.modulus), L),
        int_to_limbs(spec.to_mont_int(1), L),
    ]
    arr = np.array(cols, np.uint32)
    return np.concatenate(
        [np.broadcast_to(c[:, None], (L, blk)) for c in arr], axis=1
    ).copy()


@functools.lru_cache(maxsize=None)
def _scan_kernel_g1(spec: FpSpec, K: int, blk: int):
    L = spec.n_limbs
    n0 = int(spec.n0inv)

    def kernel(c_ref, in_ref, pre_ref, tx_ref, ty_ref, tz_ref,
               ax, ay, az):
        gk = pl.program_id(2)
        p_c = c_ref[:, 0 * blk : 1 * blk]
        twop = c_ref[:, 1 * blk : 2 * blk]
        fourp = c_ref[:, 2 * blk : 3 * blk]
        b3 = c_ref[:, 3 * blk : 4 * blk]
        one = c_ref[:, 4 * blk : 5 * blk]
        zero = one ^ one

        @pl.when(gk == 0)
        def _():
            ax[...] = zero
            ay[...] = one
            az[...] = zero

        xy = in_ref[0].T  # [blk, 2L] -> [2L, blk]
        # signed-digit negation in VMEM: the sorted sign bit rides in
        # BIT 31 of x's limb 0 (limbs are 15-bit, the high bits of the
        # gathered rows are free — no extra input plane, no extra HBM).
        # y -> 2p - y where set; infinity rows keep the (0, 0) sentinel
        # (2p - y of a real point is never 0, and y = 0 rows are
        # excluded by the inf2 guard).
        sgn = xy[:1] >> 31  # [1, blk]
        x2 = jnp.concatenate(
            [xy[:1] & jnp.uint32(0x7FFFFFFF), xy[1:L]], axis=0
        )
        y2 = xy[L:]
        inf2 = jnp.all(y2 == 0, axis=0, keepdims=True)
        negy = _ksub(twop, y2, zero, L)
        y2 = jnp.where((sgn != 0) & jnp.logical_not(inf2), negy, y2)
        X3, Y3, Z3 = mixed_add_g1_math(
            p_c, twop, fourp, b3,
            (ax[...], ay[...], az[...]),
            (x2, y2),
            n0, L,
        )
        ax[...] = X3
        ay[...] = Y3
        az[...] = Z3
        pre_ref[0] = jnp.concatenate([X3, Y3, Z3], axis=0).T  # [blk, 3L]
        tx_ref[...] = X3
        ty_ref[...] = Y3
        tz_ref[...] = Z3

    return kernel


def suffix_scan_g1_rows(spec: FpSpec, b3_val: int, rows: jnp.ndarray,
                        K: int, C: int, blk: int | None = None):
    """Within-chunk suffix scan over gathered affine G1 rows.

    rows: uint32[R, K*C, 2L] element-major x||y limb rows in step-major
    storage (storage index k*C + c holds step k of chunk c); affine
    infinity encoded (0, 0); the signed-digit sign bit rides in bit 31
    of x's limb 0 (the kernel negates y in VMEM — a second y-negated
    row plane would pay the 128-lane HBM padding twice).  Returns
      prefix: uint32[R, K*C, 3L] — X||Y||Z at (k, c) = suffix sum of
              steps k..K-1 of chunk c (inclusive), element-major;
      totals: (X, Y, Z) each uint32[L, R, C] — full chunk sums,
              limb-major (= prefix at k = 0).
    """
    L = spec.n_limbs
    R, KC, twoL = rows.shape
    assert KC == K * C and twoL == 2 * L
    blk = blk or _pick_blk(C)
    assert C % blk == 0
    grid = (R, C // blk, K)
    consts = jnp.asarray(_consts5_np(spec, b3_val, blk))
    flops = 13 * 4 * L * L * R * KC
    out_shapes = (
        jax.ShapeDtypeStruct((R, KC, 3 * L), jnp.uint32),
        jax.ShapeDtypeStruct((L, R * C), jnp.uint32),
        jax.ShapeDtypeStruct((L, R * C), jnp.uint32),
        jax.ShapeDtypeStruct((L, R * C), jnp.uint32),
    )
    CB = C // blk
    tot_spec = pl.BlockSpec(
        (L, blk), lambda r, cb, gk: (0, r * CB + cb), memory_space=pltpu.VMEM
    )
    prefix, tx, ty, tz = pl.pallas_call(
        _scan_kernel_g1(spec, K, blk),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 5 * blk), lambda r, cb, gk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, blk, 2 * L),
                lambda r, cb, gk: (r, (K - 1 - gk) * (C // blk) + cb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, blk, 3 * L),
                lambda r, cb, gk: (r, (K - 1 - gk) * (C // blk) + cb, 0),
                memory_space=pltpu.VMEM,
            ),
            tot_spec, tot_spec, tot_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM((L, blk), jnp.uint32),
            pltpu.VMEM((L, blk), jnp.uint32),
            pltpu.VMEM((L, blk), jnp.uint32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 + 3 + 3) * L * R * KC * 4,
            transcendentals=0,
        ),
    )(consts, rows)
    tx, ty, tz = (t.reshape(L, R, C) for t in (tx, ty, tz))
    return prefix, (tx, ty, tz)


# -- G2 (Fp2 coordinates) -------------------------------------------------------


def mixed_add_g2_math(consts, nr: int, P1, XY2, n0: int, L: int):
    """Projective + affine RCB complete addition body over Fq2
    (Z2 = 1), shared with curves/pallas_point.py:_add_mixed_g2_kernel —
    13 Fp2 multiplies, affine infinity encoded Y2 = (0, 0).

    consts: dict with 'p','2p','4p','8p','nr2p' [L, blk] planes and
    b3 = (b3c0, b3c1).  Coordinates are (c0, c1) pairs of [L, blk]."""
    p_c, twop, fourp = consts["p"], consts["2p"], consts["4p"]
    nr2p = consts["nr2p"]
    rc = {"2p": twop, "4p": fourp, "8p": consts["8p"]}
    b3 = consts["b3"]
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
        c0 = _reduce_chain(c0, 2 + 2 * abs(nr), rc, L)
        c1 = _cond_sub_m(v01 + v10, twop, L)
        return (c0, c1)

    def f2add(a, b):
        return (a[0] + b[0], a[1] + b[1])

    def f2ksub(a, b, kp):
        return (_ksub(a[0], b[0], kp, L), _ksub(a[1], b[1], kp, L))

    X1, Y1, Z1 = P1
    X2, Y2 = XY2
    inf2 = jnp.all((Y2[0] | Y2[1]) == 0, axis=0, keepdims=True)

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

    def fin(v, keep):
        return (
            jnp.where(inf2, keep[0], _cond_sub_m(v[0], twop, L)),
            jnp.where(inf2, keep[1], _cond_sub_m(v[1], twop, L)),
        )

    return fin(X3, X1), fin(Y3, Y1), fin(Z3, Z1)


@functools.lru_cache(maxsize=None)
def _consts_g2_np(spec: FpSpec, nr: int, b3_val, blk: int) -> np.ndarray:
    """[L, 8*blk] planes: p, 2p, 4p, 8p, 2|nr|p, b3c0, b3c1, one."""
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
        int_to_limbs(spec.to_mont_int(1), L),
    ]
    arr = np.array(cols, np.uint32)
    return np.concatenate(
        [np.broadcast_to(c[:, None], (L, blk)) for c in arr], axis=1
    ).copy()


@functools.lru_cache(maxsize=None)
def _scan_kernel_g2(spec: FpSpec, nr: int, K: int, blk: int):
    L = spec.n_limbs
    n0 = int(spec.n0inv)

    def kernel(c_ref, in_ref, pre_ref, t_refs0, t_refs1, t_refs2,
               t_refs3, t_refs4, t_refs5, ax0, ax1, ay0, ay1, az0, az1):
        gk = pl.program_id(2)
        cc = lambda i: c_ref[:, i * blk : (i + 1) * blk]
        consts = {
            "p": cc(0), "2p": cc(1), "4p": cc(2), "8p": cc(3),
            "nr2p": cc(4), "b3": (cc(5), cc(6)),
        }
        one = cc(7)
        zero = one ^ one

        @pl.when(gk == 0)
        def _():
            ax0[...] = zero
            ax1[...] = zero
            ay0[...] = one
            ay1[...] = zero
            az0[...] = zero
            az1[...] = zero

        # rows: x0||x1||y0||y1 limbs (tower component major within coord)
        xy = in_ref[0].T  # [4L, blk]
        # signed-digit negation in VMEM: sign bit rides in bit 31 of
        # x0's limb 0.  y -> 2p - y componentwise when set — a zero
        # component becomes the value 2p (still a legal < 8p mul input;
        # the add body's products with Y2 stay inside the overflow
        # ledger), and the (0, 0) infinity sentinel is preserved via
        # the inf2 guard.
        sgn = xy[:1] >> 31  # [1, blk]
        x0 = jnp.concatenate(
            [xy[:1] & jnp.uint32(0x7FFFFFFF), xy[1:L]], axis=0
        )
        y0, y1 = xy[2 * L : 3 * L], xy[3 * L :]
        inf2 = jnp.all((y0 | y1) == 0, axis=0, keepdims=True)
        neg = (sgn != 0) & jnp.logical_not(inf2)
        twop = consts["2p"]
        y0 = jnp.where(neg, _ksub(twop, y0, zero, L), y0)
        y1 = jnp.where(neg, _ksub(twop, y1, zero, L), y1)
        P1 = (
            (ax0[...], ax1[...]),
            (ay0[...], ay1[...]),
            (az0[...], az1[...]),
        )
        XY2 = ((x0, xy[L : 2 * L]), (y0, y1))
        X3, Y3, Z3 = mixed_add_g2_math(consts, nr, P1, XY2, n0, L)
        ax0[...], ax1[...] = X3
        ay0[...], ay1[...] = Y3
        az0[...], az1[...] = Z3
        pre_ref[0] = jnp.concatenate(
            [X3[0], X3[1], Y3[0], Y3[1], Z3[0], Z3[1]], axis=0
        ).T  # [blk, 6L]
        for ref, v in zip(
            (t_refs0, t_refs1, t_refs2, t_refs3, t_refs4, t_refs5),
            (X3[0], X3[1], Y3[0], Y3[1], Z3[0], Z3[1]),
        ):
            ref[...] = v

    return kernel


def suffix_scan_g2_rows(spec: FpSpec, nr: int, b3_val, rows: jnp.ndarray,
                        K: int, C: int, blk: int | None = None):
    """G2 (Fp2) analog of suffix_scan_g1_rows.

    rows: uint32[R, K*C, 4L] element-major x0||x1||y0||y1 rows; affine
    infinity encoded y = (0, 0); the signed-digit sign bit rides in
    bit 31 of x0's limb 0 (y negated in VMEM).  Returns
      prefix: uint32[R, K*C, 6L] (X0||X1||Y0||Y1||Z0||Z1);
      totals: (X, Y, Z) with each coord a [L, 2, R, C] limb tensor.
    """
    L = spec.n_limbs
    R, KC, fourL = rows.shape
    assert KC == K * C and fourL == 4 * L
    blk = blk or _pick_blk(C)
    assert C % blk == 0
    grid = (R, C // blk, K)
    consts = jnp.asarray(_consts_g2_np(spec, nr, b3_val, blk))
    out_shapes = (jax.ShapeDtypeStruct((R, KC, 6 * L), jnp.uint32),) + tuple(
        jax.ShapeDtypeStruct((L, R * C), jnp.uint32) for _ in range(6)
    )
    CB = C // blk
    tot_spec = pl.BlockSpec(
        (L, blk), lambda r, cb, gk: (0, r * CB + cb), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _scan_kernel_g2(spec, nr, K, blk),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8 * blk), lambda r, cb, gk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, blk, 4 * L),
                lambda r, cb, gk: (r, (K - 1 - gk) * (C // blk) + cb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, blk, 6 * L),
                lambda r, cb, gk: (r, (K - 1 - gk) * (C // blk) + cb, 0),
                memory_space=pltpu.VMEM,
            ),
        ) + (tot_spec,) * 6,
        scratch_shapes=[pltpu.VMEM((L, blk), jnp.uint32) for _ in range(6)],
        cost_estimate=pl.CostEstimate(
            flops=13 * 4 * 4 * L * L * R * KC,
            bytes_accessed=(4 + 6 + 6) * L * R * KC * 4,
            transcendentals=0,
        ),
    )(consts, rows)
    prefix = out[0]
    x0, x1, y0, y1, z0, z1 = (t.reshape(L, R, C) for t in out[1:])
    stk = lambda a, b: jnp.stack([a, b], axis=1)  # [L, 2, R, C]
    return prefix, (stk(x0, x1), stk(y0, y1), stk(z0, z1))
