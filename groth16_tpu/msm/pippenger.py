"""Variable-base multi-scalar multiplication on device (the prover hot loop).

TPU-native re-design of `ark-ec::VariableBaseMSM::msm_bigint`
(SURVEY.md §2.2 "Variable-base MSM"; reference call sites
/root/reference/src/prover.rs:66,74,262).  The bucket method is recast to
be scatter-free — TPU has no fast scatter — and compile-friendly: every
loop (windows, scan steps, Horner doublings) is a `lax.scan`/`fori_loop`
so the traced graph holds O(1) point-adds regardless of N and window
count.

Per c-bit window w (one `lax.scan` step over a [W, N] digit matrix):
  1. digit_i = bits [cw, cw+c) of scalar_i (standard-form 16-bit limbs).
  2. Sort point indices by digit ascending (u32 key sort + one gather).
  3. Two-level suffix scan (msm/scans.py): within-chunk `lax.scan` +
     Hillis-Steele across chunk totals — ~N vectorized point-adds.
  4. Pippenger identity  sum_d d*S_d = sum_{v=1}^{B-1} G_v  where
     G_v = sum of points with digit >= v = suffix-scan value at
     searchsorted(digits, v): a B-point gather, no scatter, no
     per-bucket extraction.
  5. window_sum = reduce(G_1..G_{B-1}); Horner: res = 2^c * res + w_sum.

The zip-to-shorter-length semantics of arkworks msm_bigint (the h_query
MSM relies on the trailing scalar being dropped — prover.rs:66 vs
generator.rs:167-169) is the caller's responsibility: slice before
calling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from groth16_tpu.curves.point import CurveDevice, Point
from groth16_tpu.fields.spec import LIMB_BITS
from groth16_tpu.msm.scans import chunk_scan_parts, reduce_points


def choose_window_bits(n: int, scalar_bits: int) -> int:
    """Minimize windows*(n + 2*2^c) over c in [4, 16]."""
    best_c, best_cost = 4, None
    for c in range(4, 17):
        windows = -(-scalar_bits // c)
        cost = windows * (n + 2 * (1 << c))
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def window_digits(scalars: jnp.ndarray, c: int, w: int) -> jnp.ndarray:
    """Extract bits [c*w, c*w + c) from uint32[N, Ls] 16-bit-limb scalars."""
    b0 = c * w
    i0, sh = divmod(b0, LIMB_BITS)
    Ls = scalars.shape[-1]
    lo = scalars[..., i0] >> sh if i0 < Ls else jnp.zeros_like(scalars[..., 0])
    if sh + c > LIMB_BITS and i0 + 1 < Ls:
        lo = lo | (scalars[..., i0 + 1] << (LIMB_BITS - sh))
    return lo & jnp.uint32((1 << c) - 1)


def all_window_digits(scalars: jnp.ndarray, c: int, scalar_bits: int) -> jnp.ndarray:
    """[num_windows, N] digit matrix."""
    num_windows = -(-scalar_bits // c)
    return jnp.stack(
        [window_digits(scalars, c, w) for w in range(num_windows)], axis=0
    )


def _pad_size(n: int) -> int:
    if n <= 4096:
        m = 8
        while m < n:
            m <<= 1
        return m
    return -(-n // 4096) * 4096


def msm_device(
    g: CurveDevice,
    points: Point,
    scalars: jnp.ndarray,
    scalar_bits: int,
    window_bits: int | None = None,
) -> Point:
    """MSM(points, scalars) -> single Jacobian point.

    points: (X, Y, Z) batch of N Jacobian points (affine inputs: Z = 1,
    infinity entries Z = 0).  scalars: uint32[N, Ls] standard-form 16-bit
    limbs.  scalar_bits: static bound on scalar bit length.
    """
    n = scalars.shape[0]
    assert points[2].shape[: points[2].ndim - g.k.coord_ndim] == (n,)
    c = window_bits or choose_window_bits(n, scalar_bits)
    num_windows = -(-scalar_bits // c)
    B = 1 << c

    npad = _pad_size(n)
    digits_all = all_window_digits(scalars, c, scalar_bits)
    if npad != n:
        digits_all = jnp.pad(digits_all, ((0, 0), (0, npad - n)))
        inf = g.infinity((npad - n,))
        points = tuple(
            jnp.concatenate([p, i], axis=0) for p, i in zip(points, inf)
        )

    iota = jnp.arange(npad, dtype=jnp.int32)
    v_targets = jnp.arange(1, B, dtype=jnp.uint32)

    def window_sum(digits_w) -> Point:
        sorted_digits, order = jax.lax.sort(
            (digits_w, iota), dimension=0, num_keys=1
        )
        pts = g.index(points, order)
        within, cross_excl, K = chunk_scan_parts(g, pts, reverse=True)
        first_ge = jnp.searchsorted(sorted_digits, v_targets, side="left")
        valid = first_ge < npad
        j = jnp.minimum(first_ge, npad - 1).astype(jnp.int32)
        jk, jc = j % K, j // K
        gv = g.add(
            tuple(x[jk, jc] for x in within),
            g.index(cross_excl, jc),
        )
        gv = g.select(valid, gv, g.infinity((B - 1,)))
        # pad to B (power of two) for the reduction
        gv = tuple(
            jnp.concatenate([x, i], axis=0)
            for x, i in zip(gv, g.infinity((1,)))
        )
        return reduce_points(g, gv)

    def wstep(res, digits_w):
        res = jax.lax.fori_loop(0, c, lambda i, p: g.double(p), res)
        return g.add(res, window_sum(digits_w)), None

    res, _ = jax.lax.scan(wstep, g.infinity(()), digits_all, reverse=True)
    return res
