"""Compile-friendly parallel scans/reductions over point batches.

The naive choice (`jax.lax.associative_scan`) unrolls ~2*log2(N) combiner
calls into the graph; with a point add weighing ~10^3 primitives that
explodes compile time.  These helpers keep the traced graph at O(1)
point-ops by pushing repetition into `lax.scan` / `lax.fori_loop`, while
keeping total work ~N:

  - within-chunk pass: view the [N] element axis as [C, K] and `lax.scan`
    along K (K sequential steps, each a C-wide vector add; work N,
    graph 1 add)
  - cross-chunk pass: Hillis-Steele over the C chunk totals inside a
    `fori_loop` with traced roll distances (work C*log2(C), graph 1 add)

Chunk count C is capped so the cross pass stays o(N).  All helpers
operate on (X, Y, Z) point pytrees via a CurveDevice `g`; per the engine
convention (fields/fp.py) coordinate axes LEAD and the element axis is
the TRAILING axis of every leaf.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from groth16_tpu.curves.point import CurveDevice, Point


def ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length()) if n > 1 else 0


def _roll(pt: Point, shift) -> Point:
    return tuple(jnp.roll(x, shift, axis=-1) for x in pt)


def hs_scan(g: CurveDevice, pts: Point, reverse: bool = False) -> Point:
    """Inclusive Hillis-Steele scan over the element axis of a [C] batch.

    Graph: one point-add; work: C * ceil(log2(C)) adds.
    """
    C = pts[2].shape[-1]
    if C == 1:
        return pts
    steps = ceil_log2(C)
    pos = jnp.arange(C, dtype=jnp.int32)
    inf = g.infinity(g.batch_shape(pts))

    def body(k, buf):
        s = jnp.int32(1) << k
        if reverse:
            shifted = _roll(buf, -s)
            valid = pos + s < C
        else:
            shifted = _roll(buf, s)
            valid = pos >= s
        shifted = g.select(valid, shifted, inf)
        return g.add(buf, shifted)

    return jax.lax.fori_loop(0, steps, body, pts)


def _pick_chunks(N: int, max_chunks: int) -> int:
    """Chunk count balancing the K-step within pass (work N) against the
    Hillis-Steele cross pass (work C*log2(C) — keep it o(N))."""
    C = min(max_chunks, max(8, N // 8))
    while N % C:
        C -= 1
    return C


def _rows(x: jnp.ndarray, C: int, K: int) -> jnp.ndarray:
    """[.., N] -> [K, .., C]: view the element axis as chunks [C, K]
    (chunk c = elements [c*K, (c+1)*K)) and move the scan axis first for
    lax.scan consumption."""
    return jnp.moveaxis(x.reshape(x.shape[:-1] + (C, K)), -1, 0)


def chunk_scan_parts(
    g: CurveDevice, pts: Point, reverse: bool = False, max_chunks: int = 4096
) -> Tuple[Point, Point, int]:
    """Two-level inclusive scan decomposition of an [N] point batch.

    Returns (within [.., C, K], cross_excl [.., C], K) with N = K*C such
    that  scan(pts)[j] = within[.., j // K, j % K] + cross_excl[.., j // K]
    where within[.., c, k] is the inclusive scan restricted to chunk c and
    cross_excl[.., c] is the total of all chunks strictly before (after,
    if reverse) chunk c.  Caller must pad N to a multiple of the chunk
    size (identity = infinity for sums).
    """
    N = pts[2].shape[-1]
    C = _pick_chunks(N, max_chunks)
    K = N // C
    lead = g.batch_shape(pts)[:-1]  # extra leading batch dims ride along

    re = tuple(_rows(x, C, K) for x in pts)  # [K, coords.., C]

    def step(carry, row):
        acc = g.add(carry, row)
        return acc, acc

    totals, within = jax.lax.scan(
        step, g.infinity(lead + (C,)), re, reverse=reverse
    )
    within = tuple(jnp.moveaxis(x, 0, -1) for x in within)  # [coords.., C, K]
    if C > 512:
        # recurse: a Hillis-Steele over thousands of chunks costs
        # log2(C) FULL-width steps; a second two-level scan does it in
        # ~K2 + log2(C2) narrow steps
        cross_incl = scan_points(g, totals, reverse=reverse, max_chunks=512)
    else:
        cross_incl = hs_scan(g, totals, reverse=reverse)
    # exclusive shift
    if reverse:
        cross_excl = _roll(cross_incl, -1)
        mask = jnp.arange(C) < C - 1
    else:
        cross_excl = _roll(cross_incl, 1)
        mask = jnp.arange(C) >= 1
    cross_excl = g.select(mask, cross_excl, g.infinity(lead + (C,)))
    return within, cross_excl, K


def scan_points(
    g: CurveDevice, pts: Point, reverse: bool = False, max_chunks: int = 4096
) -> Point:
    """Full inclusive scan (used by the fixed-base table build and as
    the recursive cross pass of chunk_scan_parts)."""
    N = pts[2].shape[-1]
    within, cross_excl, K = chunk_scan_parts(
        g, pts, reverse=reverse, max_chunks=max_chunks
    )
    C = N // K
    out = g.add(within, tuple(x[..., None] for x in cross_excl))
    # [.., C, K] -> [.., N] with element j = c*K + k
    return tuple(x.reshape(x.shape[:-2] + (N,)) for x in out)


def scan_storage_mixed_capture(g: CurveDevice, xy_T, K: int, C: int,
                               jk: jnp.ndarray, jc: jnp.ndarray,
                               reverse: bool = False):
    """Within-chunk inclusive scan in STEP-MAJOR storage over AFFINE
    rows (infinity encoded (0, 0)), CAPTURING only T requested positions.

    xy_T leaves: [.., N] with N = K*C where storage index k*C + c holds
    position k of chunk c (the caller composes this transpose into its
    gather indices, so no bulk data transpose ever materializes).  Step k
    is one CONTIGUOUS C-wide slice of a projective+affine complete add
    (13 muls, no Z2 plane in HBM); lax.scan's leading-axis requirement
    (which forces a full-data transpose) is avoided via fori_loop +
    dynamic slices.

    jk/jc: int32[*lead, T] — capture target t wants the inclusive scan
    value of chunk jc[t] at within-chunk position jk[t] (for the MSM
    these are the searchsorted bucket boundaries, known BEFORE the scan).
    Capturing in-flight replaces materializing all N projective prefix
    values in HBM and gathering T of them afterwards.  The win is HBM
    CAPACITY (no N-sized projective prefix buffer, which is what lets
    window groups grow), not necessarily traffic: the per-step gather +
    select touches ~3 coords x T on each of the K steps (~3·K·T total),
    which can exceed the old 3·N prefix store when T = B-1 >= C (wide
    windows, c >= 13 at 4096 chunks).

    Returns (captured [.., T] projective, chunk totals [.., C]).
    """
    x_T, y_T = xy_T
    cd = g.k.coord_ndim
    lead = x_T.shape[cd:-1]
    T = jk.shape[-1]
    lead_iotas = tuple(
        jnp.broadcast_to(
            jnp.arange(d, dtype=jnp.int32).reshape(
                (1,) * i + (d,) + (1,) * (len(lead) - i)
            ),
            lead + (T,),
        )
        for i, d in enumerate(lead)
    )
    jk = jk.astype(jnp.int32)
    jc = jc.astype(jnp.int32)

    def body(i, carry):
        acc, cap = carry
        k = K - 1 - i if reverse else i
        start = k * C
        row = tuple(
            jax.lax.dynamic_slice_in_dim(x, start, C, axis=-1)
            for x in (x_T, y_T)
        )
        acc = g.add_affine(acc, row)
        # capture acc[.., jc[t]] where jk[t] == k (inclusive: after add)
        acc_at = tuple(x[(Ellipsis,) + lead_iotas + (jc,)] for x in acc)
        cap = g.select(jk == k, acc_at, cap)
        return (acc, cap)

    init = (g.infinity(lead + (C,)), g.infinity(lead + (T,)))
    acc, cap = jax.lax.fori_loop(0, K, body, init)
    return cap, acc


def reduce_points(g: CurveDevice, pts: Point) -> Point:
    """Sum an [N] point batch to a single point: K contiguous-slice
    accumulation steps to C partials, then recurse (tail reduced by
    Hillis-Steele once small).  Graph: O(1) point-adds per level,
    <= ~3 levels in practice; no data transposes (addition is
    commutative, so slice grouping needs no index mapping)."""
    N = pts[2].shape[-1]
    if N <= 64:
        full = hs_scan(g, pts, reverse=True)
        return g.index(full, 0)
    # aim for ~8 sequential steps per level, chunks capped at 1024
    C = min(1024, max(8, N // 8))
    while N % C:
        C -= 1
    K = N // C
    lead = g.batch_shape(pts)[:-1]

    def body(i, acc):
        row = tuple(
            jax.lax.dynamic_slice_in_dim(x, i * C, C, axis=-1) for x in pts
        )
        return g.add(acc, row)

    acc = jax.lax.fori_loop(0, K, body, g.infinity(lead + (C,)))
    return reduce_points(g, acc)
