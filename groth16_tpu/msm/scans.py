"""Compile-friendly parallel scans/reductions over point batches.

The naive choice (`jax.lax.associative_scan`) unrolls ~2*log2(N) combiner
calls into the graph; with a branchless Jacobian add weighing ~10^4
primitives that explodes compile time.  These helpers keep the traced
graph at O(1) point-ops by pushing repetition into `lax.scan` /
`lax.fori_loop`, while keeping total work ~N:

  - within-chunk pass: reshape [N] -> [K, C] and `lax.scan` along K
    (K sequential steps, each a C-wide vector add; work N, graph 1 add)
  - cross-chunk pass: Hillis-Steele over the C chunk totals inside a
    `fori_loop` with traced roll distances (work C*log2(C), graph 1 add)

Chunk count C is capped so the cross pass stays o(N).  All helpers
operate on (X, Y, Z) point pytrees via a CurveDevice `g`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from groth16_tpu.curves.point import CurveDevice, Point


def ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length()) if n > 1 else 0


def _roll(pt: Point, shift, axis=0) -> Point:
    return tuple(jnp.roll(x, shift, axis=axis) for x in pt)


def hs_scan(g: CurveDevice, pts: Point, reverse: bool = False) -> Point:
    """Inclusive Hillis-Steele scan over axis 0 of a [C] point batch.

    Graph: one point-add; work: C * ceil(log2(C)) adds.
    """
    C = pts[2].shape[0]
    if C == 1:
        return pts
    steps = ceil_log2(C)
    pos = jnp.arange(C, dtype=jnp.int32)

    def body(k, buf):
        s = jnp.int32(1) << k
        if reverse:
            shifted = _roll(buf, -s)
            valid = pos + s < C
        else:
            shifted = _roll(buf, s)
            valid = pos >= s
        shifted = g.select(valid, shifted, g.infinity((C,)))
        return g.add(buf, shifted)

    return jax.lax.fori_loop(0, steps, body, pts)


def _pick_chunks(N: int, max_chunks: int) -> int:
    """Chunk count balancing the K-step within pass (work N) against the
    Hillis-Steele cross pass (work C*log2(C) — keep it o(N))."""
    C = min(max_chunks, max(8, N // 8))
    while N % C:
        C -= 1
    return C


def chunk_scan_parts(
    g: CurveDevice, pts: Point, reverse: bool = False, max_chunks: int = 4096
) -> Tuple[Point, Point, int]:
    """Two-level inclusive scan decomposition of a [N] point batch.

    Returns (within [K, C], cross_excl [C], K) with N = K*C such that
      scan(pts)[j] = within[j % K_pos, j // K] + cross_excl[j // K]
    where within[k, c] is the inclusive scan restricted to chunk c and
    cross_excl[c] is the total of all chunks strictly before (after, if
    reverse) chunk c.  Caller must pad N to a multiple of the chunk size
    (identity = infinity for sums).

    Layout: element j lives at within[j % K, j // K] — chunks are
    strided so each scan step is a contiguous C-wide row.
    """
    N = pts[2].shape[0]
    C = _pick_chunks(N, max_chunks)
    K = N // C
    # row-major [K, C]: element j -> (j % K? ) — use j = k*C + c ordering:
    # chunk c owns elements {c, C + c, 2C + c, ...}?  Simpler: contiguous
    # chunks along K axis after a transpose-free reshape [C, K] -> move
    # scan axis first.  We reshape to [C, K] (chunk-major) then scan along
    # axis-1 via moveaxis -> [K, C].
    re = tuple(
        jnp.moveaxis(x.reshape((C, K) + x.shape[1:]), 1, 0) for x in pts
    )  # [K, C, ...]; chunk c = original slice [c*K, (c+1)*K)

    def step(carry, row):
        acc = g.add(carry, row)
        return acc, acc

    totals, within = jax.lax.scan(step, g.infinity((C,)), re, reverse=reverse)
    cross_incl = hs_scan(g, totals, reverse=reverse)
    # exclusive shift
    if reverse:
        cross_excl = _roll(cross_incl, -1)
        mask = jnp.arange(C) < C - 1
    else:
        cross_excl = _roll(cross_incl, 1)
        mask = jnp.arange(C) >= 1
    cross_excl = g.select(mask, cross_excl, g.infinity((C,)))
    return within, cross_excl, K


def scan_points(g: CurveDevice, pts: Point, reverse: bool = False) -> Point:
    """Full inclusive scan (used by the fixed-base table build)."""
    N = pts[2].shape[0]
    within, cross_excl, K = chunk_scan_parts(g, pts, reverse=reverse)
    C = N // K
    out = g.add(within, tuple(jnp.broadcast_to(x, w.shape) for x, w in
                              zip(cross_excl, within)))
    # [K, C] with element j at [j % K? ] — invert the packing: chunk c =
    # original slice [c*K, (c+1)*K), position k within it.
    return tuple(jnp.moveaxis(x, 0, 1).reshape((N,) + x.shape[2:]) for x in out)


def reduce_points(g: CurveDevice, pts: Point) -> Point:
    """Sum a [N] point batch to a single point.  Graph: 2 point-adds;
    work: N + 64*log2(64) (the tiny tail reduced by Hillis-Steele)."""
    N = pts[2].shape[0]
    C = min(64, N)
    while N % C:
        C -= 1
    K = N // C
    re = tuple(x.reshape((K, C) + x.shape[1:]) for x in pts)

    def step(carry, row):
        return g.add(carry, row), None

    acc, _ = jax.lax.scan(step, g.infinity((C,)), re)
    full = hs_scan(g, acc, reverse=True)
    return g.index(full, 0)
