"""Fixed-base batch scalar multiplication on device (the setup hot loop).

TPU-native re-design of `ark-ec::scalar_mul::BatchMulPreprocessing`
(SURVEY.md §2.2 "Fixed-base batch mul"; reference call sites
/root/reference/src/generator.rs:129-183): a shared window table of the
base point, then per-scalar table lookups.

Table build: row w is the inclusive prefix scan of B copies of
base_w = 2^{cw} * base (chunked scan, msm/scans.py), and the next row's
base falls out as the scan's last element (B * base_w = 2^c * base_w).
The window loop is a `lax.scan`, so the graph holds O(1) point-adds.

batch_mul is embarrassingly parallel: one `lax.scan` over windows, each
step a [N]-wide gather from the table row + one vector point-add (digit 0
gathers the infinity slot — no special cases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from groth16_tpu.curves.point import CurveDevice, Point
from groth16_tpu.msm.pippenger import all_window_digits
from groth16_tpu.msm.scans import scan_points


def build_window_table(
    g: CurveDevice, base: Point, c: int, num_windows: int
) -> Point:
    """Table[w, d] = d * 2^{cw} * base, shape [num_windows, 2^c].

    base: single Jacobian point (batch shape ()).
    """
    B = 1 << c

    def wstep(base_w: Point, _):
        reps = tuple(
            jnp.broadcast_to(x[..., None], x.shape + (B,)) for x in base_w
        )
        scan = scan_points(g, reps)  # [B]: 1*b .. B*b
        inf = g.infinity((1,))
        row = tuple(
            jnp.concatenate([z, s[..., :-1]], axis=-1)
            for z, s in zip(inf, scan)
        )
        next_base = g.index(scan, B - 1)  # B * base_w = 2^c * base_w
        return next_base, row

    _, rows = jax.lax.scan(wstep, base, None, length=num_windows)
    return rows


def batch_mul_device(
    g: CurveDevice,
    table: Point,
    scalars: jnp.ndarray,
    c: int,
    scalar_bits: int,
) -> Point:
    """[s * base for s in scalars] using a prebuilt window table.

    scalars: uint32[Ls, N] standard-form 15-bit limbs.  Returns [N]
    projective points (convert with g.to_affine for affine queries).
    """
    num_windows = table[2].shape[0]
    digits_all = all_window_digits(scalars, c, scalar_bits)
    assert digits_all.shape[0] == num_windows, (
        digits_all.shape, num_windows)
    n = scalars.shape[-1]

    def wstep(acc: Point, xs):
        digits_w, row = xs
        looked = g.index(row, digits_w.astype(jnp.int32))
        return g.add(acc, looked), None

    acc, _ = jax.lax.scan(wstep, g.infinity((n,)), (digits_all, table))
    return acc
