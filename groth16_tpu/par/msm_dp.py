"""Sharded variable-base MSM: data parallelism over points (SURVEY.md §2.4).

MSM is a sum over (point, scalar) pairs, so the multi-chip decomposition
is embarrassingly parallel: shard bases+scalars on axis 0, run the full
local Pippenger per shard (msm/pippenger.py), then combine the S partial
results — an `all_gather` of S Jacobian points over ICI followed by a
log2(S) tree reduction, all inside one `shard_map`.

This replaces the reference's rayon-parallel bucket loop
(`ark-ec` internals behind /root/reference/src/prover.rs:66,74,262) with
mesh-level data parallelism; there is no NCCL analog to manage — GSPMD
places the collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from groth16_tpu.curves.point import CurveDevice, Point
from groth16_tpu.msm.pippenger import msm_device
from groth16_tpu.par.mesh import DATA_AXIS


def msm_sharded(
    g: CurveDevice,
    points: Point,
    scalars: jnp.ndarray,
    scalar_bits: int,
    mesh,
    axis: str = DATA_AXIS,
    window_bits: int | None = None,
) -> Point:
    """MSM over a mesh axis; returns the (replicated) Jacobian sum.

    points/scalars must have leading dim divisible by the mesh axis size
    (pad with infinity / zero scalars on the host if needed).
    """
    n = scalars.shape[0]
    S = mesh.shape[axis]
    assert n % S == 0, f"pad N={n} to a multiple of mesh axis {S}"

    def local(pts_shard, sc_shard):
        acc = msm_device(g, pts_shard, sc_shard, scalar_bits, window_bits)
        # [S] partials over the axis, reduced redundantly on every device
        gathered = tuple(
            jax.lax.all_gather(x, axis, axis=0) for x in acc
        )
        return g.tree_reduce(gathered)

    spec_pt = tuple(P(axis) for _ in range(3))
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_pt, P(axis)),
        out_specs=tuple(P() for _ in range(3)),
        check_vma=False,
    )
    return fn(points, scalars)
