"""Communication backend: the named collective layer over ICI/DCN.

SURVEY.md §2.4 ("par/collectives.py") and §5.8: the reference's only
communication story is rayon shared memory (/root/reference/Cargo.toml:30,47
via the cfg_iter! sites in src/r1cs_to_qap.rs:11-12); the TPU-native
equivalent is this thin, *named* wrapper over XLA collectives used inside
`shard_map` bodies.  Keeping the patterns in one module makes the comm
structure of the sharded prover auditable:

  - `transpose_a2a`      — all_to_all block transpose (the four-step NTT's
                           only communication; par/ntt_cp.py steps 1/4/5)
  - `gather_tree_reduce` — all_gather of per-shard partials + log2(S)
                           halving combine under a point-add monoid (the
                           sharded Pippenger window/lane reduction,
                           par/prover_dp.py; psum's analog for group
                           elements, which have no hardware add)
  - `psum_field`         — lazy-limb field-vector psum: u32 limb sum over
                           the axis + one value reduction (bounded fan-in)
  - `ring_shift`         — ppermute ring step (elastic re-balancing,
                           par/elastic.py's shard migration)

All helpers are shape-polymorphic over the limb-major layout
(uint32[L, ..., n]) and safe on CPU meshes (tests/test_collectives.py on
the 8-virtual-device mesh, SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec


def transpose_a2a(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Global [L, R, C] (R sharded on `axis`) -> [L, C, R] (C sharded):
    one tiled all_to_all + a local row transpose.  Local view:
    [L, R/S, C] -> [L, C/S, R]."""
    y = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)
    return jnp.swapaxes(y, 1, 2)


def gather_tree_reduce(add_fn, leaves, axis: str):
    """all_gather each leaf's per-shard partial to a trailing batch axis,
    then combine the S partials with log2(S) halving `add_fn` steps.

    add_fn(a, b): leafwise monoid (e.g. CurveDevice.add over point
    tuples).  leaves: tuple of arrays (one partial per shard, any shape).
    Returns the reduced leaves (replicated across the axis).
    """
    red = tuple(jax.lax.all_gather(x, axis, axis=x.ndim) for x in leaves)
    m = red[0].shape[-1]
    while m > 1:
        h = m // 2
        red = add_fn(
            tuple(x[..., :h] for x in red),
            tuple(x[..., h:m] for x in red),
        )
        m = h
    return tuple(x[..., 0] for x in red)


def psum_field(spec: FpSpec, x: jnp.ndarray, axis: str, size: int) -> jnp.ndarray:
    """Field-vector psum over a mesh axis: u32 limb-wise psum then one
    lazy-digit value reduction.  `size` = static mesh-axis size S.  Safe
    for S <= 128: S inputs < 2p sum to < 2Sp <= 2^8 * p, and the 15-bit
    lazy digits (< 2^16) sum limb-wise to < S * 2^16 <= 2^23, well inside
    u32."""
    s = jax.lax.psum(x, axis)
    return fp.reduce_to_2p(spec, s, bound_k=2 * size)


def ring_shift(x: jnp.ndarray, axis: str, size: int, offset: int = 1) -> jnp.ndarray:
    """ppermute ring step: shard i's block moves to shard (i+offset) % S
    (point/scalar re-balancing when the mesh shrinks, par/elastic.py).
    `size` = static mesh-axis size S."""
    perm = [(i, (i + offset) % size) for i in range(size)]
    return jax.lax.ppermute(x, axis, perm)
