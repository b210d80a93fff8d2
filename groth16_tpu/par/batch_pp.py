"""Batch / pipeline parallelism over proofs (SURVEY.md §2.4 "batch_pp").

The reference proves one circuit per call in one process; its only
parallelism is rayon inside a single prove (/root/reference/src/prover.rs:16-17).
The TPU-native analog is many proofs of the SAME circuit shape in flight
at once (the 2^24-batch BASELINE config):

  1. `prove_batch_sharded` — the vmapped prover with the BATCH axis
     sharded over the mesh: each device runs the full witness-map ->
     MSM -> assembly pipeline for B/S proofs with ZERO cross-device
     communication (proofs are independent), so scaling is linear by
     construction.  This composes with `par/prover_dp.py` (one big proof
     sharded over devices) as the two extremes of the mesh layout.
  2. `ProofStream` — single-chip software pipelining: up to `depth`
     proofs' device programs are enqueued before the host blocks on the
     oldest result.  JAX's async dispatch queue is the pipeline — host
     encode of proof i+1 and result decode of proof i-1 overlap device
     compute of proof i.

Resumable long batches (checkpoint every k proofs) layer on top in
utils/resume.py.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import encode, make_spec
from groth16_tpu.par.mesh import DATA_AXIS, axis_size
from groth16_tpu.protocol.data_structures import Proof
from groth16_tpu.protocol.prover_tpu import (
    TpuProver,
    _prove_jit,
    decode_proof_arrays,
    scalar_bits_array,
)


def prove_batch_sharded(
    prover: TpuProver,
    assignments: Sequence[Sequence[int]],
    rs: Sequence[int],
    ss: Sequence[int],
    mesh,
    axis: str = DATA_AXIS,
) -> List[Proof]:
    """B proofs, batch axis sharded over `mesh`: one shard_map program
    whose body vmaps the whole single-chip prove over the local B/S
    proofs.  The device proving key is replicated (in_specs P()); only
    the assignments/randomness are sharded.  B must be a multiple of the
    mesh axis size."""
    curve = prover.curve
    c = get_curve(curve)
    fr = prover.fr
    rr = c.r
    nbits = rr.bit_length()
    B = len(assignments)
    S = axis_size(mesh, axis)
    assert B % S == 0, f"batch {B} not divisible by mesh size {S}"
    assert len(rs) == len(ss) == B

    # host-encoded standard-form assignments -> sharded device batch;
    # Montgomery conversion happens inside the jitted program
    z_np = np.stack([
        np.asarray(encode(list(a), fr, mont=False)) for a in assignments
    ])  # [B, L, n]
    shard_b = NamedSharding(mesh, P(axis))
    z_b = jax.device_put(jnp.asarray(z_np), NamedSharding(mesh, P(axis, None, None)))
    r_b = jax.device_put(jnp.stack(
        [scalar_bits_array(r % rr, nbits) for r in rs]), shard_b)
    s_b = jax.device_put(jnp.stack(
        [scalar_bits_array(s % rr, nbits) for s in ss]), shard_b)
    rs_b = jax.device_put(jnp.stack(
        [scalar_bits_array(r * s % rr, nbits) for r, s in zip(rs, ss)]),
        shard_b)

    dpk = prover.dpk
    dpk_specs = jax.tree.map(lambda _: P(), dpk)

    def local(dpk_l, z_l, r_l, s_l, rs_l):
        from groth16_tpu.fields import fp

        def one(z_std, rb, sb, rsb):
            z_mont = fp.to_mont(fr, z_std)
            return _prove_jit.__wrapped__(curve, dpk_l, z_mont, rb, sb, rsb)

        return jax.vmap(one)(z_l, r_l, s_l, rs_l)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(dpk_specs, P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None)),
        out_specs=tuple(P(axis) for _ in range(6)),
        check_vma=False,
    )
    out = jax.jit(fn)(dpk, z_b, r_b, s_b, rs_b)
    out = jax.tree.map(np.asarray, out)
    return [
        decode_proof_arrays(curve, tuple(x[i] for x in out))
        for i in range(B)
    ]


class ProofStream:
    """Software-pipelined proof stream on one chip: keeps up to `depth`
    proofs in flight on the device queue (the PP analog of overlapping
    the witness/NTT/MSM stages of DIFFERENT proofs, SURVEY.md §2.4)."""

    def __init__(self, prover: TpuProver, depth: int = 2):
        assert depth >= 1
        self.prover = prover
        self.depth = depth

    def prove_all(
        self, jobs: Iterable[tuple[Sequence[int], int, int]]
    ) -> Iterator[Proof]:
        """jobs: iterable of (full_assignment, r, s).  Yields proofs in
        order, with at most `depth` device programs enqueued ahead of the
        host decode position."""
        pending: deque = deque()
        for assignment, r, s in jobs:
            rr = self.prover.c.r
            z = self.prover.encode_assignment(assignment)
            out = self.prover.prove_encoded(z, r % rr, s % rr)
            pending.append(out)  # device futures — no host sync yet
            if len(pending) > self.depth:
                yield decode_proof_arrays(self.prover.curve, pending.popleft())
        while pending:
            yield decode_proof_arrays(self.prover.curve, pending.popleft())
