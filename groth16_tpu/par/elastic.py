"""Failure detection + elastic recovery for the sharded prover.

The reference is a single-process library whose only failure surface is
the `SynthesisError` result type (/root/reference/src/lib.rs:49,64); at
TPU-pod scale the failure modes that matter are device loss mid-run and
silent data corruption (SDC) inside long MSM/NTT programs.  SURVEY.md
§5.3 names the build analog: per-shard checksums of MSM partials with
recompute-on-mismatch, plus restart of batch work from the last
completed proof (the latter lives in TpuProver.prove_batch's resumable
store, protocol/prover_tpu.py).

Detection here is layered:

1. **Protocol self-check** (strongest, O(1) pairings): Groth16's verify
   equation e(A,B) = e(alpha,beta) e(ic,gamma) e(C,delta) covers every
   upstream bit — witness map, 7 NTTs, 5 MSMs, assembly.  A proof that
   verifies is correct regardless of what the hardware did; one that
   does not is discarded and retried.  Cost is microseconds against
   seconds of proving, so ElasticProver checks every proof by default.
2. **Per-shard MSM checksums** (localization): `shard_checksums` re-runs
   the 4-lane G1 MSM keeping each device's partial accumulator local and
   folds it to one u64 word per shard.  Deterministic XLA programs give
   bit-identical partials across runs, so a run-to-run checksum mismatch
   pins the flaky device; `localize_faults` reports the shard indices.
3. **Elastic retry**: on a device error (backend abort / device lost)
   ElasticProver rebuilds the mesh over the surviving device prefix —
   halving the shard count keeps every divisibility invariant — re-places
   the PK shards, and re-proves.  Proof bytes are attempt-invariant: the
   group math is exact, so any mesh shape produces the identical proof.

Fault injection for tests: `ElasticProver.fault_hook` is called as
``fault_hook(attempt, proof)`` after each prove and may return a
corrupted proof (SDC model) or raise (device-loss model).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import make_spec
from groth16_tpu.msm.pippenger import msm_device_lanes
from groth16_tpu.par.mesh import DATA_AXIS
from groth16_tpu.par.prover_dp import ShardedProver, _g1_scalar_stack
from groth16_tpu.protocol.data_structures import Proof, ProvingKey
from groth16_tpu.r1cs.matrices import ConstraintMatrices


class ProverFaultError(RuntimeError):
    """Raised when every elastic attempt produced an invalid proof."""


@dataclasses.dataclass
class AttemptReport:
    attempt: int
    n_devices: int
    ok: bool
    error: Optional[str] = None


@dataclasses.dataclass
class ProveReport:
    attempts: List[AttemptReport]

    @property
    def retried(self) -> bool:
        return len(self.attempts) > 1


def shard_checksums(prover: ShardedProver, full_assignment) -> jnp.ndarray:
    """One u64 checksum per shard of the 4-lane G1 MSM partials.

    Runs the witness map + per-device Pippenger exactly as the sharded
    prove does, but keeps each device's partial accumulator local
    (out_specs sharded, no all_gather combine) and folds its limb words
    into a single u64.  XLA programs are deterministic, so two calls
    disagreeing at shard i is evidence of hardware fault on device i.
    """
    mesh, axis = prover.mesh, prover.axis
    dpk = prover.dpk
    c = prover.c
    fr = prover.fr
    g1 = codec.g1_ops(c)
    sbits = c.r.bit_length()
    z = prover.encode_assignment(full_assignment)

    @jax.jit
    def cks(z_mont):
        scalars4, _ = _g1_scalar_stack(
            fr, mesh, axis, dpk, z_mont, dpk.num_inputs
        )

        def local(pts, sc):
            acc = msm_device_lanes(g1, pts, sc, sbits)
            # u32 wraparound sum of every limb word of the partial —
            # enough to witness any bit flip in the accumulator
            s = jnp.uint32(0)
            for x in acc:
                s = s + jnp.sum(x, dtype=jnp.uint32)
            return s[None]

        def leaf_spec(x):
            return P(*([None] * (x.ndim - 1)), axis)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                tuple(leaf_spec(x) for x in dpk.g1_msm_points),
                leaf_spec(scalars4),
            ),
            out_specs=P(axis),
            check_vma=False,
        )(dpk.g1_msm_points, scalars4)

    return cks(z)


def localize_faults(
    prover: ShardedProver, full_assignment, passes: int = 2
) -> List[int]:
    """Shard indices whose MSM-partial checksum is not reproducible
    across `passes` executions (empty on healthy hardware)."""
    runs = [
        jax.device_get(shard_checksums(prover, full_assignment))
        for _ in range(max(2, passes))
    ]
    bad = set()
    base = runs[0]
    for r in runs[1:]:
        for i, (x, y) in enumerate(zip(base, r)):
            if int(x) != int(y):
                bad.add(i)
    return sorted(bad)


class ElasticProver:
    """Sharded prover with verify-every-proof detection and shrink-mesh
    retry.  `prove_checked` returns (proof, report); the proof is
    guaranteed to satisfy the Groth16 verify equation for the public
    inputs carried in `full_assignment`.
    """

    def __init__(
        self,
        pk: ProvingKey,
        matrices: ConstraintMatrices,
        devices: Optional[Sequence] = None,
        axis: str = DATA_AXIS,
        max_attempts: int = 3,
        fault_hook: Optional[Callable[[int, Proof], Proof]] = None,
    ):
        self.pk = pk
        self.matrices = matrices
        self.axis = axis
        self.max_attempts = max_attempts
        self.fault_hook = fault_hook
        self.devices = list(devices) if devices is not None else jax.devices()
        self.c = get_curve(pk.vk.curve)
        self.fr = make_spec(self.c.r, name=f"{pk.vk.curve}.Fr")
        self._pvk = None
        self._prover: Optional[ShardedProver] = None
        self._build(len(self.devices))

    def _build(self, n_devices: int) -> None:
        self.n_devices = n_devices
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.array(self.devices[:n_devices]), (self.axis,))
        self._prover = ShardedProver(
            self.pk, self.matrices, mesh=mesh, axis=self.axis
        )

    def _verify(self, proof: Proof, public_inputs: List[int]) -> bool:
        from groth16_tpu.protocol import prepare_verifying_key, verify_proof

        if self._pvk is None:
            self._pvk = prepare_verifying_key(self.pk.vk)
        return verify_proof(self._pvk, proof, public_inputs)

    def prove_checked(self, full_assignment, r: int, s: int):
        """Prove with detection + elastic retry; (Proof, ProveReport)."""
        num_inputs = self.matrices.num_instance_variables
        public_inputs = [
            x % self.c.r for x in full_assignment[1:num_inputs]
        ]
        report = ProveReport(attempts=[])
        for attempt in range(self.max_attempts):
            n_dev = self.n_devices
            try:
                proof = self._prover.prove(full_assignment, r, s)
                if self.fault_hook is not None:
                    proof = self.fault_hook(attempt, proof)
                if self._verify(proof, public_inputs):
                    report.attempts.append(
                        AttemptReport(attempt, n_dev, ok=True)
                    )
                    return proof, report
                report.attempts.append(
                    AttemptReport(
                        attempt, n_dev, ok=False,
                        error="proof failed self-verification",
                    )
                )
                # same mesh is fine for transient SDC; a second failure
                # on the same shape falls through to the shrink below
                if (
                    len(report.attempts) >= 2
                    and not report.attempts[-2].ok
                    and n_dev > 1
                ):
                    self._build(max(1, n_dev // 2))
            except Exception as e:  # device loss / backend abort
                report.attempts.append(
                    AttemptReport(attempt, n_dev, ok=False, error=repr(e))
                )
                if n_dev > 1:
                    self._build(max(1, n_dev // 2))
                else:
                    raise ProverFaultError(
                        f"prove failed on the last device: {e!r}"
                    ) from e
        raise ProverFaultError(
            f"no valid proof after {self.max_attempts} attempts: "
            + "; ".join(a.error or "?" for a in report.attempts)
        )
