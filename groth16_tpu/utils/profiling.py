"""Phase timers + speed-of-light accounting (SURVEY.md §5.1 analog).

The reference instruments every phase with ark_std start_timer!/end_timer!
(generator.rs:62-196, prover.rs:35-125); the TPU analog is wall-clock
phase timing around blocking device calls plus a per-kernel
speed-of-light model: u32-op counts for the limb engine vs. the chip's
VPU throughput, and points/s / butterflies/s reporters that feed
bench.py and BASELINE comparisons.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import sys
import time
from typing import Dict, List

import jax


@dataclasses.dataclass
class PhaseTimer:
    """Nested scope timers; prints ark_std-style lines when verbose."""

    verbose: bool = True
    records: List = dataclasses.field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        yield
        dt = time.time() - t0
        self.records.append((name, dt))
        if self.verbose:
            print(f"[timer] {name}: {dt:.3f}s", file=sys.stderr)

    def as_dict(self) -> Dict[str, float]:
        return {k: v for k, v in self.records}


def timed(fn, *args, reps: int = 1):
    """(best wall seconds, result) with block_until_ready."""
    result = jax.block_until_ready(fn(*args))  # warm/compile
    best = None
    for _ in range(reps):
        t0 = time.time()
        result = jax.block_until_ready(fn(*args))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, result


def device_sync(x):
    """Force TRUE completion of `x` by fetching one element to host.

    On the tunneled `axon` platform `jax.block_until_ready` returns long
    before execution finishes (measured round 4: a 2^19-element Pallas
    montmul pass "completes" in 0.02 ms by block_until_ready but costs
    ~0.9 ms marginal when timed with a device_get fence).  Every
    wall-clock measurement must therefore end with a device->host read;
    this fetches a single element of the first array leaf (tiny
    transfer, one round trip ~20-25 ms on the tunnel — time *batched*
    work between fences and subtract a measured fence baseline for
    per-stage numbers)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    idx = tuple(0 for _ in range(leaf.ndim))
    jax.device_get(leaf[idx] if leaf.ndim else leaf)
    return x


def timed_sync(fn, *args, reps: int = 3, inner: int = 1):
    """(best seconds per call, result) with a real device fence.

    `inner`: dispatch the call `inner` times per fence so the ~20-25 ms
    tunnel round trip amortizes; per-call time = (wall - 0)/inner.  Use
    marginal timing (inner=4 vs inner=1 deltas) for kernel-rate numbers.
    """
    result = fn(*args)
    device_sync(result)  # warm/compile
    best = None
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            result = fn(*args)
        device_sync(result)
        dt = (time.time() - t0) / inner
        best = dt if best is None else min(best, dt)
    return best, result


# -- speed-of-light models ------------------------------------------------------

# Measured VPU throughput for the u32 mul/add/mask mix the CIOS limb
# engine issues (round 4, scripts/ubench_vpu.py: marginal rate of
# cross-coupled mul+add chains on the attached v5-lite chip).  This is
# the chip-peak denominator for SoL fractions in bench.py.
VPU_U32_OPS_PER_S = 1.15e12


# one Montgomery mul (interleaved CIOS): ~2 L^2 u32 multiplies + ~6 L^2
# u32 add/mask ops per element
def mont_mul_u32_ops(n_limbs: int) -> int:
    return 8 * n_limbs * n_limbs


# complete RCB MIXED (projective+affine) point add: 13 field muls
# (pallas_point.mixed_add_g1_math) + the ksub/rex resolving passes
def point_add_u32_ops(n_limbs: int, fp2: bool = False) -> int:
    muls = 13 * (4 if fp2 else 1)
    return muls * mont_mul_u32_ops(n_limbs) + 20 * n_limbs * (2 if fp2 else 1)


def point_add_sol_per_s(n_limbs: int, fp2: bool = False) -> float:
    """Speed-of-light point-adds/s if the VPU did nothing else."""
    return VPU_U32_OPS_PER_S / point_add_u32_ops(n_limbs, fp2)


def msm_work_point_adds(
    n: int, scalar_bits: int, window_bits: int, signed: bool = True
) -> int:
    """Point-adds executed by one scatter-free Pippenger MSM: the
    suffix scan does n adds per window, the bucket tail ~2 per bucket
    (gv add + reduce level), the Horner combine window_bits doublings +
    1 add per window.  Signed digits halve the bucket count and add a
    carry window only when window_bits divides scalar_bits
    (pippenger.signed_num_windows)."""
    if signed:
        from groth16_tpu.msm.pippenger import signed_num_windows

        windows = signed_num_windows(scalar_bits, window_bits)
    else:
        windows = -(-scalar_bits // window_bits)
    B = ((1 << (window_bits - 1)) + 1) if signed else (1 << window_bits)
    return windows * (n + 2 * B) + windows * (window_bits + 1)


def ntt_butterflies(n: int) -> int:
    return (n // 2) * max(1, (n - 1).bit_length())


def report(metric: str, value: float, unit: str, vs_baseline: float = 0.0):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 4),
    }))
