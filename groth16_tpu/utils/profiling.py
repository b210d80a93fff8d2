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


# -- speed-of-light models ------------------------------------------------------

# one Montgomery mul (interleaved CIOS): ~2 L^2 u32 multiplies + ~6 L^2
# u32 add/mask ops per element
def mont_mul_u32_ops(n_limbs: int) -> int:
    return 8 * n_limbs * n_limbs


# complete RCB point add: 12 field muls + ~8 resolving passes
def point_add_u32_ops(n_limbs: int, fp2: bool = False) -> int:
    muls = 12 * (4 if fp2 else 1)
    return muls * mont_mul_u32_ops(n_limbs) + 20 * n_limbs * (2 if fp2 else 1)


def msm_work_point_adds(n: int, scalar_bits: int, window_bits: int) -> int:
    """Point-adds executed by the scatter-free Pippenger."""
    windows = -(-scalar_bits // window_bits)
    B = 1 << window_bits
    return windows * (n + B + 64 * 6) + windows * window_bits


def ntt_butterflies(n: int) -> int:
    return (n // 2) * max(1, (n - 1).bit_length())


def report(metric: str, value: float, unit: str, vs_baseline: float = 0.0):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 4),
    }))
