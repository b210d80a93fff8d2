"""Engine configuration (SURVEY.md §5.6 "config / flag system").

The reference's analog is Cargo features + `RAYON_NUM_THREADS`
(/root/reference/Cargo.toml:44-49, benches/bench.rs:2).  Here one mutable
module-level `CONFIG` dataclass holds the kernel-strategy knobs; tests and
benches flip fields via `configure(...)` (a context manager) instead of
mutating module globals scattered across the engine.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional


@dataclasses.dataclass
class EngineConfig:
    # Montgomery-multiply strategy for the XLA (non-Pallas) path: unroll
    # the CIOS limb loop (bigger graphs, no sequential scan steps — wins
    # on TPU where compiles are cheap) or keep it a lax.scan (small
    # graphs — right for the CPU backend where compile time dominates).
    cios_unroll: bool = False
    # Batches at or below this element count force the unrolled CIOS on
    # the TPU backend only (a width-1 L-step lax.scan is pure dispatch
    # overhead over a device tunnel).  Off-TPU the scan path always
    # wins: XLA:CPU while-loops are cheap to run and the unrolled graph
    # is ~10x more HLO to compile (the round-2 dryrun_multichip timeout).
    cios_small_unroll_max: int = 128
    # Pallas kernel dispatch: "auto" = use Pallas kernels when the active
    # JAX backend is TPU; "on" = always (interpret-mode off-TPU is NOT
    # implied — "on" off-TPU will fail to lower); "off" = pure XLA.
    use_pallas: str = "auto"
    # Minimum flattened element count for the Pallas mont_mul path;
    # smaller batches stay on the XLA path (kernel launch isn't worth it).
    pallas_min_elems: int = 256
    # Lane-block width of Pallas field kernels (elements per grid step).
    pallas_block: int = 512
    # Pippenger window override (None = analytic chooser).
    msm_window_bits: Optional[int] = None
    # Signed-digit (wNAF-style) windows: digits recoded into
    # [-2^(c-1), 2^(c-1)] so the bucket tail halves, letting the chooser
    # take a wider window (fewer scan passes).  Negation rides the
    # gather index (a second y-negated copy of the element-major plane),
    # costing HBM capacity, not bandwidth.
    msm_signed_digits: bool = True
    # HBM budget for one window-group's gathered point copies + (fused
    # path) the prefix planes; ~1.5x this is the peak extra footprint.
    # 3 GiB puts a whole 2^16 MSM (all ~23 windows) in ONE group on a
    # 16 GB chip; 2^20 runs ~2 windows per group.
    msm_group_bytes: int = 3 << 30  # 3 GiB
    # Chunk-count cap for the MSM suffix scan (scans.py): larger C means
    # fewer in-loop capture steps (K = npad / C) at the price of a wider
    # cross pass over chunk totals.
    msm_max_chunks: int = 4096
    # Chunk-count cap for the FUSED scan kernel: its grid-step count is
    # npad/blk independent of C, so C only sets the cross-pass width —
    # keep it at the kernel's lane-tiling floor.
    msm_max_chunks_fused: int = 512
    # Relative cost of one bucket-tail slot vs one suffix-scan point add
    # in the window chooser (see pippenger.choose_window_bits).  Round-4
    # measurement with the fused scan kernel + element-major boundary
    # gathers: ~85 ns/bucket vs ~41 ns/point => ~2.  (The old
    # fori_loop+capture path measured ~50; it is re-applied when the
    # fused kernel is unavailable, see pippenger._bucket_cost.)
    msm_bucket_cost: int = 2
    # Grid-carried Pallas suffix-scan kernel for MSM bucket accumulation
    # (msm/pallas_scan.py): accumulator lives in VMEM across sequential
    # grid steps, boundary values come from one element-major row gather.
    # Effective only where Pallas dispatch is active (TPU backend);
    # elsewhere the fori_loop capture-scan path runs.
    msm_fused_scan: bool = True
    # Lane-block width of the fused scan kernel (must divide the chunk
    # count C; _pick_blk falls back to the largest divisor).
    msm_scan_blk: int = 1024


CONFIG = EngineConfig()


def pallas_enabled() -> bool:
    import jax

    if CONFIG.use_pallas == "on":
        return True
    if CONFIG.use_pallas == "off":
        return False
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def configure(**kwargs):
    """Temporarily override CONFIG fields."""
    old = {k: getattr(CONFIG, k) for k in kwargs}
    try:
        for k, v in kwargs.items():
            setattr(CONFIG, k, v)
        yield CONFIG
    finally:
        for k, v in old.items():
            setattr(CONFIG, k, v)
