import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env tweaks here are too late; update the config
# instead (backends initialize lazily at first use).
#
# Platform policy:
#   GROTH16_TEST_PLATFORM=cpu  (default) — CPU backend with 8 virtual
#     devices so multi-chip sharding is exercised without TPU hardware
#     (SURVEY.md §4).  The limb-engine graphs compile ~20x slower on the
#     CPU backend (LLVM scalarization), so CPU tests keep sizes tiny and
#     lean on the persistent compilation cache.
#   GROTH16_TEST_PLATFORM=tpu — run on the attached TPU chip (fast
#     compiles, real-hardware numerics); sharding tests that need 8
#     devices self-skip.
import jax  # noqa: E402


def _cpu_fallback():
    """Select the 8-virtual-device CPU backend, with the LLVM flags the
    limb-engine graphs need there: XLA:CPU's default pipeline SEGFAULTS
    compiling the largest point-formula functions (mnt6's Fp3 G2 MSM —
    an expensive LLVM pass blows up; reproducer: scratch notes), and
    opt-level 0 both avoids it and cuts the dominant compile time.
    Numerics are unaffected — integer ops are exact at any opt level."""
    flags = "--xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flags).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)


_platform = os.environ.get("GROTH16_TEST_PLATFORM", "auto")
if _platform == "cpu":
    _cpu_fallback()
elif _platform == "auto":
    # Prefer the attached TPU (limb-engine graphs compile ~20x faster
    # there than on the single-core CPU backend); fall back to the
    # 8-virtual-device CPU mesh.  Sharding tests self-skip when fewer
    # than 8 devices are visible — run them with GROTH16_TEST_PLATFORM=cpu.
    #
    # The probe runs in a SUBPROCESS with a hard timeout: when the axon
    # tunnel is down, in-process `jax.devices()` blocks forever inside
    # `make_c_api_client` (C call — uninterruptible), which would hang
    # the whole suite before collecting a single test.
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=int(os.environ.get("GROTH16_TPU_PROBE_TIMEOUT_S", "90")),
            check=True,
            capture_output=True,
        )
    except Exception:
        _cpu_fallback()

# Persistent compilation cache: limb-engine graphs are big; recompiling
# them on every run would dominate wall-clock.
from groth16_tpu.utils.jitcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
