import os
import sys

# Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
# is exercised without TPU hardware (SURVEY.md §4 "multi-node without a real
# cluster").  Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: limb-engine graphs are big; recompiling them
# on every pytest run would dominate wall-clock.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_g16")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
