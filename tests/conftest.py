import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so env tweaks here are too late; update the config
# instead (backends initialize lazily at first use).  Tests run on the CPU
# backend with 8 virtual devices so multi-chip sharding is exercised
# without TPU hardware (SURVEY.md §4).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: limb-engine graphs are big; recompiling
# them on every pytest run would dominate wall-clock.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_g16")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
