"""Shared jit helpers: persistent compilation cache + spec-static wrappers.

## Why the persistent cache is OFF by default on the axon TPU backend

Round-5 measurements (fresh processes, same shapes, explain-cache-misses on):

- A cache HIT on an axon-tunnel executable is nearly as slow as the
  original compile: `_witness_jit` at 2^10 compiled in 118 s and
  "deserialized" from a hit in 103 s — the tunnel's PJRT plugin
  recompiles server-side on deserialize, so the cache saves almost
  nothing.
- Worse, deserializing some cached entries crashes the backend
  (`INTERNAL: TPU backend error` at the next fence, or
  `ABORTED: TPU backend error` mid-run) and leaves the tunnel session
  unhealthy — a stale cache dir can sink an entire bench run.
- The same cache on the CPU backend (and on a plain in-process TPU
  runtime) behaves normally: a 2.4 s compile hits in 0.04 s.

Cold-compile latency on axon must therefore be attacked by shrinking
the programs themselves (see msm/pippenger.py compile notes), not by
caching.  Set G16_JIT_CACHE=1 to force the cache on anyway (useful on
CPU or non-tunneled TPU backends).
"""

from __future__ import annotations

import functools
import os

import jax


def _backend_is_axon() -> bool:
    """True when the axon tunnel backend would be selected.

    Must NOT call jax.default_backend() (or any device API): that
    initializes the backend, and __graft_entry__.dryrun_multichip needs
    to flip jax_platforms/jax_num_cpu_devices AFTER importing this
    module.  The baked sitecustomize selects axon via the jax_platforms
    config / JAX_PLATFORMS env, so reading those is sufficient."""
    try:
        plat = jax.config.jax_platforms
    except Exception:
        plat = None
    if plat is None:
        plat = os.environ.get("JAX_PLATFORMS", "")
    return "axon" in str(plat)


def _host_tag() -> str:
    """Stable fingerprint of the host CPU's feature set.

    XLA:CPU AOT cache entries embed the compile machine's features;
    loading an entry compiled on a different machine type logs
    cpu_aot_loader errors and 'could lead to SIGILL' (observed round 5:
    the shared cache dir carried entries from a prior host).  Keying
    the cache dir by the flags line isolates hosts."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            line = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        line = ""
    if not line:
        import platform

        line = platform.processor() or platform.machine()
    return hashlib.sha1(line.encode()).hexdigest()[:8]


def enable_compilation_cache(path: str = "/root/.cache/jax_g16") -> None:
    forced = os.environ.get("G16_JIT_CACHE", "")
    if forced == "0":
        return
    if not forced and _backend_is_axon():
        # Measured harmful on the tunnel backend (see module docstring):
        # hits recompile server-side and some entries crash on
        # deserialize.  Leave it off unless explicitly forced.
        return
    path = f"{path}_{_host_tag()}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@functools.lru_cache(maxsize=None)
def jit_with_static(fn, *static_args):
    """Cache one jitted closure per (fn, static-args) combination."""
    return jax.jit(functools.partial(fn, *static_args))
