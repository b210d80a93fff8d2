"""Shared jit helpers: persistent compilation cache + spec-static wrappers."""

from __future__ import annotations

import functools
import os

import jax


def enable_compilation_cache(path: str = "/root/.cache/jax_g16") -> None:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@functools.lru_cache(maxsize=None)
def jit_with_static(fn, *static_args):
    """Cache one jitted closure per (fn, static-args) combination."""
    return jax.jit(functools.partial(fn, *static_args))
