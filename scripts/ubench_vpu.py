"""VPU op-rate microbenchmarks: what is the speed of light for the ops
the CIOS Montgomery kernel is made of (u32 mul, u32 add, mask/shift)?

Used to compute the SoL fraction of fields/pallas_fp.py (BASELINE.md's
"profiled against speed-of-light per chip").  One-off diagnostic.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def bench_op(name, op, n_ops_per_elem, dtype, N=1 << 20, R=2048):
    """Kernel: out = op applied R times per element (dependency chain
    broken into 4 independent chains so the VPU can pipeline)."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def body(i, xs):
            # cross-couple the chains so no strength reduction applies
            x0, x1, x2, x3 = xs
            for _ in range(4):
                x0 = op(x0, x1)
                x1 = op(x1, x2)
                x2 = op(x2, x3)
                x3 = op(x3, x0)
            return (x0, x1, x2, x3)

        x0, x1, x2, x3 = jax.lax.fori_loop(
            0, R // 16, body, (a, a + 1, a + 2, b)
        )
        o_ref[...] = x0 ^ x1 ^ x2 ^ x3 if dtype == jnp.uint32 else x0 + x1 + x2 + x3

    blk = 1 << 14
    L = 8

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, N // L), dtype),
            grid=(N // L // blk,),
            in_specs=[
                pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=R * N, bytes_accessed=3 * N * 4, transcendentals=0
            ),
        )(a, b)

    if dtype == jnp.uint32:
        a = jnp.asarray(
            np.random.randint(0, 1 << 15, size=(L, N // L)), dtype
        )
        b = jnp.asarray(
            np.random.randint(0, 1 << 15, size=(L, N // L)), dtype
        )
    else:
        a = jnp.asarray(np.random.rand(L, N // L), dtype)
        b = jnp.asarray(np.random.rand(L, N // L), dtype)
    t, _ = timeit(name, run, a, b)
    rate = R * N * n_ops_per_elem / t / 1e9
    print(f"{name:40s}: {rate:8.1f} G op/s  ({t*1e3:.2f} ms for {R}x{N})")
    return rate


def main():
    print(f"devices: {jax.devices()}")
    bench_op("u32 mul", lambda x, y: x * y, 1, jnp.uint32)
    bench_op("u32 add", lambda x, y: x + y, 1, jnp.uint32)
    bench_op("u32 mul+mask+shift+2add (CIOS inner)",
             lambda x, y: ((x * y) & 0x7FFF) + ((x * y) >> 15) + y, 1,
             jnp.uint32)
    bench_op("u16 mul (u32 lanes, 15-bit vals)",
             lambda x, y: (x & 0xFFFF) * (y & 0xFFFF), 1, jnp.uint32)
    bench_op("f32 mul", lambda x, y: x * y, 1, jnp.float32)
    bench_op("f32 fma", lambda x, y: x * y + y, 1, jnp.float32)
    # int16 multiply via bitcast? try i32 mul on int32
    bench_op("i32 mul", lambda x, y: x * y, 1, jnp.int32)


if __name__ == "__main__":
    main()
