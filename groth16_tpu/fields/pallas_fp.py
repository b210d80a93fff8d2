"""Pallas TPU kernels for the 15-bit-limb Montgomery field engine.

The XLA realization of mont_mul (fields/fp.py) is a lax.scan of L
dependent steps whose [L+1, N] carry round-trips HBM every step — ~2L
passes over the data per multiply.  This kernel unrolls the whole
interleaved-CIOS loop in VMEM: HBM traffic is exactly read-a + read-b +
write-out (3·L·N·4 bytes), and the limb recurrence runs on registers/VMEM
at VPU rate.  Same math, same digit/value contracts as fp.mont_mul
(inputs any digit class < 8p, output exact digits < 2p); bit-exactness
is covered by tests/test_fp_jax.py which compares against Python ints.

Layout: uint32[L, N] blocks — limbs on sublanes, elements on lanes, so a
block is ceil(L/8)x(N/128) native (8,128) tiles with full lane use.

Reference analog: the `ark-ff` Montgomery backend's `mul_assign`
(SURVEY.md §2.2 row "Prime-field arithmetic").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groth16_tpu.fields.spec import LIMB_BITS, LIMB_MASK, FpSpec

_M = LIMB_MASK  # python int: safe to close over in kernels


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Rows move to higher limb index (x * 2^(15 d)); row count kept.

    Zeros are derived arithmetically from `x` (x ^ x) so they stay traced
    values: jnp.zeros/zeros_like create fresh constants, which
    jax.ensure_compile_time_eval folds eagerly — tripping Pallas'
    no-captured-constants rule when a caller (e.g. the NTT power-table
    builder) runs the kernel inside a compile-time-eval scope."""
    if d == 0:
        return x
    z = x[:d]
    return jnp.concatenate([z ^ z, x[:-d]], axis=0)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    return (x & _M) + _shift_up(x >> LIMB_BITS, 1)


def _rex(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """Columns (< 2^30) -> exact digits, value mod 2^(15 L).  Mirrors
    fp.rex: two folds then a Kogge-Stone binary-carry prefix."""
    x = x[:L]
    x = (x & _M) + _shift_up(x >> LIMB_BITS, 1)
    x = (x & _M) + _shift_up(x >> LIMB_BITS, 1)
    g = x >> LIMB_BITS
    p = (x == _M).astype(jnp.uint32)
    d = 1
    while d < L:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    return (x + _shift_up(g, 1)) & _M


def cios(a: jnp.ndarray, b: jnp.ndarray, p_c: jnp.ndarray, n0: int, L: int) -> jnp.ndarray:
    """Interleaved-CIOS Montgomery product core on [L, blk] values inside
    a kernel: inputs any digit class < 8p, output exact digits < 2p.
    `p_c`: [L, 1] modulus column (kernel input), `n0`: -p^-1 mod 2^15."""
    a = _fold(a)
    b = _fold(b)
    zero_row = a[:1] ^ a[:1]
    acc = jnp.concatenate([a ^ a, zero_row], axis=0)

    def pad1(x):
        return jnp.concatenate([x, zero_row], axis=0)

    for i in range(L):
        prod = a[i][None, :] * b  # semi*semi < 2^31
        acc = acc + pad1(prod & _M)
        acc = acc + _shift_up(pad1(prod >> LIMB_BITS), 1)
        m = ((acc[0] & _M) * n0) & _M
        prod2 = m[None, :] * p_c
        acc = acc + pad1(prod2 & _M)
        acc = acc + _shift_up(pad1(prod2 >> LIMB_BITS), 1)
        carry = acc[0] >> LIMB_BITS
        lo = acc[1] + carry
        acc = jnp.concatenate([lo[None, :], acc[2:], zero_row], axis=0)
    return _rex(acc, L)


@functools.lru_cache(maxsize=None)
def _kernel_fn(spec: FpSpec, blk: int):
    L = spec.n_limbs
    n0 = int(spec.n0inv)

    def kernel(p_ref, a_ref, b_ref, o_ref):
        # p_ref: [L, 1] modulus column (an input — Pallas kernels cannot
        # close over non-scalar constants)
        o_ref[...] = cios(a_ref[...], b_ref[...], p_ref[...], n0, L)

    return kernel


@functools.lru_cache(maxsize=None)
def _p_col_np(spec: FpSpec) -> np.ndarray:
    # cache the NUMPY constant only — a jnp array created inside a trace
    # must not be cached across traces (tracer leak)
    return np.array(spec.p_limbs, np.uint32).reshape(spec.n_limbs, 1)


def mont_mul_pallas(spec: FpSpec, a: jnp.ndarray, b: jnp.ndarray, blk: int) -> jnp.ndarray:
    """a, b: uint32[L, N] with blk | N.  Returns exact digits < 2p."""
    L, N = a.shape
    assert b.shape == (L, N) and N % blk == 0
    grid = (N // blk,)
    flops_est = 4 * L * L * N  # u32 mul+add lanes, for the scheduler
    return pl.pallas_call(
        _kernel_fn(spec, blk),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_est, bytes_accessed=3 * L * N * 4, transcendentals=0
        ),
    )(jnp.asarray(_p_col_np(spec)), a, b)
