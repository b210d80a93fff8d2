"""Sharded NTT: four-step (Bailey) decomposition over a mesh axis.

The sequence/context-parallelism analog of SURVEY.md §2.4 ("ntt_cp") and
§5.7: the length-n coefficient vector is sharded across devices; local
butterfly stages run at full VPU width and the only communication is
three `all_to_all` block transposes over ICI.

Math (n = n1*n2, w the order-n root, input a[j], j = j1*n2 + j2):
  X[k2*n1 + k1] = sum_{j2} w2^{j2 k2} * w^{j2 k1} * A1[k1, j2]
  A1[k1, j2]    = sum_{j1} w1^{j1 k1} * a[j1*n2 + j2]
with w1 = w^{n2} (order n1), w2 = w^{n1} (order n2).  Steps on device:
  1. view [n1, n2] sharded by rows; transpose (all_to_all) -> [n2, n1]
  2. local length-n1 NTTs along the last axis (batched _ntt_core)
  3. twiddle by w^{j2*k1} (per-shard table, built on device)
  4. transpose back -> [n1, n2]; local length-n2 NTTs
  5. transpose -> natural-order output sharded by k2 rows
Coset offsets and 1/n are local elementwise passes with per-shard power
slices.  Output ordering and scaling match NttDomain exactly (tested on
the 8-virtual-device CPU mesh, SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec, encode
from groth16_tpu.ntt.ntt import NttDomain, _ntt_core, powers
from groth16_tpu.par.collectives import transpose_a2a as _transpose_a2a
from groth16_tpu.par.mesh import DATA_AXIS, axis_size


def _geometric_rows(spec: FpSpec, row_bases: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """rows[.., i, k] = row_bases[.., i]^k for k < n_cols (Montgomery, on
    device).  row_bases: [L, rows] -> [L, rows, n_cols].

    Log-doubling along the column axis: log2(n_cols) wide multiplies.
    """
    assert n_cols & (n_cols - 1) == 0
    cur = fp.const(spec, 1, row_bases.shape[1:] + (1,))  # ones [L, rows, 1]
    scale = row_bases[..., None]  # base^(2^t) per row
    length = 1
    while length < n_cols:
        nxt = fp.mont_mul(spec, cur, scale)
        cur = jnp.concatenate([cur, nxt], axis=-1)
        scale = fp.mont_mul(spec, scale, scale)
        length *= 2
    return cur


class ShardedNtt:
    """Four-step (i)NTT over `mesh` for one (field, n) domain.

    Data layout: uint32[L, n] Montgomery (limb-major), sharded along the
    element axis (axis 1).  n must
    satisfy n = n1 * n2 with S | n1 and S | n2 (S = mesh axis size); the
    default split is n1 = 2^ceil(log/2).
    """

    def __init__(self, domain: NttDomain, mesh, axis: str = DATA_AXIS):
        self.domain = domain
        self.mesh = mesh
        self.axis = axis
        self.spec = domain.spec
        n = domain.size
        log_n = domain.log_size
        S = axis_size(mesh, axis)
        n1 = 1 << ((log_n + 1) // 2)
        n2 = n // n1
        assert n1 % S == 0 and n2 % S == 0, (
            f"n={n} too small for mesh of {S} devices")
        self.n1, self.n2, self.S = n1, n2, S

    # power tables (replicated device constants, cached by `powers`)
    def _w_pows(self, inverse: bool) -> jnp.ndarray:
        gen = self.domain.group_gen_inv if inverse else self.domain.group_gen
        return powers(self.spec, gen, self.domain.size)

    def _apply(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        spec = self.spec
        n1, n2, S = self.n1, self.n2, self.S
        p = self.domain.field.modulus
        gen = self.domain.group_gen_inv if inverse else self.domain.group_gen
        w1_pows = powers(spec, pow(gen, n2, p), n1)
        w2_pows = powers(spec, pow(gen, n1, p), n2)
        w_pows = self._w_pows(inverse)  # [n] for the twiddle gather

        def local(x):  # x: [L, n/S] = rows [L, n1/S, n2]
            x = x.reshape(spec.n_limbs, n1 // S, n2)
            x = _transpose_a2a(x, self.axis)  # [L, n2/S, n1]
            x = _ntt_core(spec, x, w1_pows)  # length-n1 NTTs
            # twiddle w^{j2*k1}: row j2 (global), col k1
            me = jax.lax.axis_index(self.axis)
            j2 = me * (n2 // S) + jnp.arange(n2 // S)
            row_base = jnp.take(w_pows, j2, axis=-1)  # w^{j2}, [L, n2/S]
            tw = _geometric_rows(spec, row_base, n1)  # [L, n2/S, n1]
            x = fp.mont_mul(spec, x, tw)
            x = _transpose_a2a(x, self.axis)  # [L, n1/S, n2]
            x = _ntt_core(spec, x, w2_pows)  # length-n2 NTTs
            x = _transpose_a2a(x, self.axis)  # [L, n2/S, n1] = output rows k2
            return x.reshape(spec.n_limbs, n1 * n2 // S)

        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=P(None, self.axis),
            out_specs=P(None, self.axis),
            check_vma=False,
        )(a)

    def _scale(self, a: jnp.ndarray, base: int, const: int = 1) -> jnp.ndarray:
        """a[j] *= const * base^j, sharded elementwise pass."""
        spec = self.spec
        p = self.domain.field.modulus
        n = self.domain.size
        base_pows = powers(spec, base, n)
        cmont = jnp.asarray(encode([const], spec))

        def local(x, bp):
            return fp.mont_mul(spec, fp.mont_mul(spec, x, bp), cmont)

        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P(None, self.axis)),
            out_specs=P(None, self.axis),
            check_vma=False,
        )(a, base_pows)

    def fft(self, coeffs: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
        a = coeffs
        if offset != 1:
            a = self._scale(a, offset)
        return self._apply(a, inverse=False)

    def ifft(self, evals: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
        a = self._apply(evals, inverse=True)
        p = self.domain.field.modulus
        if offset != 1:
            a = self._scale(a, pow(offset, p - 2, p), self.domain.size_inv)
        else:
            a = self._scale(a, 1, self.domain.size_inv)
        return a

    def coset_fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self.fft(coeffs, offset=self.domain.field.generator)

    def coset_ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self.ifft(evals, offset=self.domain.field.generator)
