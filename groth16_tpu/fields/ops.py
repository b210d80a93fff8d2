"""Unified device field-op interface: Fp and Fp2 over the limb engine.

The curve/MSM layers are generic over a field-ops object `k` exposing
add/sub/mul/sqr/neg/double/is_zero/zero/one/select on limb tensors, so one
branchless Jacobian kernel serves both G1 (coords in Fq) and G2 (coords in
Fq2).  This realizes the `ark-ec` tower consumption described in
SURVEY.md §2.2 ("Curve groups" row; reference call sites via the `Pairing`
assoc types, /root/reference/src/verifier.rs:49-64).

Element layouts:
  Fp : uint32[..., L]      (16-bit limbs, Montgomery form, range [0, 2p))
  Fp2: uint32[..., 2, L]   (c0/c1 stacked on axis -2, each an Fp element)

`mul_many`/`add_many`/`sub_many` batch independent same-shape ops into one
stacked limb-engine call — the point-formula kernels are written against
these so a Jacobian add costs ~6 wide multiplies instead of ~30 narrow
ones (smaller graphs to compile, wider vectors at runtime).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec, int_to_limbs


def _stack_run(op, pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]]) -> List:
    if len(pairs) == 1:
        out = op(pairs[0][0], pairs[0][1])
        return [out]
    shape = jnp.broadcast_shapes(*[jnp.broadcast_shapes(a.shape, b.shape)
                                   for a, b in pairs])
    a = jnp.stack([jnp.broadcast_to(x, shape) for x, _ in pairs], axis=0)
    b = jnp.stack([jnp.broadcast_to(y, shape) for _, y in pairs], axis=0)
    out = op(a, b)
    return [out[i] for i in range(len(pairs))]


class FpOps:
    """Device ops for the base prime field (G1 coordinates)."""

    def __init__(self, spec: FpSpec):
        self.spec = spec
        self.coord_ndim = 1  # trailing dims per element: (L,)

    def coord_shape(self):
        return (self.spec.n_limbs,)

    def zero(self, shape=()):
        return fp.zeros(self.spec, shape)

    def one(self, shape=()):
        return fp.const(self.spec, 1, shape)

    def const(self, value: int, shape=()):
        return fp.const(self.spec, value, shape)

    def add(self, a, b):
        return fp.add(self.spec, a, b)

    def sub(self, a, b):
        return fp.sub(self.spec, a, b)

    def neg(self, a):
        return fp.neg(self.spec, a)

    def dbl(self, a):
        return fp.add(self.spec, a, a)

    def mul(self, a, b):
        return fp.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return fp.mont_mul(self.spec, a, a)

    def mul_many(self, pairs):
        return _stack_run(lambda a, b: fp.mont_mul(self.spec, a, b), pairs)

    def add_many(self, pairs):
        return _stack_run(lambda a, b: fp.add(self.spec, a, b), pairs)

    def sub_many(self, pairs):
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b), pairs)

    def mul_small(self, a, k: int):
        """a * k for tiny host ints (3, 8, ...) via add chains."""
        return _mul_small(self, a, k)

    def is_zero(self, a):
        return fp.is_zero(self.spec, a)

    def select(self, mask, a, b):
        """mask ? a : b with mask of batch shape (broadcast over elem dims)."""
        return jnp.where(mask[..., None], a, b)

    def inv(self, a):
        return fp.inv(self.spec, a)

    def batch_inv(self, a):
        return fp.batch_inv(self.spec, a)


class Fp2Ops:
    """Device ops for Fq2 = Fq[u]/(u^2 - nonresidue) (G2 coordinates).

    Multiplication is schoolbook (4 Fp muls, batched into the shared
    stacked call) rather than Karatsuba — with batched muls the two extra
    Karatsuba pre-additions cost more than the extra lane of multiply.
    The nonresidue multiply is an add-chain (every registered curve has a
    small nonresidue: -1 or -5).
    """

    def __init__(self, spec: FpSpec, nonresidue: int):
        self.spec = spec
        self.nr_int = nonresidue  # signed small int
        self.nonresidue = nonresidue % spec.modulus
        self.coord_ndim = 2  # trailing dims per element: (2, L)
        self._nr_mont = jnp.asarray(
            np.array(
                int_to_limbs(spec.to_mont_int(self.nonresidue), spec.n_limbs),
                dtype=np.uint32,
            )
        )

    def coord_shape(self):
        return (2, self.spec.n_limbs)

    def _pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def zero(self, shape=()):
        return fp.zeros(self.spec, tuple(shape) + (2,))

    def one(self, shape=()):
        return self._pack(fp.const(self.spec, 1, shape), fp.zeros(self.spec, shape))

    def const(self, value, shape=()):
        """value: int (embeds Fp) or (c0, c1) pair."""
        if isinstance(value, tuple):
            c0, c1 = value
        else:
            c0, c1 = value, 0
        return self._pack(fp.const(self.spec, c0, shape), fp.const(self.spec, c1, shape))

    def add(self, a, b):
        return fp.add(self.spec, a, b)  # componentwise over the stacked axis

    def sub(self, a, b):
        return fp.sub(self.spec, a, b)

    def neg(self, a):
        return fp.neg(self.spec, a)

    def dbl(self, a):
        return fp.add(self.spec, a, a)

    def add_many(self, pairs):
        return _stack_run(lambda a, b: fp.add(self.spec, a, b), pairs)

    def sub_many(self, pairs):
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b), pairs)

    def _mul_nr(self, a):
        """a * nonresidue in Fp via add chain (small |nr|) or const mul."""
        nr = self.nr_int
        if abs(nr) <= 16:
            out = _fp_mul_small(self.spec, a, abs(nr))
            return fp.neg(self.spec, out) if nr < 0 else out
        return fp.mont_mul(self.spec, a, self._nr_mont)

    def mul_many(self, pairs):
        s = self.spec
        fp_pairs = []
        for a, b in pairs:
            a0, a1 = a[..., 0, :], a[..., 1, :]
            b0, b1 = b[..., 0, :], b[..., 1, :]
            fp_pairs += [(a0, b0), (a1, b1), (a0, b1), (a1, b0)]
        outs = _stack_run(lambda x, y: fp.mont_mul(s, x, y), fp_pairs)
        res = []
        for i in range(len(pairs)):
            v00, v11, v01, v10 = outs[4 * i : 4 * i + 4]
            c0 = fp.add(s, v00, self._mul_nr(v11))
            c1 = fp.add(s, v01, v10)
            res.append(self._pack(c0, c1))
        return res

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def sqr(self, a):
        """v0=a0^2, v1=a1^2, m=a0*a1: (v0 + nr*v1, 2m)."""
        s = self.spec
        a0, a1 = a[..., 0, :], a[..., 1, :]
        v0, v1, m = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, a0), (a1, a1), (a0, a1)]
        )
        c0 = fp.add(s, v0, self._mul_nr(v1))
        c1 = fp.add(s, m, m)
        return self._pack(c0, c1)

    def mul_small(self, a, k: int):
        return _mul_small(self, a, k)

    def is_zero(self, a):
        return jnp.logical_and(
            fp.is_zero(self.spec, a[..., 0, :]), fp.is_zero(self.spec, a[..., 1, :])
        )

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def inv(self, a):
        """(a0 - a1 u) / (a0^2 - nr a1^2)."""
        s = self.spec
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = fp.sub(s, fp.mont_mul(s, a0, a0), self._mul_nr(fp.mont_mul(s, a1, a1)))
        ninv = fp.inv(s, norm)
        return self._pack(fp.mont_mul(s, a0, ninv), fp.neg(s, fp.mont_mul(s, a1, ninv)))

    def batch_inv(self, a):
        s = self.spec
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = fp.sub(s, fp.mont_mul(s, a0, a0), self._mul_nr(fp.mont_mul(s, a1, a1)))
        ninv = fp.batch_inv(s, norm)
        return self._pack(fp.mont_mul(s, a0, ninv), fp.neg(s, fp.mont_mul(s, a1, ninv)))


def _fp_mul_small(spec, a, n: int):
    assert n >= 0
    if n == 0:
        return jnp.zeros_like(a)
    acc = None
    base = a
    while n:
        if n & 1:
            acc = base if acc is None else fp.add(spec, acc, base)
        n >>= 1
        if n:
            base = fp.add(spec, base, base)
    return acc


def _mul_small(k, a, n: int):
    """a * n for small host ints via a double-and-add chain on field adds."""
    assert n >= 0
    if n == 0:
        return k.zero(a.shape[: a.ndim - k.coord_ndim])
    acc = None
    base = a
    while n:
        if n & 1:
            acc = base if acc is None else k.add(acc, base)
        n >>= 1
        if n:
            base = k.dbl(base)
    return acc
