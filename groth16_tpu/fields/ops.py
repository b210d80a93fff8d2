"""Unified device field-op interface: Fp and Fp2 over the limb engine.

The curve/MSM layers are generic over a field-ops object `k` exposing the
lazy-digit op set (see fields/fp.py docstring for the digit/value-class
ledger) on limb tensors, so one complete-formula point kernel serves both
G1 (coords in Fq) and G2 (coords in Fq2).  This realizes the `ark-ec`
tower consumption described in SURVEY.md §2.2 ("Curve groups" row).

Element layouts:
  Fp : uint32[..., L]      (15-bit digits, Montgomery form)
  Fp2: uint32[..., 2, L]   (c0/c1 stacked on axis -2, each an Fp element)

`mul_many`/`sub_many` batch independent same-shape ops into one stacked
limb-engine call — the point kernel is written against these so a
complete point addition costs 3 wide multiplies + ~3 wide carry
resolutions regardless of how many lanes each carries.

Value contracts (multiples of p; see fp.py):
  mul inputs < 8p (pairwise product < 64 p^2), outputs < 2p
  add/dbl: lazy, bounds add; sub(a,b,k): a - b + k*p, needs k*p >= bound(b)
  Fp2 mul/sqr inputs < 4p (the nonresidue lane tightens the budget),
  outputs < 2p.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec, int_to_limbs


def _stack_run(op, pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]]) -> List:
    if len(pairs) == 1:
        return [op(pairs[0][0], pairs[0][1])]
    shape = jnp.broadcast_shapes(*[jnp.broadcast_shapes(a.shape, b.shape)
                                   for a, b in pairs])
    a = jnp.stack([jnp.broadcast_to(x, shape) for x, _ in pairs], axis=0)
    b = jnp.stack([jnp.broadcast_to(y, shape) for _, y in pairs], axis=0)
    out = op(a, b)
    return [out[i] for i in range(len(pairs))]


def _stack_map(op, items: Sequence[jnp.ndarray]) -> List:
    if len(items) == 1:
        return [op(items[0])]
    shape = jnp.broadcast_shapes(*[x.shape for x in items])
    a = jnp.stack([jnp.broadcast_to(x, shape) for x in items], axis=0)
    out = op(a)
    return [out[i] for i in range(len(items))]


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

    # lazy ops (value bounds add; digits grow)
    def add(self, a, b):
        return a + b

    def dbl(self, a):
        return a + a

    def mul_small(self, a, k: int):
        return _mul_small(self, a, k)

    # resolving ops
    def sub(self, a, b, k: int = 2):
        return fp.sub(self.spec, a, b, k=k)

    def sub_exact(self, a, b, k: int = 2):
        return fp.sub_exact(self.spec, a, b, k=k)

    def sub_many(self, pairs, k: int = 2):
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b, k=k), pairs)

    def neg(self, a, k: int = 2):
        return fp.neg(self.spec, a, k=k)

    def reduce2p_many(self, items, bound_k: int = 4):
        """Stacked value reduction to [0, 2p)."""
        return _stack_map(
            lambda x: fp.reduce_to_2p(self.spec, x, bound_k=bound_k), items
        )

    def mul(self, a, b):
        return fp.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return fp.mont_mul(self.spec, a, a)

    def mul_many(self, pairs):
        return _stack_run(lambda a, b: fp.mont_mul(self.spec, a, b), pairs)

    def is_zero(self, a, bound_k: int = 8):
        return fp.is_zero(self.spec, a, bound_k=bound_k)

    def select(self, mask, a, b):
        """mask ? a : b with mask of batch shape (broadcast over elem dims)."""
        return jnp.where(mask[..., None], a, b)

    def inv(self, a):
        return fp.inv(self.spec, a)

    def batch_inv(self, a):
        return fp.batch_inv(self.spec, a)


class Fp2Ops:
    """Device ops for Fq2 = Fq[u]/(u^2 - nonresidue) (G2 coordinates).

    Schoolbook multiplication with the nonresidue folded into a
    pre-multiplied lane:  c0 = a0*b0 + a1*(nr*b1), c1 = a0*b1 + a1*b0,
    where nr*b1 is one extra stacked Montgomery lane (exact, < 2p) —
    keeping every product within the 64 p^2 budget for inputs < 4p.
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

    # lazy ops: componentwise over the stacked axis
    def add(self, a, b):
        return a + b

    def dbl(self, a):
        return a + a

    def mul_small(self, a, k: int):
        return _mul_small(self, a, k)

    def sub(self, a, b, k: int = 2):
        return fp.sub(self.spec, a, b, k=k)

    def sub_exact(self, a, b, k: int = 2):
        return fp.sub_exact(self.spec, a, b, k=k)

    def sub_many(self, pairs, k: int = 2):
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b, k=k), pairs)

    def neg(self, a, k: int = 2):
        return fp.neg(self.spec, a, k=k)

    def reduce2p_many(self, items, bound_k: int = 4):
        return _stack_map(
            lambda x: fp.reduce_to_2p(self.spec, x, bound_k=bound_k), items
        )

    def mul_many(self, pairs):
        """Inputs: values < 4p.  Outputs: < 2p, exact digits."""
        s = self.spec
        # pre-multiply nr*b1 for every pair (one stacked mul, exact < 2p)
        nrb1 = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y),
            [(b[..., 1, :], self._nr_mont) for _, b in pairs],
        )
        fp_pairs = []
        for i, (a, b) in enumerate(pairs):
            a0, a1 = a[..., 0, :], a[..., 1, :]
            b0, b1 = b[..., 0, :], b[..., 1, :]
            fp_pairs += [(a0, b0), (a1, nrb1[i]), (a0, b1), (a1, b0)]
        outs = _stack_run(lambda x, y: fp.mont_mul(s, x, y), fp_pairs)
        # c0 = v00 + v1nr (< 4p lazy), c1 = v01 + v10 (< 4p lazy):
        # one stacked reduction to < 2p for all lanes' both coords
        lazies = []
        for i in range(len(pairs)):
            v00, v1nr, v01, v10 = outs[4 * i : 4 * i + 4]
            lazies.append(v00 + v1nr)
            lazies.append(v01 + v10)
        red = _stack_map(
            lambda x: fp.cond_sub(s, x, s.two_p_limbs), lazies
        )
        return [
            self._pack(red[2 * i], red[2 * i + 1]) for i in range(len(pairs))
        ]

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def sqr(self, a):
        return self.mul_many([(a, a)])[0]

    def is_zero(self, a, bound_k: int = 8):
        z = fp.is_zero(self.spec, a, bound_k=bound_k)
        return jnp.logical_and(z[..., 0], z[..., 1])

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def _norm(self, a):
        """a0^2 - nr*a1^2 (< 4p lazy) for inversion."""
        s = self.spec
        a0, a1 = a[..., 0, :], a[..., 1, :]
        negnr = jnp.asarray(
            np.array(
                int_to_limbs(
                    s.to_mont_int((-self.nr_int) % s.modulus), s.n_limbs
                ),
                dtype=np.uint32,
            )
        )
        pre = fp.mont_mul(s, a1, negnr)  # -nr * a1
        v0, w = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, a0), (a1, pre)]
        )
        return v0 + w  # a0^2 + (-nr)*a1^2 < 4p

    def inv(self, a):
        s = self.spec
        ninv = fp.inv(s, self._norm(a))
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0, c1m = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, ninv), (a1, ninv)]
        )
        return self._pack(c0, fp.neg(s, c1m, k=2))

    def batch_inv(self, a):
        s = self.spec
        ninv = fp.batch_inv(s, self._norm(a))
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0, c1m = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, ninv), (a1, ninv)]
        )
        return self._pack(c0, fp.neg(s, c1m, k=2))


def _mul_small(k, a, n: int):
    """a * n for small host ints, LAZY (value scales by n)."""
    assert n >= 0
    if n == 0:
        return k.zero(a.shape[: a.ndim - k.coord_ndim])
    acc = None
    base = a
    while n:
        if n & 1:
            acc = base if acc is None else acc + base
        n >>= 1
        if n:
            base = base + base
    return acc
