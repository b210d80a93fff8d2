"""Unified device field-op interface: Fp and Fp2 over the limb engine.

The curve/MSM layers are generic over a field-ops object `k` exposing the
lazy-digit op set (see fields/fp.py docstring for the digit/value-class
ledger) on limb tensors, so one complete-formula point kernel serves both
G1 (coords in Fq) and G2 (coords in Fq2).  This realizes the `ark-ec`
tower consumption described in SURVEY.md §2.2 ("Curve groups" row).

Element layouts (limb-major — see fields/fp.py):
  Fp : uint32[L, *batch]       (15-bit digits, Montgomery form)
  Fp2: uint32[L, 2, *batch]    (c0/c1 stacked on axis 1)
Coordinate axes LEAD and batch axes TRAIL, so batch-shaped masks
broadcast with no axis insertion, element gathers are uniform
`x[..., idx]`, and the minor (lane) axis is always a wide element axis.

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


def _bbc(x: jnp.ndarray, coord_ndim: int, batch_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Broadcast an element tensor (coords leading) to a full batch shape,
    inserting missing batch axes after the coord axes."""
    cs = x.shape[:coord_ndim]
    add = len(batch_shape) - (x.ndim - coord_ndim)
    x = x.reshape(cs + (1,) * add + x.shape[coord_ndim:])
    return jnp.broadcast_to(x, cs + tuple(batch_shape))


def _stack_run(op, pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]], cd: int) -> List:
    """Run `op` once over pairs stacked on a new batch axis at position
    `cd` (just after the coordinate axes)."""
    if len(pairs) == 1:
        return [op(pairs[0][0], pairs[0][1])]
    bshape = jnp.broadcast_shapes(
        *[jnp.broadcast_shapes(a.shape[cd:], b.shape[cd:]) for a, b in pairs]
    )
    a = jnp.stack([_bbc(x, cd, bshape) for x, _ in pairs], axis=cd)
    b = jnp.stack([_bbc(y, cd, bshape) for _, y in pairs], axis=cd)
    out = op(a, b)
    idx = (slice(None),) * cd
    return [out[idx + (i,)] for i in range(len(pairs))]


def _stack_map(op, items: Sequence[jnp.ndarray], cd: int) -> List:
    if len(items) == 1:
        return [op(items[0])]
    bshape = jnp.broadcast_shapes(*[x.shape[cd:] for x in items])
    a = jnp.stack([_bbc(x, cd, bshape) for x in items], axis=cd)
    out = op(a)
    idx = (slice(None),) * cd
    return [out[idx + (i,)] for i in range(len(items))]


class FpOps:
    """Device ops for the base prime field (G1 coordinates)."""

    tower_deg = 1

    def __init__(self, spec: FpSpec):
        self.spec = spec
        self.coord_ndim = 1  # leading dims per element: (L,)

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
        return fp.add(self.spec, a, b)

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
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b, k=k), pairs, 1)

    def neg(self, a, k: int = 2):
        return fp.neg(self.spec, a, k=k)

    def reduce2p_many(self, items, bound_k: int = 4):
        """Stacked value reduction to [0, 2p)."""
        return _stack_map(
            lambda x: fp.reduce_to_2p(self.spec, x, bound_k=bound_k), items, 1
        )

    def mul(self, a, b):
        return fp.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return fp.mont_mul(self.spec, a, a)

    def mul_many(self, pairs):
        return _stack_run(lambda a, b: fp.mont_mul(self.spec, a, b), pairs, 1)

    def is_zero(self, a, bound_k: int = 8):
        return fp.is_zero(self.spec, a, bound_k=bound_k)

    def select(self, mask, a, b):
        """mask ? a : b with mask of batch shape (trailing broadcast)."""
        return jnp.where(mask, a, b)

    def inv(self, a):
        return fp.inv(self.spec, a)

    def batch_inv(self, a):
        return fp.batch_inv(self.spec, a)


class Fp2Ops:
    """Device ops for Fq2 = Fq[u]/(u^2 - nonresidue) (G2 coordinates).

    Schoolbook multiplication with the nonresidue folded into a lazy
    post add-chain:  c0 = a0*b0 + nr*(a1*b1), c1 = a0*b1 + a1*b0 —
    keeping every product within the 64 p^2 budget for inputs < 4p.
    """

    tower_deg = 2

    def __init__(self, spec: FpSpec, nonresidue: int):
        self.spec = spec
        self.nr_int = nonresidue  # signed small int
        self.nonresidue = nonresidue % spec.modulus
        self.coord_ndim = 2  # leading dims per element: (L, 2)
        self._nr_mont = jnp.asarray(
            np.array(
                int_to_limbs(spec.to_mont_int(self.nonresidue), spec.n_limbs),
                dtype=np.uint32,
            )
        )

    def coord_shape(self):
        return (self.spec.n_limbs, 2)

    def _pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=1)

    def zero(self, shape=()):
        return fp.zeros(self.spec, (2,) + tuple(shape))

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
        return fp.add(self.spec, a, b)

    def dbl(self, a):
        return a + a

    def mul_small(self, a, k: int):
        return _mul_small(self, a, k)

    def sub(self, a, b, k: int = 2):
        return fp.sub(self.spec, a, b, k=k)

    def sub_exact(self, a, b, k: int = 2):
        return fp.sub_exact(self.spec, a, b, k=k)

    def sub_many(self, pairs, k: int = 2):
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b, k=k), pairs, 2)

    def neg(self, a, k: int = 2):
        return fp.neg(self.spec, a, k=k)

    def reduce2p_many(self, items, bound_k: int = 4):
        return _stack_map(
            lambda x: fp.reduce_to_2p(self.spec, x, bound_k=bound_k), items, 2
        )

    def mul_many(self, pairs):
        """Inputs: values < 4p.  Outputs: < 2p, exact digits.

        Schoolbook with the nonresidue applied as a post add-chain:
        c0 = v00 + nr*v11 (|nr| small on every registered curve), so all
        4k Fp multiplies land in ONE stacked call — no dependent
        pre-multiply in the latency chain.
        """
        s = self.spec
        nr = self.nr_int
        fp_pairs = []
        for a, b in pairs:
            a0, a1 = a[:, 0], a[:, 1]
            b0, b1 = b[:, 0], b[:, 1]
            fp_pairs += [(a0, b0), (a1, b1), (a0, b1), (a1, b0)]
        outs = _stack_run(lambda x, y: fp.mont_mul(s, x, y), fp_pairs, 1)
        c0s, c1s = [], []
        for i in range(len(pairs)):
            v00, v11, v01, v10 = outs[4 * i : 4 * i + 4]
            if abs(nr) <= 16:
                t = _fp_mul_small_lazy(v11, abs(nr))  # < 2|nr| p, lazy
                if nr < 0:
                    c0 = (v00, t, 2 * abs(nr))  # defer sub
                else:
                    c0 = (v00 + t, None, 2 + 2 * abs(nr))
            else:
                w = fp.mont_mul(s, v11, self._nr_mont)
                c0 = (fp.add(s, v00, w), None, 4)
            c0s.append(c0)
            c1s.append(v01 + v10)  # < 4p lazy
        # stacked sub for the negative-nr c0 lanes (one resolving call)
        if c0s and c0s[0][1] is not None:
            k = c0s[0][2]
            subs = _stack_run(
                lambda x, y: fp.sub(s, x, y, k=k),
                [(x, y) for x, y, _ in c0s],
                1,
            )
            bound = 2 + k
            c0_vals = subs
        else:
            bound = max(kk for _, _, kk in c0s)
            c0_vals = [x for x, _, _ in c0s]
        red0 = _stack_map(
            lambda x: fp.reduce_to_2p(s, x, bound_k=max(4, bound)), c0_vals, 1
        )
        red1 = _stack_map(
            lambda x: fp.cond_sub(s, x, s.two_p_limbs), c1s, 1
        )
        return [
            self._pack(red0[i], red1[i]) for i in range(len(pairs))
        ]

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def sqr(self, a):
        return self.mul_many([(a, a)])[0]

    def is_zero(self, a, bound_k: int = 8):
        # the component axis is just another batch axis to the limb engine
        z = fp.is_zero(self.spec, a, bound_k=bound_k)  # [2, *batch]
        return jnp.logical_and(z[0], z[1])

    def select(self, mask, a, b):
        return jnp.where(mask, a, b)

    def _norm(self, a):
        """a0^2 - nr*a1^2 (value < 8p, exact digits) for inversion."""
        s = self.spec
        a0, a1 = a[:, 0], a[:, 1]
        v0, v1 = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, a0), (a1, a1)], 1
        )
        nr = self.nr_int
        if abs(nr) <= 16:
            t = _fp_mul_small_lazy(v1, abs(nr))  # < 2|nr| p
            if nr < 0:
                out = v0 + t  # norm = a0^2 + |nr| a1^2, lazy
            else:
                out = fp.sub(s, v0, t, k=2 * nr)
            return fp.reduce_to_2p(s, out, bound_k=2 + 2 * abs(nr))
        w = fp.mont_mul(s, v1, self._nr_mont)
        # norm = v0 - nr*v1 with a general (positive-residue) nr constant
        return fp.sub(s, v0, w, k=2)

    def inv(self, a):
        s = self.spec
        ninv = fp.inv(s, self._norm(a))
        a0, a1 = a[:, 0], a[:, 1]
        c0, c1m = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, ninv), (a1, ninv)], 1
        )
        return self._pack(c0, fp.neg(s, c1m, k=2))

    def batch_inv(self, a):
        s = self.spec
        ninv = fp.batch_inv(s, self._norm(a))
        a0, a1 = a[:, 0], a[:, 1]
        c0, c1m = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y), [(a0, ninv), (a1, ninv)], 1
        )
        return self._pack(c0, fp.neg(s, c1m, k=2))


class Fp3Ops:
    """Device ops for Fq3 = Fq[v]/(v^3 - nonresidue) (MNT6 G2
    coordinates; SURVEY.md §2.2 "Curve groups" — the Fp3 twist tower the
    reference instantiates via ark-mnt6-298).

    Schoolbook multiplication (9 Fp products per Fp3 mul) with the
    cubic nonresidue folded into lazy add-chains, mirroring Fp2Ops:
      c0 = v00 + nr*(v12 + v21)
      c1 = v01 + v10 + nr*v22
      c2 = v02 + v11 + v20
    All Fp products land in ONE stacked limb-engine call.  Inversion by
    the adjugate method: a^-1 = (n0 + n1 v + n2 v^2) / N(a) with
      n0 = a0^2 - nr*a1*a2, n1 = nr*a2^2 - a0*a1, n2 = a1^2 - a0*a2,
      N(a) = a0*n0 + nr*(a2*n1 + a1*n2).
    """

    tower_deg = 3

    def __init__(self, spec: FpSpec, nonresidue: int):
        self.spec = spec
        self.nr_int = nonresidue  # signed small int
        self.nonresidue = nonresidue % spec.modulus
        self.coord_ndim = 2  # leading dims per element: (L, 3)
        self._nr_mont = jnp.asarray(
            np.array(
                int_to_limbs(spec.to_mont_int(self.nonresidue), spec.n_limbs),
                dtype=np.uint32,
            )
        )

    def coord_shape(self):
        return (self.spec.n_limbs, 3)

    def _pack(self, c0, c1, c2):
        return jnp.stack([c0, c1, c2], axis=1)

    def zero(self, shape=()):
        return fp.zeros(self.spec, (3,) + tuple(shape))

    def one(self, shape=()):
        z = fp.zeros(self.spec, shape)
        return self._pack(fp.const(self.spec, 1, shape), z, z)

    def const(self, value, shape=()):
        """value: int (embeds Fp) or (c0, c1, c2) triple."""
        if isinstance(value, tuple):
            c0, c1, c2 = value
        else:
            c0, c1, c2 = value, 0, 0
        return self._pack(
            fp.const(self.spec, c0, shape),
            fp.const(self.spec, c1, shape),
            fp.const(self.spec, c2, shape),
        )

    # lazy ops: componentwise over the stacked axis
    def add(self, a, b):
        return fp.add(self.spec, a, b)

    def dbl(self, a):
        return a + a

    def mul_small(self, a, k: int):
        return _mul_small(self, a, k)

    def sub(self, a, b, k: int = 2):
        return fp.sub(self.spec, a, b, k=k)

    def sub_exact(self, a, b, k: int = 2):
        return fp.sub_exact(self.spec, a, b, k=k)

    def sub_many(self, pairs, k: int = 2):
        return _stack_run(lambda a, b: fp.sub(self.spec, a, b, k=k), pairs, 2)

    def neg(self, a, k: int = 2):
        return fp.neg(self.spec, a, k=k)

    def reduce2p_many(self, items, bound_k: int = 4):
        return _stack_map(
            lambda x: fp.reduce_to_2p(self.spec, x, bound_k=bound_k), items, 2
        )

    def mul_many(self, pairs):
        """Inputs: values < 4p.  Outputs: < 2p, exact digits."""
        s = self.spec
        nr = self.nr_int
        fp_pairs = []
        for a, b in pairs:
            a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
            b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
            fp_pairs += [
                (a0, b0), (a1, b2), (a2, b1),  # -> c0
                (a0, b1), (a1, b0), (a2, b2),  # -> c1
                (a0, b2), (a1, b1), (a2, b0),  # -> c2
            ]
        outs = _stack_run(lambda x, y: fp.mont_mul(s, x, y), fp_pairs, 1)
        res = []
        for i in range(len(pairs)):
            (v00, v12, v21, v01, v10, v22,
             v02, v11, v20) = outs[9 * i : 9 * i + 9]
            c2 = v02 + v11 + v20  # < 6p lazy
            if abs(nr) <= 16:
                t0 = _fp_mul_small_lazy(v12 + v21, abs(nr))  # < 4|nr| p
                t1 = _fp_mul_small_lazy(v22, abs(nr))  # < 2|nr| p
                if nr < 0:
                    c0 = fp.sub(s, v00, t0, k=4 * abs(nr))
                    c1 = fp.sub(s, v01 + v10, t1, k=2 * abs(nr))
                    k0, k1 = 2 + 4 * abs(nr), 4 + 2 * abs(nr)
                else:
                    c0 = v00 + t0
                    c1 = v01 + v10 + t1
                    k0, k1 = 2 + 4 * abs(nr), 4 + 2 * abs(nr)
            else:
                w0, w1 = _stack_run(
                    lambda x, y: fp.mont_mul(s, x, y),
                    [(v12 + v21, self._nr_mont), (v22, self._nr_mont)],
                    1,
                )
                c0 = v00 + w0
                c1 = v01 + v10 + w1
                k0, k1 = 4, 6
            c0, c1, c2 = (
                fp.reduce_to_2p(s, c0, bound_k=max(4, k0)),
                fp.reduce_to_2p(s, c1, bound_k=max(4, k1)),
                fp.reduce_to_2p(s, c2, bound_k=6),
            )
            res.append(self._pack(c0, c1, c2))
        return res

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def sqr(self, a):
        return self.mul_many([(a, a)])[0]

    def is_zero(self, a, bound_k: int = 8):
        z = fp.is_zero(self.spec, a, bound_k=bound_k)  # [3, *batch]
        return jnp.logical_and(jnp.logical_and(z[0], z[1]), z[2])

    def select(self, mask, a, b):
        return jnp.where(mask, a, b)

    def _adjugate(self, a):
        """(n0, n1, n2, norm) per the class docstring; all < 2p exact."""
        s = self.spec
        nr = self.nr_int
        a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
        t0, t1, t2, t3, t4, t5 = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y),
            [(a0, a0), (a1, a1), (a2, a2), (a0, a1), (a0, a2), (a1, a2)],
            1,
        )

        def nr_mul(v, bound):  # v < bound*p -> nr*v, (lazy_val, bound)
            if abs(nr) <= 16:
                return _fp_mul_small_lazy(v, abs(nr)), bound * abs(nr)
            assert self.nonresidue is not None
            return fp.mont_mul(s, v, self._nr_mont), 2

        w5, k5 = nr_mul(t5, 2)
        w2, k2 = nr_mul(t2, 2)
        sign = -1 if (abs(nr) <= 16 and nr < 0) else 1
        if sign < 0:
            n0 = fp.reduce_to_2p(s, t0 + w5, bound_k=2 + k5)
            n1 = fp.neg(s, fp.reduce_to_2p(s, w2 + t3, bound_k=2 + k2), k=2)
        else:
            n0 = fp.reduce_to_2p(s, fp.sub(s, t0, w5, k=k5), bound_k=2 + k5)
            n1 = fp.reduce_to_2p(s, fp.sub(s, w2, t3, k=2), bound_k=k2 + 2)
        n2 = fp.reduce_to_2p(s, fp.sub(s, t1, t4, k=2), bound_k=4)
        m0, m1, m2 = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y),
            [(a0, n0), (a2, n1), (a1, n2)],
            1,
        )
        wn, kn = nr_mul(m1 + m2, 4)
        if sign < 0:
            norm = fp.reduce_to_2p(s, fp.sub(s, m0, wn, k=kn), bound_k=2 + kn)
        else:
            norm = fp.reduce_to_2p(s, m0 + wn, bound_k=2 + kn)
        return n0, n1, n2, norm

    def inv(self, a):
        s = self.spec
        n0, n1, n2, norm = self._adjugate(a)
        ninv = fp.inv(s, norm)
        c0, c1, c2 = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y),
            [(n0, ninv), (n1, ninv), (n2, ninv)],
            1,
        )
        return self._pack(c0, c1, c2)

    def batch_inv(self, a):
        s = self.spec
        n0, n1, n2, norm = self._adjugate(a)
        ninv = fp.batch_inv(s, norm)
        c0, c1, c2 = _stack_run(
            lambda x, y: fp.mont_mul(s, x, y),
            [(n0, ninv), (n1, ninv), (n2, ninv)],
            1,
        )
        return self._pack(c0, c1, c2)


def _fp_mul_small_lazy(a, n: int):
    """a * n (small host int >= 1) via lazy add chain on a raw Fp tensor."""
    assert n >= 1
    acc = None
    base = a
    while n:
        if n & 1:
            acc = base if acc is None else acc + base
        n >>= 1
        if n:
            base = base + base
    return acc


def _mul_small(k, a, n: int):
    """a * n for small host ints, LAZY (value scales by n)."""
    assert n >= 0
    if n == 0:
        return k.zero(a.shape[k.coord_ndim :])
    acc = None
    base = a
    while n:
        if n & 1:
            acc = base if acc is None else acc + base
        n >>= 1
        if n:
            base = base + base
    return acc
