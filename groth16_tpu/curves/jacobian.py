"""Branchless Jacobian point arithmetic on limb tensors (device).

TPU-native realization of the `ark-ec` short-Weierstrass group ops the
reference consumes (SURVEY.md §2.2 "Curve groups"; call sites
/root/reference/src/prover.rs:127-130, src/verifier.rs:17-18).  One generic
kernel serves G1 (coords = FpOps) and G2 (coords = Fp2Ops).

Data model: a batch of points is a tuple (X, Y, Z) of limb tensors with a
shared batch shape; Z == 0 encodes infinity (X/Y contents are then
arbitrary but remain valid field encodings).  All special cases
(infinity operands, doubling, inverse cancellation) are resolved with
vector selects, never Python branches, so the ops compose under
jit/vmap/shard_map and every lane does identical work.

Formulas: dbl-2009-l and add-2007-bl for a = 0 curves (all registered
curves have a = 0), matching groth16_tpu/ref/group.py.  The H == 0
non-doubling case yields Z3 = 2*Z1*Z2*H = 0 (infinity) for free.

Every independent field multiply at the same dependency level is batched
into one stacked limb-engine call (`k.mul_many`), including the doubling
branch that `add` must compute anyway — a fused add+double costs 6 wide
multiply calls + a handful of batched add/sub calls, which keeps both the
XLA graph small and the VPU lanes full.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z)


class JacobianDevice:
    def __init__(self, k):
        self.k = k  # FpOps | Fp2Ops

    # -- constructors --------------------------------------------------------

    def infinity(self, shape=()) -> Point:
        k = self.k
        return (k.one(shape), k.one(shape), k.zero(shape))

    def from_affine(self, x, y, inf_mask=None) -> Point:
        """(x, y) limb tensors (+ optional bool infinity mask) -> Jacobian."""
        k = self.k
        shape = x.shape[: x.ndim - k.coord_ndim]
        z = k.one(shape)
        if inf_mask is not None:
            z = k.select(inf_mask, k.zero(shape), z)
        return (x, y, z)

    def batch_shape(self, pt: Point):
        return pt[2].shape[: pt[2].ndim - self.k.coord_ndim]

    # -- predicates ----------------------------------------------------------

    def is_infinity(self, pt: Point):
        return self.k.is_zero(pt[2])

    # -- select / reshape helpers --------------------------------------------

    def select(self, mask, a: Point, b: Point) -> Point:
        k = self.k
        return tuple(k.select(mask, x, y) for x, y in zip(a, b))

    def index(self, pt: Point, idx) -> Point:
        return tuple(c[idx] for c in pt)

    # -- group law -------------------------------------------------------------

    def neg(self, pt: Point) -> Point:
        return (pt[0], self.k.neg(pt[1]), pt[2])

    def double(self, pt: Point) -> Point:
        """dbl-2009-l; Z1 == 0 or Y1 == 0 gives Z3 == 0 (infinity) for free."""
        k = self.k
        X1, Y1, Z1 = pt
        y2 = k.dbl(Y1)
        A, B, Z3 = k.mul_many([(X1, X1), (Y1, Y1), (y2, Z1)])
        xb = k.add(X1, B)
        E = k.mul_small(A, 3)
        C, t, F = k.mul_many([(B, B), (xb, xb), (E, E)])
        D = k.dbl(k.sub(t, k.add(A, C)))
        X3 = k.sub(F, k.dbl(D))
        EY = k.mul(E, k.sub(D, X3))
        Y3 = k.sub(EY, k.mul_small(C, 8))
        return (X3, Y3, Z3)

    def add(self, p1: Point, p2: Point) -> Point:
        """add-2007-bl fused with the doubling branch, batched per level."""
        k = self.k
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        zsum, y2 = k.add_many([(Z1, Z2), (Y1, Y1)])
        # level 1: squares (+ doubling-branch A, B, Z3d)
        Z1Z1, Z2Z2, zs2, dA, dB, dZ3 = k.mul_many(
            [(Z1, Z1), (Z2, Z2), (zsum, zsum), (X1, X1), (Y1, Y1), (y2, Z1)]
        )
        xb = k.add(X1, dB)
        dE = k.mul_small(dA, 3)
        # level 2
        U1, U2, t1, t2, dC, dt, dF = k.mul_many(
            [(X1, Z2Z2), (X2, Z1Z1), (Z2, Z2Z2), (Z1, Z1Z1),
             (dB, dB), (xb, xb), (dE, dE)]
        )
        dD = k.dbl(k.sub(dt, k.add(dA, dC)))
        dX3 = k.sub(dF, k.dbl(dD))
        # level 3
        S1, S2, dEY = k.mul_many([(Y1, t1), (Y2, t2), (dE, k.sub(dD, dX3))])
        H, dS = k.sub_many([(U2, U1), (S2, S1)])
        rr = k.dbl(dS)
        dY3 = k.sub(dEY, k.mul_small(dC, 8))
        # level 4
        HH, rr2, zz = k.mul_many(
            [(H, H), (rr, rr), (k.sub(zs2, k.add(Z1Z1, Z2Z2)), H)]
        )
        I = k.dbl(k.dbl(HH))
        # level 5: J = H*I, V = U1*I; Z3 = 2*Z1*Z2*H = zz
        J, V = k.mul_many([(H, I), (U1, I)])
        X3 = k.sub(rr2, k.add(J, k.dbl(V)))
        # level 6
        rv, sj = k.mul_many([(rr, k.sub(V, X3)), (S1, J)])
        Y3 = k.sub(rv, k.dbl(sj))
        res = (X3, Y3, zz)

        # doubling lane: U1 == U2 and S1 == S2 (H = 0 & dS = 0)
        same_x = k.is_zero(H)
        same_y = k.is_zero(dS)
        res = self.select(
            jnp.logical_and(same_x, same_y), (dX3, dY3, dZ3), res
        )
        # infinity operands (last so they win over the garbage lanes)
        res = self.select(self.is_infinity(p2), p1, res)
        res = self.select(self.is_infinity(p1), p2, res)
        return res

    def add_mixed(self, p1: Point, x2, y2, inf2=None) -> Point:
        """p1 + affine(x2, y2): madd-2007-bl (Z2 = 1), fused + batched.

        inf2: optional bool mask marking affine infinity entries.
        """
        k = self.k
        X1, Y1, Z1 = p1
        yy2 = k.dbl(Y1)
        Z1Z1, dA, dB, dZ3 = k.mul_many(
            [(Z1, Z1), (X1, X1), (Y1, Y1), (yy2, Z1)]
        )
        xb = k.add(X1, dB)
        dE = k.mul_small(dA, 3)
        U2, t2, dC, dt, dF = k.mul_many(
            [(x2, Z1Z1), (Z1, Z1Z1), (dB, dB), (xb, xb), (dE, dE)]
        )
        dD = k.dbl(k.sub(dt, k.add(dA, dC)))
        dX3 = k.sub(dF, k.dbl(dD))
        S2, dEY = k.mul_many([(y2, t2), (dE, k.sub(dD, dX3))])
        H = k.sub(U2, X1)
        dS = k.sub(S2, Y1)
        rr = k.dbl(dS)
        dY3 = k.sub(dEY, k.mul_small(dC, 8))
        HH, rr2, Z3 = k.mul_many([(H, H), (rr, rr), (k.dbl(Z1), H)])
        I = k.dbl(k.dbl(HH))
        J, V = k.mul_many([(H, I), (X1, I)])
        X3 = k.sub(rr2, k.add(J, k.dbl(V)))
        rv, sj = k.mul_many([(rr, k.sub(V, X3)), (Y1, J)])
        Y3 = k.sub(rv, k.dbl(sj))
        res = (X3, Y3, Z3)

        same_x = k.is_zero(H)
        same_y = k.is_zero(dS)
        res = self.select(
            jnp.logical_and(same_x, same_y), (dX3, dY3, dZ3), res
        )
        p2 = self.from_affine(x2, y2, inf2)
        if inf2 is not None:
            res = self.select(inf2, p1, res)
        res = self.select(self.is_infinity(p1), p2, res)
        return res

    # -- conversions -----------------------------------------------------------

    def to_affine(self, pt: Point):
        """Batch Jacobian -> affine; returns (x, y, inf_mask).

        Uses one batched Fermat inverse over the leading axis (Montgomery
        batch inversion in k.batch_inv) — the analog of arkworks'
        `into_affine` batch normalization (prover.rs:127-130).
        """
        k = self.k
        X, Y, Z = pt
        inf = self.is_infinity(pt)
        zsafe = k.select(inf, k.one(self.batch_shape(pt)), Z)
        zinv = k.batch_inv(zsafe) if X.ndim - k.coord_ndim >= 1 else k.inv(zsafe)
        zinv2 = k.sqr(zinv)
        x = k.mul(X, zinv2)
        y = k.mul(Y, k.mul(zinv2, zinv))
        shape = self.batch_shape(pt)
        x = k.select(inf, k.zero(shape), x)
        y = k.select(inf, k.zero(shape), y)
        return x, y, inf

    # -- reductions --------------------------------------------------------------

    def tree_reduce(self, pt: Point) -> Point:
        """Sum a [N, ...] batch of points down to a single point, log2(N)
        rounds of halving vector adds (N padded to a power of two with
        infinities).  For large N prefer msm.scans.reduce_points (O(1)
        graph)."""
        k = self.k
        n = pt[2].shape[0]
        m = 1
        while m < n:
            m <<= 1
        if m != n:
            pad = self.infinity((m - n,) + self.batch_shape(pt)[1:])
            pt = tuple(
                jnp.concatenate([c, p], axis=0) for c, p in zip(pt, pad)
            )
        while m > 1:
            h = m // 2
            lo = self.index(pt, slice(0, h))
            hi = self.index(pt, slice(h, m))
            pt = self.add(lo, hi)
            m = h
        return self.index(pt, 0)

    def scalar_mul_bits(self, pt: Point, bits: jnp.ndarray) -> Point:
        """Per-lane variable scalar mul: bits uint32[..., nbits] little-endian
        (static bit count).  lax.fori_loop double-and-add — O(1) graph."""
        import jax

        nbits = bits.shape[-1]
        acc = self.infinity(self.batch_shape(pt))

        def body(i, carry):
            acc, base = carry
            take = (bits[..., i] & 1).astype(jnp.bool_)
            acc = self.select(take, self.add(acc, base), acc)
            base = self.double(base)
            return (acc, base)

        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, pt))
        return acc
