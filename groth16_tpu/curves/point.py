"""Complete projective point arithmetic on limb tensors (device).

TPU-native realization of the `ark-ec` short-Weierstrass group ops the
reference consumes (SURVEY.md §2.2 "Curve groups"; call sites
/root/reference/src/prover.rs:127-130, src/verifier.rs:17-18).  One
generic kernel serves G1 (coords = FpOps) and G2 (coords = Fp2Ops).

Formulas: the Renes-Costello-Batina complete addition law for a = 0
short-Weierstrass curves (homogeneous projective coordinates, 12
multiplies, algorithm 7 of eprint 2015/1060's scheme).  "Complete" means
ONE straight-line formula covers generic addition, doubling, inverses and
the point at infinity (0 : 1 : 0) for all points of the odd-order
subgroup — no selects, no is_zero lanes, no doubling branch.  That is the
perfect shape for a TPU kernel: every lane executes identical code, and
the sum/double special-case machinery that dominated the Jacobian
kernel's graph disappears.

Scope: all protocol points live in the prime-order subgroup (the only
regime Groth16 touches), where the law is total.

Data model: a batch of points is (X, Y, Z) limb tensors with a shared
batch shape; infinity is exactly (0, 1, 0).  Coordinate (limb/tower)
axes LEAD and batch axes TRAIL (see fields/fp.py) so batch masks
broadcast plainly and element gathers are uniform `c[..., idx]`.
Coordinates hold values in [0, 2p) with resolved digits; all laziness is
internal to one addition.

Level batching: the 12 multiplies fold into 3 stacked limb-engine calls
(6 + 2 + 6 lanes); the subtractions into 3 resolving calls; the final
coordinate reduction into 1.  Product bounds stay <= 36 p^2 (< 64 p^2 =
the engine's budget); see inline ledger.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z)


class CurveDevice:
    def __init__(self, k, b3, a=0):
        """k: FpOps | Fp2Ops | Fp3Ops; b3: 3*b curve constant (int or
        tower tuple); a: curve coefficient (0 for every pairing family
        except MNT — a != 0 routes `add` to the generic-a complete
        formula, eprint 2015/1060 algorithm 1)."""
        self.k = k
        self.b3_val = b3
        self.b3 = k.const(b3)
        self.a_val = a
        self.a_is_zero = (
            a == 0 or (isinstance(a, tuple) and all(c == 0 for c in a))
        )
        self.a_c = None if self.a_is_zero else k.const(a)

    # -- constructors --------------------------------------------------------

    def infinity(self, shape=()) -> Point:
        k = self.k
        return (k.zero(shape), k.one(shape), k.zero(shape))

    def from_affine(self, x, y, inf_mask=None) -> Point:
        """(x, y) limb tensors (+ optional bool infinity mask) -> projective."""
        k = self.k
        shape = x.shape[k.coord_ndim :]
        z = k.one(shape)
        if inf_mask is not None:
            x = k.select(inf_mask, k.zero(shape), x)
            y = k.select(inf_mask, k.one(shape), y)
            z = k.select(inf_mask, k.zero(shape), z)
        return (x, y, z)

    def batch_shape(self, pt: Point):
        return pt[2].shape[self.k.coord_ndim :]

    # -- predicates ----------------------------------------------------------

    def is_infinity(self, pt: Point):
        return self.k.is_zero(pt[2], bound_k=2)

    # -- select / reshape helpers --------------------------------------------

    def select(self, mask, a: Point, b: Point) -> Point:
        k = self.k
        return tuple(k.select(mask, x, y) for x, y in zip(a, b))

    def index(self, pt: Point, idx) -> Point:
        """Select along the leading batch axis (batch axes trail the
        coordinate axes, so this is `c[..., idx]`; 1-D batches only)."""
        return tuple(c[..., idx] for c in pt)

    # -- group law -------------------------------------------------------------

    def neg(self, pt: Point) -> Point:
        return (pt[0], self.k.neg(pt[1], k=2), pt[2])

    def _fused_add(self, p1: Point, p2: Point):
        """Dispatch to the fused Pallas RCB kernel (curves/pallas_point.py)
        when profitable: Fp coords (G1), TPU backend, one uniform batch
        shape whose flattened size blocks cleanly.  Returns None to fall
        through to the stacked XLA path (bit-identical results)."""
        from groth16_tpu.config import CONFIG, pallas_enabled

        k = self.k
        if not pallas_enabled() or not self.a_is_zero:
            return None
        deg = getattr(k, "tower_deg", 1)
        if deg == 3:
            return None
        is_fp2 = deg == 2
        if is_fp2 and not (1 <= abs(getattr(k, "nr_int", 0)) <= 16):
            return None
        shapes = {x.shape for x in p1} | {x.shape for x in p2}
        if len(shapes) != 1:
            return None
        shape = shapes.pop()
        n = 1
        for d in shape[k.coord_ndim :]:
            n *= d
        if n < CONFIG.pallas_min_elems:
            return None
        blk = min(CONFIG.pallas_block, n & -n)
        if blk < 128:
            return None
        L = shape[0]
        if is_fp2:
            from groth16_tpu.curves.pallas_point import add_g2_pallas

            out = add_g2_pallas(
                k.spec,
                k.nr_int,
                self.b3_val,
                tuple(x.reshape(L, 2, n) for x in p1),
                tuple(x.reshape(L, 2, n) for x in p2),
                blk,
            )
        else:
            from groth16_tpu.curves.pallas_point import add_g1_pallas

            out = add_g1_pallas(
                k.spec,
                self.b3_val,
                tuple(x.reshape(L, n) for x in p1),
                tuple(x.reshape(L, n) for x in p2),
                blk,
            )
        return tuple(x.reshape(shape) for x in out)

    def add(self, p1: Point, p2: Point) -> Point:
        """Complete addition (RCB a=0).  Inputs/outputs: coords < 2p exact.

        Value ledger (multiples of p): pre-adds < 4p; M1 products
        <= 16p^2; t3/t4/t5 < 6p; t0t < 6p; M2 <= 6p^2; Z3s/t1m < 4p;
        M3 products <= 36p^2; X3/Y3/Z3 pre-reduce < 4p.
        """
        if not self.a_is_zero:
            return self._add_general(p1, p2)
        fused = self._fused_add(p1, p2)
        if fused is not None:
            return fused
        k = self.k
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        t0, t1, t2, m3, m4, m5 = k.mul_many(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (X1 + Y1, X2 + Y2),
                (Y1 + Z1, Y2 + Z2),
                (X1 + Z1, X2 + Z2),
            ]
        )
        t3, t4, t5 = k.sub_many(
            [(m3, t0 + t1), (m4, t1 + t2), (m5, t0 + t2)], k=4
        )  # X1Y2+X2Y1, Y1Z2+Y2Z1, X1Z2+X2Z1; each < 6p
        t0t = t0 + t0 + t0  # 3*X1X2 < 6p lazy
        t2b, t5b = k.mul_many([(t2, self.b3), (t5, self.b3)])
        Z3s = t1 + t2b  # < 4p lazy
        t1m = k.sub_exact(t1, t2b, k=2)  # < 4p exact
        w0, w1, w2, w3, w4, w5 = k.mul_many(
            [
                (t4, t5b),
                (t3, t1m),
                (t5b, t0t),
                (t1m, Z3s),
                (t0t, t3),
                (Z3s, t4),
            ]
        )
        X3 = k.sub_exact(w1, w0, k=2)  # < 4p
        Y3 = w3 + w2  # < 4p lazy
        Z3 = w5 + w4  # < 4p lazy
        X3, Y3, Z3 = k.reduce2p_many([X3, Y3, Z3], bound_k=4)
        return (X3, Y3, Z3)

    def _add_general(self, p1: Point, p2: Point) -> Point:
        """Complete addition for arbitrary a (RCB algorithm 1 of eprint
        2015/1060): 12 generic multiplies + 3 mul-by-a + 2 mul-by-b3,
        stacked into 4 limb-engine calls.  Serves the MNT families
        (a = 2 / 11) on device — the reference reaches these through
        ark-mnt4/6-298 (/root/reference/Cargo.toml:35-36).

        Value ledger (multiples of p): xy/xz/yz < 6p; d < 4p;
        X3t/Z3t < 6p; e < 8p; t2m < 4p; f < 4p; round-4 products
        <= 48 p^2 (< 64 p^2 budget); outputs < 4p pre-reduce.
        """
        k = self.k
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        t0, t1, t2, m3, m4, m5 = k.mul_many(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (X1 + Y1, X2 + Y2),
                (Y1 + Z1, Y2 + Z2),
                (X1 + Z1, X2 + Z2),
            ]
        )
        xy, yz, xz = k.sub_many(
            [(m3, t0 + t1), (m4, t1 + t2), (m5, t0 + t2)], k=4
        )  # X1Y2+X2Y1, Y1Z2+Y2Z1, X1Z2+X2Z1; each < 6p
        axz, b3z, az, b3xz = k.mul_many(
            [(xz, self.a_c), (t2, self.b3), (t2, self.a_c), (xz, self.b3)]
        )
        d = axz + b3z  # a*xz + b3*Z1Z2, < 4p lazy
        X3t = k.sub(t1, d, k=4)  # Y1Y2 - d, < 6p
        Z3t = t1 + d  # Y1Y2 + d, < 6p lazy
        e = t0 + t0 + t0 + az  # 3*X1X2 + a*Z1Z2, < 8p lazy
        t2m = k.sub(t0, az, k=2)  # X1X2 - a*Z1Z2, < 4p
        (at2m,) = k.mul_many([(t2m, self.a_c)])
        f = b3xz + at2m  # b3*xz + a*(X1X2 - a*Z1Z2), < 4p lazy
        y3a, ef, w0, xyx3, xye, yzz3 = k.mul_many(
            [
                (X3t, Z3t),
                (e, f),
                (yz, f),
                (xy, X3t),
                (xy, e),
                (yz, Z3t),
            ]
        )
        Y3 = y3a + ef  # < 4p lazy
        X3 = k.sub_exact(xyx3, w0, k=2)  # < 4p
        Z3 = yzz3 + xye  # < 4p lazy
        X3, Y3, Z3 = k.reduce2p_many([X3, Y3, Z3], bound_k=4)
        return (X3, Y3, Z3)

    def double(self, pt: Point) -> Point:
        """Complete doubling = add(P, P) (one code path, same cost)."""
        return self.add(pt, pt)

    def add_mixed(self, p1: Point, x2, y2, inf2=None) -> Point:
        """p1 + affine(x2, y2) via the complete law."""
        return self.add(p1, self.from_affine(x2, y2, inf2))

    def add_affine(self, p1: Point, xy2) -> Point:
        """p1 + affine (x2, y2) with infinity encoded (0, 0) — the MSM
        suffix-scan hot op.  Pallas mixed kernel (13 muls, no Z2 plane)
        when profitable; XLA fallback = complete add of the
        reconstructed projective point (equal mod p; representatives may
        differ only by the usual < 2p redundancy)."""
        x2, y2 = xy2
        fused = self._fused_add_affine(p1, xy2)
        if fused is not None:
            return fused
        k = self.k
        inf2 = k.is_zero(y2, bound_k=2)
        return self.add(p1, self.from_affine(x2, y2, inf2))

    def _fused_add_affine(self, p1: Point, xy2):
        from groth16_tpu.config import CONFIG, pallas_enabled

        k = self.k
        if not pallas_enabled() or not self.a_is_zero:
            return None
        deg = getattr(k, "tower_deg", 1)
        if deg == 3:
            return None
        is_fp2 = deg == 2
        if is_fp2 and not (1 <= abs(getattr(k, "nr_int", 0)) <= 16):
            return None
        shapes = {x.shape for x in p1} | {x.shape for x in xy2}
        if len(shapes) != 1:
            return None
        shape = shapes.pop()
        n = 1
        for d in shape[k.coord_ndim :]:
            n *= d
        if n < CONFIG.pallas_min_elems:
            return None
        blk = min(CONFIG.pallas_block, n & -n)
        if blk < 128:
            return None
        L = shape[0]
        if is_fp2:
            from groth16_tpu.curves.pallas_point import add_mixed_g2_pallas

            out = add_mixed_g2_pallas(
                k.spec,
                k.nr_int,
                self.b3_val,
                tuple(x.reshape(L, 2, n) for x in p1),
                tuple(x.reshape(L, 2, n) for x in xy2),
                blk,
            )
        else:
            from groth16_tpu.curves.pallas_point import add_mixed_g1_pallas

            out = add_mixed_g1_pallas(
                k.spec,
                self.b3_val,
                tuple(x.reshape(L, n) for x in p1),
                tuple(x.reshape(L, n) for x in xy2),
                blk,
            )
        return tuple(x.reshape(shape) for x in out)

    # -- conversions -----------------------------------------------------------

    def to_affine(self, pt: Point):
        """Batch projective -> affine; returns (x, y, inf_mask).

        One batched Fermat inverse over the leading axis — the analog of
        arkworks' `into_affine` batch normalization (prover.rs:127-130).
        """
        k = self.k
        X, Y, Z = pt
        inf = self.is_infinity(pt)
        zsafe = k.select(inf, k.one(self.batch_shape(pt)), Z)
        zinv = k.batch_inv(zsafe) if X.ndim - k.coord_ndim >= 1 else k.inv(zsafe)
        x = k.mul(X, zinv)
        y = k.mul(Y, zinv)
        shape = self.batch_shape(pt)
        x = k.select(inf, k.zero(shape), x)
        y = k.select(inf, k.zero(shape), y)
        return x, y, inf

    # -- reductions --------------------------------------------------------------

    def tree_reduce(self, pt: Point) -> Point:
        """Sum an [N]-batch of points down to a single point, log2(N)
        rounds of halving vector adds (N padded to a power of two with
        infinities).  For large N prefer msm.scans.reduce_points (O(1)
        graph)."""
        n = pt[2].shape[-1]
        m = 1
        while m < n:
            m <<= 1
        if m != n:
            pad = self.infinity(self.batch_shape(pt)[:-1] + (m - n,))
            pt = tuple(
                jnp.concatenate([c, p], axis=-1) for c, p in zip(pt, pad)
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
        nbits = bits.shape[-1]
        acc = self.infinity(self.batch_shape(pt))

        def body(i, carry):
            acc, base = carry
            take = (bits[..., i] & 1).astype(jnp.bool_)
            acc = self.select(take, self.add(acc, base), acc)
            base = self.add(base, base)
            return (acc, base)

        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, pt))
        return acc


# Backwards-compatible alias (the engine moved from Jacobian to complete
# projective formulas; the interface is unchanged).
JacobianDevice = CurveDevice
