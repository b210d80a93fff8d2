"""Host <-> device codecs for points and scalars.

Bridges the exact engine's representation (ints / (c0,c1) tuples, None for
infinity) and the device structure-of-arrays limb tensors.  Used at the
protocol boundary: proving keys are encoded once and stay device-resident
(the `ConstraintMatrices + assignment` prover shape of
/root/reference/src/prover.rs:26-51).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from groth16_tpu.curves.point import CurveDevice, Point
from groth16_tpu.curves.params import CurveParams
from groth16_tpu.fields.ops import Fp2Ops, Fp3Ops, FpOps
from groth16_tpu.fields.spec import FpSpec, encode, decode, make_spec


def g1_ops(c: CurveParams) -> CurveDevice:
    """a = 0 families run the fused RCB a=0 kernels; MNT (a = 2 / 11)
    routes to the generic-a complete formula inside CurveDevice."""
    return CurveDevice(
        FpOps(make_spec(c.p, name=f"{c.name}.Fq")),
        b3=3 * c.b % c.p,
        a=c.a % c.p,
    )


def g2_ops(c: CurveParams) -> CurveDevice:
    if c.g2_over_base:
        # bw6-family: G2 over Fq itself — the same Fp point kernel as G1
        return CurveDevice(
            FpOps(make_spec(c.p, name=f"{c.name}.Fq")), b3=3 * c.b2 % c.p
        )
    spec = make_spec(c.p, name=f"{c.name}.Fq")
    if c.g2_field_degree == 3:
        b2 = c.b2
        return CurveDevice(
            Fp3Ops(spec, c.fp2_nonresidue),
            b3=tuple(3 * x % c.p for x in b2),
            a=getattr(c, "a2", (0, 0, 0)),
        )
    b2_0, b2_1 = c.b2
    return CurveDevice(
        Fp2Ops(spec, c.fp2_nonresidue),
        b3=(3 * b2_0 % c.p, 3 * b2_1 % c.p),
        a=getattr(c, "a2", (0, 0)),
    )


def scalars_to_device(values: Sequence[int], fr_spec: FpSpec) -> jnp.ndarray:
    """Standard-form (non-Montgomery) scalar limbs for MSM digit slicing
    (the into_bigint analog, prover.rs:64)."""
    return jnp.asarray(encode(list(values), fr_spec, mont=False))


def g1_to_device(c: CurveParams, pts: Sequence[Optional[Tuple[int, int]]]) -> Point:
    """Affine G1 points -> projective device batch [L, N] (Z=1; None ->
    Z=0)."""
    spec = make_spec(c.p, name=f"{c.name}.Fq")
    xs = [p[0] if p is not None else 0 for p in pts]
    ys = [p[1] if p is not None else 1 for p in pts]
    inf = np.array([p is None for p in pts])
    x = jnp.asarray(encode(xs, spec))
    y = jnp.asarray(encode(ys, spec))
    one = encode([1], spec)  # [L, 1]
    z = jnp.asarray(np.where(inf[None, :], np.zeros_like(one), one))
    return (x, y, z)


def g2_to_device(c: CurveParams, pts) -> Point:
    """Affine G2 points (tower-coefficient tuples) -> projective device
    batch [L, d, N] for extension degree d (2 for bls/bn/mnt4, 3 for
    mnt6).  For bw6-family curves G2 points are plain Fq pairs (same
    layout as G1)."""
    if c.g2_over_base:
        return g1_to_device(c, pts)
    spec = make_spec(c.p, name=f"{c.name}.Fq")
    d = c.g2_field_degree

    def encd(vals):  # list of d-tuples -> [L, d, N]
        flat = []
        for v in vals:
            flat.extend(v)
        arr = encode(flat, spec)  # [L, d*N]; column d*i+j = cj_i
        arr = arr.reshape(spec.n_limbs, len(vals), d).transpose(0, 2, 1)
        return jnp.asarray(np.ascontiguousarray(arr))

    zero_t = (0,) * d
    one_t = (1,) + (0,) * (d - 1)
    xs = [p[0] if p is not None else zero_t for p in pts]
    ys = [p[1] if p is not None else one_t for p in pts]
    inf = np.array([p is None for p in pts])
    x = encd(xs)
    y = encd(ys)
    one = encode(list(one_t), spec).reshape(spec.n_limbs, d, 1)
    z = jnp.asarray(np.where(inf[None, None, :], np.zeros_like(one), one))
    return (x, y, z)


def g1_from_device(c: CurveParams, g: CurveDevice, pt: Point):
    """Device Jacobian batch (or single point) -> list of exact affine."""
    spec = g.k.spec
    single = pt[2].ndim == g.k.coord_ndim
    if single:
        pt = tuple(a[..., None] for a in pt)
    x, y, inf = g.to_affine(pt)
    xs = decode(np.asarray(x), spec)
    ys = decode(np.asarray(y), spec)
    infs = np.asarray(inf)
    out = [None if i else (xv, yv) for xv, yv, i in zip(xs, ys, infs)]
    return out[0] if single else out


def g2_from_device(c: CurveParams, g: CurveDevice, pt: Point):
    if c.g2_over_base:
        return g1_from_device(c, g, pt)
    spec = g.k.spec
    single = pt[2].ndim == g.k.coord_ndim
    if single:
        pt = tuple(a[..., None] for a in pt)
    x, y, inf = g.to_affine(pt)  # [L, d, N]
    d = x.shape[1]
    n = x.shape[-1]
    # -> [L, N, d] so decode's row-major batch flattening interleaves
    # per-point coefficient tuples
    xs = decode(np.moveaxis(np.asarray(x), 1, 2), spec)
    ys = decode(np.moveaxis(np.asarray(y), 1, 2), spec)
    infs = np.asarray(inf)
    out = [
        None
        if infs[i]
        else (
            tuple(xs[d * i : d * i + d]),
            tuple(ys[d * i : d * i + d]),
        )
        for i in range(n)
    ]
    return out[0] if single else out
