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
from groth16_tpu.fields.ops import Fp2Ops, FpOps
from groth16_tpu.fields.spec import FpSpec, encode, decode, make_spec


def g1_ops(c: CurveParams) -> CurveDevice:
    assert c.a == 0, (
        "device point kernels use a=0 complete formulas; "
        f"{c.name} (a={c.a}) proves on the exact engine"
    )
    return CurveDevice(
        FpOps(make_spec(c.p, name=f"{c.name}.Fq")), b3=3 * c.b % c.p
    )


def g2_ops(c: CurveParams) -> CurveDevice:
    if c.g2_over_base:
        # bw6-family: G2 over Fq itself — the same Fp point kernel as G1
        return CurveDevice(
            FpOps(make_spec(c.p, name=f"{c.name}.Fq")), b3=3 * c.b2 % c.p
        )
    b2_0, b2_1 = c.b2
    return CurveDevice(
        Fp2Ops(make_spec(c.p, name=f"{c.name}.Fq"), c.fp2_nonresidue),
        b3=(3 * b2_0 % c.p, 3 * b2_1 % c.p),
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
    """Affine G2 points ((c0,c1),(c0,c1)) -> projective device batch.
    For bw6-family curves G2 points are plain Fq pairs (same layout as
    G1)."""
    if c.g2_over_base:
        return g1_to_device(c, pts)
    spec = make_spec(c.p, name=f"{c.name}.Fq")

    def enc2(vals):  # list of (c0, c1) -> [L, 2, N]
        flat = []
        for v in vals:
            flat.extend(v)
        arr = encode(flat, spec)  # [L, 2N]; column 2i = c0_i, 2i+1 = c1_i
        arr = arr.reshape(spec.n_limbs, len(vals), 2).transpose(0, 2, 1)
        return jnp.asarray(np.ascontiguousarray(arr))

    xs = [p[0] if p is not None else (0, 0) for p in pts]
    ys = [p[1] if p is not None else (1, 0) for p in pts]
    inf = np.array([p is None for p in pts])
    x = enc2(xs)
    y = enc2(ys)
    one = encode([1, 0], spec).reshape(spec.n_limbs, 2, 1)
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
    x, y, inf = g.to_affine(pt)  # [L, 2, N]
    n = x.shape[-1]
    # -> [L, N, 2] so decode's row-major batch flattening interleaves
    # (c0_i, c1_i) pairs
    xs = decode(np.moveaxis(np.asarray(x), 1, 2), spec)
    ys = decode(np.moveaxis(np.asarray(y), 1, 2), spec)
    infs = np.asarray(inf)
    out = [
        None
        if infs[i]
        else ((xs[2 * i], xs[2 * i + 1]), (ys[2 * i], ys[2 * i + 1]))
        for i in range(n)
    ]
    return out[0] if single else out
