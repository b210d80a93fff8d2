"""Component-level timing of the G1 MSM hot path on the attached TPU.

Mirrors msm/pippenger.py's group_sums pipeline stage by stage (digits,
sort, gather, capture scan, tail reduce, Horner) so each stage's share
of the 4-lane 2^16 MSM wall-clock is visible.  One-off diagnostic; the
production path stays msm_device_lanes.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

from groth16_tpu.config import CONFIG
from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import make_spec
from groth16_tpu.msm import pippenger as pip
from groth16_tpu.msm.pippenger import (
    _pad_size,
    choose_window_bits,
    signed_window_digits,
)
from groth16_tpu.msm.scans import (
    _pick_chunks,
    _roll,
    reduce_points,
    scan_points,
    scan_storage_mixed_capture,
)

CURVE = "bn254"
LOG_N = int(os.environ.get("LOG_N", "16"))
LANES = 4


def timeit(label, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return out


def main():
    c = get_curve(CURVE)
    g = codec.g1_ops(c)
    fq = make_spec(c.p, name=f"{CURVE}.Fq")
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    n = 1 << LOG_N
    sbits = c.r.bit_length()
    signed = CONFIG.msm_signed_digits
    cbits = choose_window_bits(n, sbits, signed)
    print(f"n=2^{LOG_N} lanes={LANES} c={cbits} signed={signed}")

    # points: generator broadcast (values don't affect timing); scalars random
    from groth16_tpu.fields.spec import encode

    from groth16_tpu.ref.curve import sample_point_fp

    gx, gy = sample_point_fp(c.p, c.b)
    L = fq.n_limbs
    x = jnp.broadcast_to(jnp.asarray(encode([gx], fq))[:, :, None], (L, LANES, n))
    y = jnp.broadcast_to(jnp.asarray(encode([gy], fq))[:, :, None], (L, LANES, n))
    z = jnp.broadcast_to(jnp.asarray(encode([1], fq))[:, :, None], (L, LANES, n))
    pts = (x, y, z)
    rng = np.random.RandomState(0)
    Ls = fr.n_limbs
    scal = rng.randint(0, 1 << 15, size=(LANES, Ls, n)).astype(np.uint32)
    top = sbits - 15 * (Ls - 1)
    scal[:, -1, :] &= (1 << max(0, top)) - 1 if top > 0 else 0
    scalars = jnp.asarray(scal)

    # full MSM
    f_full = jax.jit(
        lambda p, s: pip.msm_device_lanes(g, p, s, sbits)
    )
    timeit("full msm_device_lanes", f_full, pts, scalars, reps=3)

    # --- stages -----------------------------------------------------------
    npad = _pad_size(n)
    B = (1 << (cbits - 1)) + 1 if signed else 1 << cbits
    num_windows = -(-sbits // cbits) + (1 if signed else 0)
    C = _pick_chunks(npad, 4096)
    K = npad // C
    ce = 1
    for d in g.k.coord_shape():
        ce *= d
    bytes_per_window = LANES * npad * ce * 3 * 4
    wg = max(1, min(num_windows, CONFIG.msm_group_bytes // bytes_per_window))
    n_groups = -(-num_windows // wg)
    print(f"npad={npad} B={B} W={num_windows} wg={wg} groups={n_groups} C={C} K={K}")

    # digits
    f_digits = jax.jit(
        lambda s: jax.vmap(lambda q: signed_window_digits(q, cbits, sbits))(s)
    )
    digits_all, signs_all = timeit("digits+recode", f_digits, scalars)

    # build em plane (element-major affine rows)
    def build_em(p):
        inf_mask = g.is_infinity(p)
        zero_xy = g.k.zero((LANES, npad))
        x_aff = g.k.select(inf_mask, zero_xy, p[0])
        y_aff = g.k.select(inf_mask, zero_xy, p[1])
        em = jnp.concatenate(
            [
                jnp.moveaxis(x_aff.reshape(ce, LANES, npad), 0, -1),
                jnp.moveaxis(y_aff.reshape(ce, LANES, npad), 0, -1),
            ],
            axis=-1,
        )
        negy = g.k.select(inf_mask, zero_xy, g.k.neg(p[1], k=1))
        em2 = jnp.concatenate(
            [
                jnp.moveaxis(x_aff.reshape(ce, LANES, npad), 0, -1),
                jnp.moveaxis(negy.reshape(ce, LANES, npad), 0, -1),
            ],
            axis=-1,
        )
        return jnp.concatenate([em, em2], axis=1)

    em = timeit("build em planes", jax.jit(build_em), pts)

    idx_bits = max(1, (npad - 1).bit_length())
    extra = 1
    shift = extra + idx_bits
    packed = cbits + extra + idx_bits <= 32
    print(f"packed={packed} shift={shift}")
    iota_b = jnp.broadcast_to(
        jnp.arange(npad, dtype=jnp.uint32), (LANES, wg, npad)
    )

    dg = digits_all[:, :wg, :]
    sg = signs_all[:, :wg, :]

    # sort
    def do_sort(dgg, sgg):
        key = (dgg << shift) | iota_b | (sgg << idx_bits)
        return jax.lax.sort(key, dimension=2)

    f_sort = jax.jit(do_sort)
    sorted_keys = timeit("sort (one group)", f_sort, dg, sg)

    # searchsorted
    v_targets = jnp.broadcast_to(
        jnp.arange(1, B, dtype=jnp.uint32) << shift, (LANES * wg, B - 1)
    )

    def do_ss(sk):
        return jax.vmap(lambda d, v: jnp.searchsorted(d, v, side="left"))(
            sk.reshape(LANES * wg, npad), v_targets
        )

    first_ge = timeit("searchsorted", jax.jit(do_ss), sorted_keys)

    # gather
    def do_gather(sk):
        gidx = sk & jnp.uint32((1 << idx_bits) - 1)
        gidx = gidx + ((sk >> idx_bits) & 1) * jnp.uint32(npad)
        order_t = jnp.swapaxes(
            gidx.astype(jnp.int32).reshape(LANES, wg, C, K), -1, -2
        ).reshape(LANES, wg, npad)
        rows = jnp.take_along_axis(
            em[:, None, :, :], order_t[..., None], axis=2
        )
        back = jnp.moveaxis(rows, -1, 0)
        cs = g.k.coord_shape()
        xg = back[:ce].reshape(cs + (LANES, wg, npad))
        yg = back[ce:].reshape(cs + (LANES, wg, npad))
        return xg, yg

    xg, yg = timeit("gather rows + transpose back", jax.jit(do_gather), sorted_keys)

    # capture scan
    fg = first_ge.reshape(LANES, wg, B - 1)
    valid = fg < npad
    j = jnp.minimum(fg, npad - 1).astype(jnp.int32)
    jk, jc = j % K, j // K

    def do_scan(xgg, ygg, jkk, jcc):
        return scan_storage_mixed_capture(g, (xgg, ygg), K, C, jkk, jcc, reverse=True)

    cap, totals = timeit("capture scan (K steps)", jax.jit(do_scan), xg, yg, jk, jc)

    # pure scan without capture, for the capture overhead delta
    def do_scan_nocap(xgg, ygg):
        jk0 = jnp.zeros((LANES, wg, 1), jnp.int32)
        jc0 = jnp.zeros((LANES, wg, 1), jnp.int32)
        return scan_storage_mixed_capture(g, (xgg, ygg), K, C, jk0, jc0, reverse=True)

    timeit("scan only (T=1 capture)", jax.jit(do_scan_nocap), xg, yg)

    # cross + tail reduce
    l_iota = jnp.broadcast_to(
        jnp.arange(LANES, dtype=jnp.int32)[:, None, None], (LANES, wg, B - 1)
    )
    w_iota = jnp.broadcast_to(
        jnp.arange(wg, dtype=jnp.int32)[None, :, None], (LANES, wg, B - 1)
    )

    def do_tail(capp, tots, jcc):
        cross_incl = scan_points(g, tots, reverse=True, max_chunks=512)
        cross_excl = _roll(cross_incl, -1)
        cmask = jnp.arange(C) < C - 1
        cross_excl = g.select(cmask, cross_excl, g.infinity((LANES, wg, C)))
        gv = g.add(capp, tuple(t[..., l_iota, w_iota, jcc] for t in cross_excl))
        gv = g.select(valid, gv, g.infinity((LANES, wg, B - 1)))
        m = B - 1
        tgt = 1 << (m - 1).bit_length()
        if tgt != m:
            gv = tuple(
                jnp.concatenate([q, i], axis=-1)
                for q, i in zip(gv, g.infinity((LANES, wg, tgt - m)))
            )
        return reduce_points(g, gv)

    sums = timeit("cross + bucket tail reduce", jax.jit(do_tail), cap, totals, jc)

    # Horner over W windows
    sums_rows = tuple(
        jnp.broadcast_to(q[..., None], q.shape + (num_windows,)) for q in sums
    )
    sums_rows = tuple(jnp.moveaxis(q.reshape(q.shape[:-2] + (LANES * wg, num_windows))[..., :LANES, :], -1, 0) for q in sums_rows)

    def do_horner(rows):
        def hstep(res, wsum):
            res = jax.lax.fori_loop(0, cbits, lambda i, p: g.double(p), res)
            return g.add(res, wsum), None

        res, _ = jax.lax.scan(hstep, g.infinity((LANES,)), rows, reverse=True)
        return res

    timeit("horner (W windows x c doublings)", jax.jit(do_horner), sums_rows)

    # kernel ceilings
    from groth16_tpu.fields.pallas_fp import mont_mul_pallas

    NN = 1 << 19
    aa = jnp.broadcast_to(jnp.asarray(encode([gx], fq)), (L, NN))  # [L,1]->[L,NN] ok
    f_mm = jax.jit(lambda u: mont_mul_pallas(fq, u, u, CONFIG.pallas_block))
    t0 = None
    f_mm_c = jax.block_until_ready(f_mm(aa))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f_mm(aa))
        ts.append(time.time() - t0)
    print(f"mont_mul_pallas: {NN/min(ts)/1e6:.0f} M montmul/s")

    # mixed add kernel at scan-row width
    W_ROW = LANES * wg * C
    p1 = tuple(jnp.broadcast_to(q, (L, W_ROW)) for q in (
        jnp.asarray(encode([gx], fq)), jnp.asarray(encode([gy], fq)),
        jnp.asarray(encode([1], fq)),
    ))  # [L,1] broadcasts to [L,W_ROW]
    xy2 = (p1[0], p1[1])
    from groth16_tpu.curves.pallas_point import add_mixed_g1_pallas

    blk = min(CONFIG.pallas_block, W_ROW & -W_ROW)
    f_add = jax.jit(
        lambda a, b: add_mixed_g1_pallas(fq, 3 * c.b % c.p, a, b, blk)
    )
    jax.block_until_ready(f_add(p1, xy2))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f_add(p1, xy2))
        ts.append(time.time() - t0)
    print(f"add_mixed_g1_pallas at width {W_ROW}: {W_ROW/min(ts)/1e6:.2f} M adds/s")


if __name__ == "__main__":
    main()
