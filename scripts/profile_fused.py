"""Stage-level timing of group_sums_fused (pippenger) on the TPU.

Mirrors the fused path stage by stage with real device fences
(timed_sync) so per-stage costs are not polluted by the tunnel's ~25 ms
sync floor.  One-off diagnostic."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

from groth16_tpu.config import CONFIG
from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import encode, make_spec
from groth16_tpu.msm import pippenger as pip
from groth16_tpu.msm.pallas_scan import suffix_scan_g1_rows
from groth16_tpu.msm.scans import _pick_chunks, _roll, reduce_points, scan_points
from groth16_tpu.ref.curve import sample_point_fp
from groth16_tpu.utils.profiling import timed_sync

CURVE = os.environ.get("CURVE", "bn254")
LOG_N = int(os.environ.get("LOG_N", "16"))
LANES = int(os.environ.get("LANES", "4"))
CBITS = int(os.environ.get("CBITS", "12"))


def t(label, fn, *args, inner=2):
    tt, out = timed_sync(jax.jit(fn), *args, reps=3, inner=inner)
    print(f"{label}: {tt*1e3:.1f} ms", flush=True)
    return out


def main():
    c = get_curve(CURVE)
    g = codec.g1_ops(c)
    fq = make_spec(c.p, name=f"{CURVE}.Fq")
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    n = 1 << LOG_N
    npad = pip._pad_size(n)
    sbits = c.r.bit_length()
    cb = CBITS
    num_windows = -(-sbits // cb) + 1
    B = (1 << (cb - 1)) + 1
    L = fq.n_limbs
    ce = L
    C = _pick_chunks(npad, CONFIG.msm_max_chunks)
    K = npad // C
    bytes_per_window = LANES * npad * ce * 3 * 4
    wg = max(1, min(num_windows, CONFIG.msm_group_bytes // bytes_per_window))
    n_groups = -(-num_windows // wg)
    R = LANES * wg
    print(f"n=2^{LOG_N} c={cb} W={num_windows} wg={wg} groups={n_groups} "
          f"B={B} C={C} K={K} R={R}")

    gx, gy = sample_point_fp(c.p, c.b)
    pts = tuple(
        jnp.broadcast_to(jnp.asarray(encode([v], fq))[:, :, None],
                         (L, LANES, npad))
        for v in (gx, gy, 1)
    )
    rng = np.random.RandomState(0)
    scal = rng.randint(0, 1 << 15, size=(LANES, fr.n_limbs, npad)).astype(np.uint32)
    S = jnp.asarray(scal)

    digits_all, signs_all = t(
        "digits+recode",
        lambda s: jax.vmap(lambda q: pip.signed_window_digits(q, cb, sbits))(s),
        S, inner=4,
    )
    dg = digits_all[:, :wg, :]
    sg = signs_all[:, :wg, :]

    def build_em(p):
        inf_mask = g.is_infinity(p)
        zero_xy = g.k.zero((LANES, npad))
        x_aff = g.k.select(inf_mask, zero_xy, p[0])
        y_aff = g.k.select(inf_mask, zero_xy, p[1])
        negy = g.k.select(inf_mask, zero_xy, g.k.neg(p[1], k=1))
        rows = lambda q: jnp.moveaxis(q.reshape(ce, LANES, npad), 0, -1)
        em1 = jnp.concatenate([rows(x_aff), rows(y_aff)], axis=-1)
        em2 = jnp.concatenate([rows(x_aff), rows(negy)], axis=-1)
        return jnp.concatenate([em1, em2], axis=1)

    em = t("em planes", build_em, pts, inner=4)

    idx_bits = max(1, (npad - 1).bit_length())
    shift = 1 + idx_bits
    iota_b = jnp.broadcast_to(jnp.arange(npad, dtype=jnp.uint32),
                              (LANES, wg, npad))

    def do_sort(dgg, sgg):
        key = (dgg << shift) | iota_b | (sgg << idx_bits)
        sk = jax.lax.sort(key, dimension=2)
        gidx = sk & jnp.uint32((1 << idx_bits) - 1)
        gidx = gidx + ((sk >> idx_bits) & 1) * jnp.uint32(npad)
        return jnp.swapaxes(
            gidx.astype(jnp.int32).reshape(LANES, wg, C, K), -1, -2
        ).reshape(LANES, wg, npad)

    order_t = t("sort+unpack", do_sort, dg, sg, inner=2)

    fg = t("first_ge histogram", lambda d: pip.first_ge_histogram(d, B),
           dg, inner=2)
    valid = fg < npad
    j = jnp.minimum(fg, npad - 1).astype(jnp.int32)
    jk, jc = j % K, j // K

    rows = t(
        "em row gather",
        lambda e, o: jnp.take_along_axis(
            e[:, None, :, :], o[..., None], axis=2
        ).reshape(R, npad, 2 * ce),
        em, order_t, inner=1,
    )

    prefix, totals = t(
        "pallas suffix scan",
        lambda rr: suffix_scan_g1_rows(fq, g.b3_val, rr, K, C,
                                       pip._pick_blk_cfg(C)),
        rows, inner=1,
    )

    pos = (jk * C + jc).reshape(R, B - 1)
    cap_rows = t(
        "cap row gather",
        lambda p, q: jnp.take_along_axis(p, q[..., None], axis=1),
        prefix, pos, inner=2,
    )

    totals_pt = tuple(x.reshape((L, LANES, wg, C)) for x in totals)
    cross_incl = t(
        "cross scan (totals)",
        lambda tp: scan_points(g, tp, reverse=True, max_chunks=512),
        totals_pt, inner=1,
    )

    def do_cross_at(ci, jcc):
        ce_pt = _roll(ci, -1)
        cmask = jnp.arange(C) < C - 1
        ce_pt = g.select(cmask, ce_pt, g.infinity((LANES, wg, C)))
        cat = jnp.concatenate([x.reshape((ce,) + x.shape[1:]) for x in ce_pt], 0)
        cross_rows = jnp.moveaxis(cat, 0, -1).reshape(R, C, 3 * ce)
        return jnp.take_along_axis(
            cross_rows, jcc.reshape(R, B - 1)[..., None], axis=1
        )

    cx_rows = t("cross_excl + row gather", do_cross_at, cross_incl, jc,
                inner=2)

    def do_gv(capr, cxr, vld):
        def unc(arr):
            a3 = jnp.moveaxis(arr, -1, 0).reshape(3 * ce, LANES, wg, B - 1)
            return tuple(a3[i * ce:(i + 1) * ce] for i in range(3))

        cap = unc(capr)
        cx = unc(cxr)
        gv = g.add(cap, cx)
        gv = g.select(vld, gv, g.infinity((LANES, wg, B - 1)))
        m = B - 1
        tgt = 1 << (m - 1).bit_length()
        if tgt != m:
            gv = tuple(
                jnp.concatenate([x, i], axis=-1)
                for x, i in zip(gv, g.infinity((LANES, wg, tgt - m)))
            )
        return reduce_points(g, gv)

    t("gv add + bucket reduce", do_gv, cap_rows, cx_rows, valid, inner=1)


if __name__ == "__main__":
    main()
