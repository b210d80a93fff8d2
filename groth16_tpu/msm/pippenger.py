"""Variable-base multi-scalar multiplication on device (the prover hot loop).

TPU-native re-design of `ark-ec::VariableBaseMSM::msm_bigint`
(SURVEY.md §2.2 "Variable-base MSM"; reference call sites
/root/reference/src/prover.rs:66,74,262).  The bucket method is recast to
be scatter-free — TPU has no fast scatter — and compile-friendly: every
loop (windows, scan steps, Horner doublings) is a `lax.scan`/`fori_loop`
so the traced graph holds O(1) point-adds regardless of N and window
count.

Per c-bit window w:
  1. digit_i = bits [cw, cw+c) of scalar_i (standard-form 15-bit limbs);
     with CONFIG.msm_signed_digits the digits are recoded to
     [-2^(c-1), 2^(c-1)] (one extra carry window), halving the bucket
     tail so the window chooser takes c one bit wider — negation rides
     the gather index into a second y-negated element-major plane.
  2. Sort point indices by digit ascending.  When digit+sign+index fit
     one u32 the sort key packs all three, so the sorted keys double as
     the searchsorted operand AND the gather index (half the sorted
     bytes, no payload array).
  3. Two-level suffix CAPTURE scan (msm/scans.py): within-chunk
     fori_loop of C-wide 13-mul mixed (projective+affine) complete adds
     + a cross pass over chunk totals — ~N point-adds total.  The scan
     captures only the B-1 bucket-boundary values (positions known
     up front from searchsorted on the sorted keys) instead of
     materializing all N projective prefix values in HBM.
  4. Pippenger identity  sum_d d*S_d = sum_{v=1}^{B-1} G_v  where
     G_v = sum of points with digit >= v = suffix-scan value at
     searchsorted(digits, v): captured in-flight, no scatter, no
     per-bucket extraction.
  5. window_sum = reduce(G_1..G_{B-1}); Horner: res = 2^c * res + w_sum.

Windows are processed in GROUPS as an extra batch dimension (sized by an
HBM budget): one batched sort, one batched gather, and a single K-step
suffix scan whose rows are [wg, C]-wide point adds cover a whole group.
Sequential wide-op count per MSM drops from windows*K to
ceil(windows/wg)*K — per-dispatch fixed cost (large over a device
tunnel) and XLA glue amortize across the group.

Layout: point coordinate tensors are limb-major with the element axis
trailing (fields/fp.py); scalars are uint32[Ls, N] standard-form limbs.

The zip-to-shorter-length semantics of arkworks msm_bigint (the h_query
MSM relies on the trailing scalar being dropped — prover.rs:66 vs
generator.rs:167-169) is the caller's responsibility: slice before
calling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from groth16_tpu.config import CONFIG
from groth16_tpu.curves.point import CurveDevice, Point
from groth16_tpu.fields.spec import LIMB_BITS
from groth16_tpu.msm.scans import reduce_points


def _fused_scan_ok(g: CurveDevice) -> bool:
    """The grid-carried Pallas scan kernel (msm/pallas_scan.py) covers
    a = 0 curves with Fp or small-nonresidue Fp2 coordinates on the TPU
    backend; everything else (MNT a != 0, Fp3 towers, CPU tests) runs
    the fori_loop capture-scan path — bit-identical results."""
    from groth16_tpu.config import CONFIG, pallas_enabled

    if not CONFIG.msm_fused_scan or not pallas_enabled():
        return False
    if not g.a_is_zero:
        return False
    deg = getattr(g.k, "tower_deg", 1)
    if deg == 1:
        return True
    return deg == 2 and 1 <= abs(getattr(g.k, "nr_int", 0)) <= 16


def _bucket_cost(g: CurveDevice) -> int:
    """Per-bucket tail weight for the window chooser: ~4 point-adds with
    the fused kernel's element-major boundary gathers, ~50 on the
    capture-scan path (round-3 profile)."""
    return CONFIG.msm_bucket_cost if _fused_scan_ok(g) else 50


def signed_num_windows(scalar_bits: int, c: int) -> int:
    """Window count for the signed-digit recode, WITHOUT a carry window
    when one is provably unnecessary.

    With W = ceil(sb/c) windows the top window's raw digit is
    < 2^(sb - c*(W-1)) = 2^(c - slack) where slack = W*c - sb.  With
    slack >= 1 that is <= 2^(c-1) even after the +1 recode carry, so the
    top window never negates and never carries out — the extra window
    the recode would emit is identically zero (round-5: this was a
    whole wasted n-add scan pass per MSM, ~5% of the G1 phase).  Only
    when c divides sb exactly is the carry window real."""
    W = -(-scalar_bits // c)
    return W + (1 if W * c == scalar_bits else 0)


def choose_window_bits(
    n: int, scalar_bits: int, signed: bool = False, bucket_cost: int | None = None
) -> int:
    """Minimize windows*(n + KB*buckets) over c in [4, 16].

    KB weights the per-bucket tail cost (histogram slot, boundary-row
    gather, gv add, reduce level) against one suffix-scan add.  Round-4
    measurements with the fused scan kernel put the tail at ~180
    ns/bucket vs ~52 ns/point (KB ~ 4), moving the optimum to c ~ 12-13
    at 2^16..2^20; the fori_loop capture path keeps the round-3 KB ~ 50
    (optimum c ~ 9-10).  Signed digits halve the bucket count
    (magnitudes in [0, 2^(c-1)]) at the price of at most one carry
    window (signed_num_windows)."""
    kb = CONFIG.msm_bucket_cost if bucket_cost is None else bucket_cost
    best_c, best_cost = 4, None
    for c in range(4, 17):
        windows = (
            signed_num_windows(scalar_bits, c)
            if signed
            else -(-scalar_bits // c)
        )
        buckets = (1 << (c - 1)) if signed else (1 << c)
        cost = windows * (n + kb * buckets)
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def first_ge_histogram(digits: jnp.ndarray, B: int) -> jnp.ndarray:
    """first_ge[.., v] = #(digits < v+1) for v in 0..B-2, i.e. the index
    of the first sorted position with digit >= v+1 — computed WITHOUT
    the sort via a two-level exact int8 one-hot histogram contracted on
    the MXU (vmapped searchsorted costs ~0.5 us per target on TPU and
    dominates the tail at B >= 2^11; this runs in ~1-2 ms and does not
    depend on the sorted keys, so XLA overlaps it with the sort).

    digits: uint32[.., N] raw window magnitudes (< B).  Returns
    int32[.., B-1]."""
    lead = digits.shape[:-1]
    N = digits.shape[-1]
    nhi = max(1, -(-B // 128))
    d = digits.reshape((-1, N))
    R = d.shape[0]
    # lax.scan over chunks keeps the materialized one-hots at one
    # chunk's footprint (a single fused dot over [R, N, 128] spills
    # ~R*N*(nhi+128) bytes of one-hots to HBM).  bf16 one-hots with
    # fp32 accumulation: per-chunk counts <= chunk <= 2048 < 2^24 are
    # EXACT in fp32, and the per-chunk result converts to int32 before
    # the cross-chunk sum.  (An int8->int32 dot variant miscompiled
    # inside the full MSM program on the v5e backend — correct in
    # isolation, wrong boundaries under fusion; round-4 bug hunt.
    # Pinned by tests/test_msm_fused.py::
    # test_histogram_exact_inside_msm_program_large_B — do not revert
    # to integer dots without that test passing on the TPU backend.)
    chunk = max(128, min(N, 2048,
                         (1 << 23) // max(1, R * (nhi + 128))))
    while N % chunk:
        chunk -= 1
    nc = N // chunk
    hi = (d >> 7).astype(jnp.int32).reshape(R, nc, chunk)
    lo = (d & 127).astype(jnp.int32).reshape(R, nc, chunk)

    def body(acc, dc):
        hic, loc = dc  # each [R, chunk]
        oh_hi = (
            hic[..., None] == jnp.arange(nhi, dtype=jnp.int32)
        ).astype(jnp.bfloat16)
        oh_lo = (
            loc[..., None] == jnp.arange(128, dtype=jnp.int32)
        ).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R, nhi, 128]
        return acc + h.astype(jnp.int32), None

    hist, _ = jax.lax.scan(
        body,
        jnp.zeros((R, nhi, 128), jnp.int32),
        (jnp.moveaxis(hi, 1, 0), jnp.moveaxis(lo, 1, 0)),
    )
    cum = jnp.cumsum(hist.reshape(R, nhi * 128), axis=-1)
    return cum[:, : B - 1].reshape(lead + (B - 1,))


def _pick_blk_cfg(C: int) -> int:
    from groth16_tpu.msm.pallas_scan import _pick_blk

    return _pick_blk(C, CONFIG.msm_scan_blk)


def window_digits(scalars: jnp.ndarray, c: int, w: int) -> jnp.ndarray:
    """Extract bits [c*w, c*w + c) from uint32[Ls, N] 15-bit-limb scalars."""
    b0 = c * w
    i0, sh = divmod(b0, LIMB_BITS)
    Ls = scalars.shape[0]
    lo = scalars[i0] >> sh if i0 < Ls else jnp.zeros_like(scalars[0])
    if sh + c > LIMB_BITS and i0 + 1 < Ls:
        lo = lo | (scalars[i0 + 1] << (LIMB_BITS - sh))
    return lo & jnp.uint32((1 << c) - 1)


def all_window_digits(scalars: jnp.ndarray, c: int, scalar_bits: int) -> jnp.ndarray:
    """[num_windows, N] digit matrix."""
    num_windows = -(-scalar_bits // c)
    return jnp.stack(
        [window_digits(scalars, c, w) for w in range(num_windows)], axis=0
    )


def signed_window_digits(scalars: jnp.ndarray, c: int, scalar_bits: int):
    """Signed-digit recode: scalar = sum_w (-1)^{s_w} m_w 2^{cw} with
    magnitudes m_w in [0, 2^(c-1)].  Low-to-high carry pass: a raw digit
    d + carry > 2^(c-1) becomes 2^c - d (negated) with carry 1; a final
    carry (possible only when c divides scalar_bits — see
    signed_num_windows) lands in one extra top window.
    Returns (mags, signs): each [signed_num_windows(sb, c), N] uint32."""
    num_raw = -(-scalar_bits // c)
    total = signed_num_windows(scalar_bits, c)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    carry = jnp.zeros_like(scalars[0])
    mags, signs = [], []
    for w in range(num_raw):
        d = window_digits(scalars, c, w) + carry  # <= 2^c
        neg = d > half
        mags.append(jnp.where(neg, full - d, d))
        signs.append(neg.astype(jnp.uint32))
        carry = neg.astype(jnp.uint32)
    if total > num_raw:
        mags.append(carry)
        signs.append(jnp.zeros_like(carry))
    return jnp.stack(mags, axis=0), jnp.stack(signs, axis=0)


def _pad_size(n: int) -> int:
    if n <= 4096:
        m = 8
        while m < n:
            m <<= 1
        return m
    return -(-n // 4096) * 4096


def msm_device(
    g: CurveDevice,
    points: Point,
    scalars: jnp.ndarray,
    scalar_bits: int,
    window_bits: int | None = None,
) -> Point:
    """MSM(points, scalars) -> single projective point.

    points: (X, Y, Z) batch of N points, element axis trailing (affine
    inputs: Z = 1, infinity entries Z = 0).  scalars: uint32[Ls, N]
    standard-form 15-bit limbs.  scalar_bits: static bound on scalar bit
    length."""
    out = msm_device_lanes(
        g,
        tuple(x[..., None, :] for x in points),
        scalars[None],
        scalar_bits,
        window_bits,
    )
    return tuple(x[..., 0] for x in out)


def msm_device_lanes(
    g: CurveDevice,
    points: Point,
    scalars: jnp.ndarray,
    scalar_bits: int,
    window_bits: int | None = None,
) -> Point:
    """`lanes` independent MSMs in one batched pass (the prover's four
    G1 MSMs — prover.rs:66,74,92,101 — run as one call).

    points: leaves [*coords, lanes, N]; scalars: uint32[lanes, Ls, N].
    Returns points with batch (lanes,).  Lanes join the window-group
    batch dimension, so sorts, gathers, suffix scans and bucket reduces
    are all (lanes x wg)-wide — sequential wide-op count is divided by
    the lane count on top of the window grouping.
    """
    lanes, Ls, n = scalars.shape
    assert g.batch_shape(points) == (lanes, n)
    signed = CONFIG.msm_signed_digits
    fused = _fused_scan_ok(g)
    c = window_bits or CONFIG.msm_window_bits or choose_window_bits(
        n, scalar_bits, signed, bucket_cost=_bucket_cost(g)
    )
    if signed:
        num_windows = signed_num_windows(scalar_bits, c)
        B = (1 << (c - 1)) + 1  # magnitudes 0..2^(c-1)
        digits_all, signs_all = jax.vmap(
            lambda s: signed_window_digits(s, c, scalar_bits)
        )(scalars)  # each [lanes, W+1, n]
    else:
        num_windows = -(-scalar_bits // c)
        B = 1 << c
        digits_all = jax.vmap(
            lambda s: all_window_digits(s, c, scalar_bits)
        )(scalars)  # [lanes, W, n]
        signs_all = None

    npad = _pad_size(n)
    if npad != n:
        digits_all = jnp.pad(digits_all, ((0, 0), (0, 0), (0, npad - n)))
        if signed:
            signs_all = jnp.pad(signs_all, ((0, 0), (0, 0), (0, npad - n)))
        inf = g.infinity((lanes, npad - n))
        points = tuple(
            jnp.concatenate([p, i], axis=-1) for p, i in zip(points, inf)
        )

    from groth16_tpu.msm.scans import _pick_chunks

    # chunk count: the capture path wants C large (K = npad/C fori_loop
    # steps each cost XLA glue); the fused kernel's grid-step count is
    # npad/blk REGARDLESS of C, while the cross pass over chunk totals
    # costs ~C point-adds per (lane, window) — so the fused path takes C
    # as small as the kernel's lane tiling allows (round-4 profile: the
    # XLA cross pass at C = 4096 cost ~60% of the suffix scan itself).
    C = _pick_chunks(npad, CONFIG.msm_max_chunks_fused if fused
                     else CONFIG.msm_max_chunks)
    K = npad // C
    # the fused kernel's totals/prefix blocks need lane-aligned chunk
    # tiles; small shapes (CPU-scale tests) fall back to the capture scan
    if fused and not (C % 128 == 0 and _pick_blk_cfg(C) % 128 == 0):
        fused = False
        C = _pick_chunks(npad, CONFIG.msm_max_chunks)
        K = npad // C

    # element-major AFFINE planes for the sorted gather: rows of
    # 2*ce contiguous u32 words gather at memory bandwidth, where
    # minor-axis element gathers do not; affine infinity (incl. the
    # padding) is encoded (0, 0) — the mixed-add identity.  Inputs are
    # affine uploads (Z in {0, 1}), so (X, Y) need no normalization
    # beyond the infinity re-encode.
    ce = 1
    for d in g.k.coord_shape():
        ce *= d
    tower_deg = getattr(g.k, "tower_deg", 1)

    def to_rows(coord):
        # [*cs, lanes, npad] -> [lanes, npad, ce] element rows.  The
        # fused-scan path wants tower-major row order (x0 limbs, then x1
        # limbs) so the kernel splits components with contiguous slices;
        # the capture-scan path keeps the historical (limb, tower)
        # C-order flattening.
        if fused and tower_deg > 1:
            coord = jnp.moveaxis(coord, 1, 0)
        return jnp.moveaxis(coord.reshape(ce, lanes, npad), 0, -1)

    inf_mask = g.is_infinity(points)  # [lanes, npad]
    zero_xy = g.k.zero((lanes, npad))
    x_aff = g.k.select(inf_mask, zero_xy, points[0])
    y_aff = g.k.select(inf_mask, zero_xy, points[1])
    em = jnp.concatenate([to_rows(x_aff), to_rows(y_aff)], axis=-1)
    if signed and not fused:
        # capture path: second y-negated copy at element offset npad — a
        # negative digit gathers row (i + npad), so the sign costs an
        # index add, not an extra pass.  p - y is exact (< p) for real
        # points; infinity rows stay (0, 0), the mixed-add identity
        # sentinel.  (The fused kernel instead negates in VMEM from a
        # sign plane: element-major rows pad to 128 lanes in HBM, so a
        # second copy would cost real capacity.)
        negy_aff = g.k.select(inf_mask, zero_xy, g.k.neg(points[1], k=1))
        em = jnp.concatenate(
            [
                em,
                jnp.concatenate(
                    [to_rows(x_aff), to_rows(negy_aff)], axis=-1
                ),
            ],
            axis=1,
        )  # [lanes, 2*npad, 2*ce]

    # window grouping: wg windows per pass across ALL lanes, sized so the
    # gathered point copies stay within the HBM budget
    # the fused path materializes gathered rows (2*ce words/point) plus
    # the 3-coordinate prefix (3*ce), and BOTH are element-major arrays
    # whose minor dim pads to 128 lanes in HBM — account padded widths
    # or a 16 GB chip OOMs at 2^20 (round-4 bench)
    if fused:
        pad128 = lambda w: -(-w // 128) * 128
        bytes_per_window = lanes * npad * (
            pad128(2 * ce) + pad128(3 * ce)
        ) * 4
    else:
        bytes_per_window = lanes * npad * ce * 3 * 4
    wg = max(
        1,
        min(num_windows, CONFIG.msm_group_bytes // max(1, bytes_per_window)),
    )
    n_groups = -(-num_windows // wg)
    # balance: ceil(W / groups) windows per group so the last group is
    # not mostly zero-digit padding (14 + 9pad5 -> 12 + 11pad1)
    wg = -(-num_windows // n_groups)
    w_padded = n_groups * wg
    if w_padded != num_windows:
        # pad with zero-digit windows at the HIGH end: Horner doubles and
        # adds infinity there, leaving the result unchanged
        digits_all = jnp.pad(
            digits_all, ((0, 0), (0, w_padded - num_windows), (0, 0))
        )
        if signed:
            signs_all = jnp.pad(
                signs_all, ((0, 0), (0, w_padded - num_windows), (0, 0))
            )
    # [G, lanes, wg, npad] for the lax.scan over groups
    digits_grouped = jnp.moveaxis(
        digits_all.reshape(lanes, n_groups, wg, npad), 1, 0
    )
    signs_grouped = (
        jnp.moveaxis(signs_all.reshape(lanes, n_groups, wg, npad), 1, 0)
        if signed
        else jnp.zeros_like(digits_grouped)
    )

    # single-word sort keys when digit+sign+index fit u32: halves the
    # sorted bytes and makes the sorted keys double as both the
    # searchsorted operand and the gather index
    idx_bits = max(1, (npad - 1).bit_length())
    extra = 1 if signed else 0
    packed = c + extra + idx_bits <= 32
    shift = (extra + idx_bits) if packed else extra

    iota_b = jnp.broadcast_to(
        jnp.arange(npad, dtype=jnp.uint32), (lanes, wg, npad)
    )
    v_targets = jnp.broadcast_to(
        jnp.arange(1, B, dtype=jnp.uint32) << shift, (lanes * wg, B - 1)
    )
    l_iota = jnp.broadcast_to(
        jnp.arange(lanes, dtype=jnp.int32)[:, None, None], (lanes, wg, B - 1)
    )
    w_iota = jnp.broadcast_to(
        jnp.arange(wg, dtype=jnp.int32)[None, :, None], (lanes, wg, B - 1)
    )
    cd = g.k.coord_ndim
    cs = g.k.coord_shape()
    L = g.k.spec.n_limbs

    from groth16_tpu.msm.scans import (
        _roll,
        scan_points,
        scan_storage_mixed_capture,
    )

    def _cat_rows(pt: Point) -> jnp.ndarray:
        """Point (cs leading) -> [3*ce, *batch] tower-major limb rows."""
        flat = []
        for cf in pt:
            if tower_deg > 1:
                cf = jnp.moveaxis(cf, 1, 0)
            flat.append(cf.reshape((ce,) + cf.shape[cd:]))
        return jnp.concatenate(flat, axis=0)

    def _uncat_rows(arr: jnp.ndarray) -> Point:
        """[3*ce, *batch] tower-major limb rows -> Point."""
        out = []
        for i in range(3):
            cf = arr[i * ce : (i + 1) * ce]
            if tower_deg > 1:
                cf = jnp.moveaxis(
                    cf.reshape((tower_deg, L) + cf.shape[1:]), 0, 1
                )
            out.append(cf)
        return tuple(out)

    def _sort_gidx(digits_g, signs_g):
        """-> (sorted_keys, order_t, sign_t): gather indices and (fused
        path) the sorted sign bits, both pre-composed with the
        step-major storage transpose."""
        sign_sorted = None
        if packed:
            key = (digits_g << shift) | iota_b
            if signed:
                key = key | (signs_g << idx_bits)
            sorted_keys = jax.lax.sort(key, dimension=2)
            gidx = sorted_keys & jnp.uint32((1 << idx_bits) - 1)
            if signed:
                sign_sorted = (sorted_keys >> idx_bits) & 1
                if not fused:
                    gidx = gidx + sign_sorted * jnp.uint32(npad)
        else:
            key = (digits_g << extra) | signs_g if signed else digits_g
            sorted_keys, order = jax.lax.sort(
                (key, iota_b), dimension=2, num_keys=1
            )
            gidx = order
            if signed:
                sign_sorted = sorted_keys & 1
                if not fused:
                    gidx = gidx + sign_sorted * jnp.uint32(npad)

        # compose the step-major storage transpose (sorted position
        # j = c*K + k stored at k*C + c) into the GATHER indices — the
        # index array is transposed, never the gathered point data
        def t_storage(a):
            return jnp.swapaxes(
                a.reshape(lanes, wg, C, K), -1, -2
            ).reshape(lanes, wg, npad)

        order_t = t_storage(gidx.astype(jnp.int32))
        sign_t = (
            t_storage(sign_sorted.astype(jnp.uint32))
            if (signed and fused)
            else None
        )
        return sorted_keys, order_t, sign_t

    def _tail(cap, cross_excl, jc, valid) -> Point:
        """gv = captured within-chunk values + cross-chunk suffix at the
        target's chunk; reduce the B-1 bucket-boundary values."""
        gv = g.add(cap, cross_excl)  # batch (lanes, wg, B-1)
        gv = g.select(valid, gv, g.infinity((lanes, wg, B - 1)))
        # pad to a power of two for the halving reduction (signed: B-1 =
        # 2^(c-1) already is one; unsigned: 2^c - 1 pads by one)
        m = B - 1
        tgt = 1 << (m - 1).bit_length()
        if tgt != m:
            gv = tuple(
                jnp.concatenate([x, i], axis=-1)
                for x, i in zip(gv, g.infinity((lanes, wg, tgt - m)))
            )
        return reduce_points(g, gv)  # batch (lanes, wg)

    def group_sums_fused(digits_g, signs_g) -> Point:
        """Fused-kernel path: grid-carried Pallas suffix scan
        (msm/pallas_scan.py) + MXU-histogram boundaries + element-major
        row gathers for the bucket tail."""
        from groth16_tpu.msm.pallas_scan import (
            suffix_scan_g1_rows,
            suffix_scan_g2_rows,
        )

        _, order_t, sign_t = _sort_gidx(digits_g, signs_g)
        if sign_t is None:
            sign_t = jnp.zeros((lanes, wg, npad), jnp.uint32)
        # bucket boundaries from the raw digits (no sort dependency —
        # XLA overlaps the histogram with the sort)
        first_ge = first_ge_histogram(digits_g, B)
        valid = first_ge < npad
        j = jnp.minimum(first_ge, npad - 1).astype(jnp.int32)
        jk, jc = j % K, j // K
        rows = jnp.take_along_axis(
            em[:, None, :, :], order_t[..., None], axis=2
        ).reshape(lanes * wg, npad, 2 * ce)
        # the sorted sign bit rides in BIT 31 of column 0 (x's limb 0;
        # limbs are 15-bit so the high bits are free) — an elementwise
        # OR that XLA fuses into the gather, instead of a separate
        # input plane (whose tiling the kernel could not block) or a
        # second y-negated em copy (which would double the 128-lane
        # HBM padding)
        col0 = jnp.arange(2 * ce, dtype=jnp.uint32) == 0
        sgn = sign_t.reshape(lanes * wg, npad)
        rows = rows | jnp.where(
            col0, (sgn << 31)[..., None], jnp.uint32(0)
        )
        blk = _pick_blk_cfg(C)
        if tower_deg == 1:
            prefix, totals = suffix_scan_g1_rows(
                g.k.spec, g.b3_val, rows, K, C, blk
            )
        else:
            prefix, totals = suffix_scan_g2_rows(
                g.k.spec, g.k.nr_int, g.b3_val, rows, K, C, blk
            )
        # captured within-chunk suffix values: ONE element-major row
        # gather of the B-1 boundary rows from the kernel's prefix
        pos = (jk * C + jc).reshape(lanes * wg, B - 1)
        cap_rows = jnp.take_along_axis(prefix, pos[..., None], axis=1)
        cap = tuple(
            x.reshape(cs + (lanes, wg, B - 1))
            for x in _uncat_rows(
                jnp.moveaxis(cap_rows, -1, 0).reshape(
                    3 * ce, lanes, wg, B - 1
                )
            )
        )
        totals_pt = tuple(
            t.reshape(cs + (lanes, wg, C)) for t in totals
        )
        cross_incl = scan_points(g, totals_pt, reverse=True, max_chunks=512)
        cross_excl = _roll(cross_incl, -1)
        cmask = jnp.arange(C) < C - 1
        cross_excl = g.select(cmask, cross_excl, g.infinity((lanes, wg, C)))
        # cross values at each target's chunk: element-major row gather
        # again (limb-major column gathers cost ~10x at B-1 >= 2^10)
        cross_rows = jnp.moveaxis(
            _cat_rows(cross_excl), 0, -1
        ).reshape(lanes * wg, C, 3 * ce)
        cx_rows = jnp.take_along_axis(
            cross_rows, jc.reshape(lanes * wg, B - 1)[..., None], axis=1
        )
        cross_at = tuple(
            x.reshape(cs + (lanes, wg, B - 1))
            for x in _uncat_rows(
                jnp.moveaxis(cx_rows, -1, 0).reshape(
                    3 * ce, lanes, wg, B - 1
                )
            )
        )
        return _tail(cap, cross_at, jc, valid)

    def group_sums(digits_g, signs_g) -> Point:
        """[lanes, wg, npad] digits -> per-window sums, batch (lanes, wg).

        Capture-scan path (CPU backend, MNT a != 0, Fp3 towers): the
        fori_loop suffix scan captures the T = B-1 bucket-boundary
        values in flight (positions from searchsorted on the sorted
        keys) instead of materializing npad projective prefix values."""
        sorted_keys, order_t, _ = _sort_gidx(digits_g, signs_g)
        # sorted_keys = digit << shift (+ lower-order sign/index bits),
        # so first-key >= (v << shift) iff digit >= v: the keys feed
        # searchsorted as-is.
        first_ge = jax.vmap(
            lambda d, v: jnp.searchsorted(d, v, side="left")
        )(sorted_keys.reshape(lanes * wg, npad), v_targets)
        first_ge = first_ge.reshape(lanes, wg, B - 1)
        valid = first_ge < npad
        j = jnp.minimum(first_ge, npad - 1).astype(jnp.int32)
        jk, jc = j % K, j // K
        # element-major row gather (contiguous 2*ce-word rows), then one
        # bulk transpose back to limb-major for the scan kernels
        rows = jnp.take_along_axis(
            em[:, None, :, :], order_t[..., None], axis=2
        )  # [lanes, wg, npad, 2*ce]
        back = jnp.moveaxis(rows, -1, 0)  # [2*ce, lanes, wg, npad]
        xg = back[:ce].reshape(cs + (lanes, wg, npad))
        yg = back[ce:].reshape(cs + (lanes, wg, npad))
        cap, totals = scan_storage_mixed_capture(
            g, (xg, yg), K, C, jk, jc, reverse=True
        )
        # suffix scan over chunk totals (1/K of the data): classic path
        cross_incl = scan_points(g, totals, reverse=True, max_chunks=512)
        cross_excl = _roll(cross_incl, -1)
        cmask = jnp.arange(C) < C - 1
        cross_excl = g.select(cmask, cross_excl, g.infinity((lanes, wg, C)))
        cross_at = tuple(
            x[..., l_iota, w_iota, jc] for x in cross_excl
        )
        return _tail(cap, cross_at, jc, valid)

    gfn = group_sums_fused if fused else group_sums

    def gstep(_, xs):
        return None, gfn(*xs)

    _, sums_g = jax.lax.scan(gstep, None, (digits_grouped, signs_grouped))
    # sums_g leaves: [G, *coords, lanes, wg] -> [*coords, lanes, W] rows
    # for the Horner combine (window 0 first)
    sums = tuple(
        jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-2] + (lanes, w_padded,))
        for x in sums_g
    )
    sums_rows = tuple(jnp.moveaxis(x, -1, 0) for x in sums)  # [W, *coords, lanes]

    def hstep(res, wsum):
        res = jax.lax.fori_loop(0, c, lambda i, p: g.double(p), res)
        return g.add(res, wsum), None

    res, _ = jax.lax.scan(hstep, g.infinity((lanes,)), sums_rows, reverse=True)
    return res
