"""MSM stage profiler: times the Pippenger pipeline's stages in isolation
on the attached TPU chip (sort | row gather | capture scan | full MSM).

Usage: python scripts/profile_msm.py [log_n] [lanes]

The stage jits mirror msm/pippenger.py group_sums' ops at the same shapes
so their timings bound the full pass; the full `msm_device_lanes` number
is the ground truth.  Feeds the SoL accounting demanded by BASELINE.json
(utils/profiling.py models).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 18
LANES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
CURVE = os.environ.get("G16_CURVE", "bn254")


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    from groth16_tpu.curves import codec
    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.fields.spec import encode, make_spec
    from groth16_tpu.msm.pippenger import choose_window_bits, msm_device_lanes
    from groth16_tpu.msm.scans import _pick_chunks, scan_storage_mixed_capture

    c = get_curve(CURVE)
    g1 = codec.g1_ops(c)
    fq = make_spec(c.p, name=f"{CURVE}.Fq")
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    n = 1 << LOG_N
    sbits = c.r.bit_length()
    cbits = choose_window_bits(n, sbits, signed=True)
    print(f"# n=2^{LOG_N} lanes={LANES} curve={CURVE} window c={cbits}")

    # synthetic coordinates: mont_mul / point-add timing is
    # data-independent (branchless kernels), so random in-range limbs
    # time identically to real curve points
    rnd = np.random.RandomState(5)
    L = fq.n_limbs
    xs = jnp.asarray(rnd.randint(0, 1 << 15, size=(L, n)).astype(np.uint32))
    ys = jnp.asarray(rnd.randint(0, 1 << 15, size=(L, n)).astype(np.uint32))
    zs = jnp.asarray(encode([1] * n, fq))
    pts = tuple(
        jnp.broadcast_to(t[..., None, :], t.shape[:-1] + (LANES, n))
        for t in (xs, ys, zs)
    )
    scal_ints = [int(x) for x in rnd.randint(0, 1 << 62, size=LANES * n)]
    Ls = fr.n_limbs
    scal = jnp.asarray(
        encode(scal_ints, fr, mont=False).reshape(Ls, LANES, n)
    ).transpose(1, 0, 2)

    # --- full MSM ---
    full = jax.jit(lambda P, S: msm_device_lanes(g1, P, S, sbits))
    t_full, _ = timeit(full, pts, scal)
    nwin = -(-sbits // cbits) + 1
    print(f"full msm_device_lanes: {t_full:.3f}s "
          f"({LANES * n / t_full / 1e6:.2f}M pts/s, {nwin} windows)")

    # --- stage: sort (per window-group shape [LANES, 1, n]) ---
    key = jnp.asarray(rnd.randint(0, 1 << 31, size=(LANES, 1, n)).astype(np.uint32))
    t_sort, _ = timeit(jax.jit(lambda k: jax.lax.sort(k, dimension=2)), key)
    print(f"sort [lanes,1,n] u32: {t_sort * 1000:.1f}ms x {nwin} windows = "
          f"{t_sort * nwin:.3f}s")

    # --- stage: element-major row gather [lanes, n, 2*ce] ---
    ce = 1
    for d in g1.k.coord_shape():
        ce *= d
    em = jnp.asarray(
        rnd.randint(0, 1 << 15, size=(LANES, 2 * n, 2 * ce)).astype(np.uint32)
    )
    idx = jnp.asarray(rnd.randint(0, 2 * n, size=(LANES, 1, n)).astype(np.int32))
    gather = jax.jit(
        lambda e, i: jnp.take_along_axis(e[:, None, :, :], i[..., None], axis=2)
    )
    t_g, _ = timeit(gather, em, idx)
    print(f"row gather [lanes,n,{2 * ce}]: {t_g * 1000:.1f}ms x {nwin} = "
          f"{t_g * nwin:.3f}s")

    # --- stage: capture scan at group shape ---
    C = _pick_chunks(n, 4096)
    K = n // C
    B1 = (1 << (cbits - 1))
    cs_ = g1.k.coord_shape()
    xT = jnp.asarray(rnd.randint(0, 1 << 15, size=cs_ + (LANES, 1, n)).astype(np.uint32))
    yT = jnp.asarray(rnd.randint(0, 1 << 15, size=cs_ + (LANES, 1, n)).astype(np.uint32))
    jk = jnp.asarray(rnd.randint(0, K, size=(LANES, 1, B1)).astype(np.int32))
    jc = jnp.asarray(rnd.randint(0, C, size=(LANES, 1, B1)).astype(np.int32))
    scan = jax.jit(
        lambda x, y, a, b: scan_storage_mixed_capture(g1, (x, y), K, C, a, b, reverse=True)
    )
    t_s, _ = timeit(scan, xT, yT, jk, jc)
    adds = LANES * n
    print(f"capture scan K={K} C={C} T={B1}: {t_s * 1000:.1f}ms x {nwin} = "
          f"{t_s * nwin:.3f}s ({adds / t_s / 1e6:.2f}M mixed adds/s)")

    est = (t_sort + t_g + t_s) * nwin
    print(f"# stage sum {est:.3f}s vs full {t_full:.3f}s "
          f"(gap = tail reduce + searchsorted + Horner + glue)")


if __name__ == "__main__":
    main()
