"""Window-bits sweep of the fused-scan MSM at bench shapes (TPU one-off)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

from groth16_tpu.config import configure
from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import encode, make_spec
from groth16_tpu.msm.pippenger import msm_device_lanes
from groth16_tpu.ref.curve import sample_point_fp, sample_point_fp2
from groth16_tpu.utils.profiling import timed_sync

CURVE = os.environ.get("CURVE", "bn254")
LOG_N = int(os.environ.get("LOG_N", "16"))
LANES = int(os.environ.get("LANES", "4"))
GROUP = os.environ.get("GROUP", "g1")
CS = os.environ.get("CS", "")  # window bits list, e.g. "10,11,12,13"


def main():
    c = get_curve(CURVE)
    n = 1 << LOG_N
    sbits = c.r.bit_length()
    fq = make_spec(c.p, name=f"{CURVE}.Fq")
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    L = fq.n_limbs
    if GROUP == "g1":
        g = codec.g1_ops(c)
        gx, gy = sample_point_fp(c.p, c.b)
        P = tuple(
            jnp.broadcast_to(
                jnp.asarray(encode([v], fq))[:, :, None], (L, LANES, n)
            )
            for v in (gx, gy, 1)
        )
    else:
        g = codec.g2_ops(c)
        from groth16_tpu.ref.field import Fp2Ctx

        k2 = Fp2Ctx(c.p, c.fp2_nonresidue)
        (x2, y2) = sample_point_fp2(k2, c.b2)
        enc2 = lambda v: jnp.asarray(encode(list(v), fq)).reshape(L, 2, 1, 1)
        P = tuple(
            jnp.broadcast_to(enc2(v), (L, 2, LANES, n))
            for v in (x2, y2, (1, 0))
        )
    rng = np.random.RandomState(0)
    scal = rng.randint(0, 1 << 15, size=(LANES, fr.n_limbs, n)).astype(np.uint32)
    top = sbits - 15 * (fr.n_limbs - 1)
    scal[:, -1, :] &= (1 << max(1, top)) - 1
    S = jnp.asarray(scal)

    cs_list = [int(x) for x in CS.split(",")] if CS else [10, 11, 12, 13, 14]
    for cb in cs_list:
        f = jax.jit(
            lambda p, s, cb=cb: msm_device_lanes(g, p, s, sbits, cb)
        )
        t0 = time.time()
        t, _ = timed_sync(f, P, S, reps=3, inner=1)
        pps = LANES * n / t
        print(
            f"{GROUP} c={cb}: {t*1e3:.0f} ms  ({pps/1e6:.2f} M pts/s)"
            f"  [compile+warm {time.time()-t0-3*t:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
