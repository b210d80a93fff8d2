"""Sweep MSM window bits x chunk cap on the attached TPU (2^LOG_N, G1 x4)."""

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
from groth16_tpu.ref.curve import sample_point_fp

CURVE = os.environ.get("CURVE", "bn254")
LOG_N = int(os.environ.get("LOG_N", "16"))
LANES = int(os.environ.get("LANES", "4"))


def main():
    c = get_curve(CURVE)
    g = codec.g1_ops(c)
    fq = make_spec(c.p, name=f"{CURVE}.Fq")
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    n = 1 << LOG_N
    sbits = c.r.bit_length()
    gx, gy = sample_point_fp(c.p, c.b)
    L = fq.n_limbs
    pts = tuple(
        jnp.broadcast_to(jnp.asarray(encode([v], fq))[:, :, None], (L, LANES, n))
        for v in (gx, gy, 1)
    )
    rng = np.random.RandomState(0)
    scal = rng.randint(0, 1 << 15, size=(LANES, fr.n_limbs, n)).astype(np.uint32)
    scalars = jnp.asarray(scal)

    for mc in (4096, 8192):
        for cb in (9, 10, 11, 12, 13):
            with configure(msm_max_chunks=mc):
                f = jax.jit(
                    lambda p, s, cb=cb: msm_device_lanes(g, p, s, sbits, cb)
                )
                out = jax.block_until_ready(f(pts, scalars))
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(f(pts, scalars))
                    ts.append(time.time() - t0)
            pps = LANES * n / min(ts)
            print(
                f"c={cb} max_chunks={mc}: {min(ts)*1e3:.0f} ms"
                f"  ({pps/1e3:.0f}k pts/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
