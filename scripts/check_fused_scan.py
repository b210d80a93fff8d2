"""Equivalence + perf check of the fused Pallas MSM scan vs the
capture-scan path (TPU one-off; the CPU test suite covers the capture
path, tests/test_msm_fused.py covers the kernel in CI shapes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

import random

from groth16_tpu.config import configure
from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.msm.pippenger import msm_device_lanes
from groth16_tpu.utils.profiling import timed_sync

CURVE = os.environ.get("CURVE", "bn254")
LOG_N = int(os.environ.get("LOG_N", "12"))
LANES = int(os.environ.get("LANES", "2"))
GROUP = os.environ.get("GROUP", "g1")
WBITS = os.environ.get("WBITS")


def main():
    c = get_curve(CURVE)
    ref = RefGroups(CURVE)
    n = 1 << LOG_N
    sbits = c.r.bit_length()
    rng = random.Random(11)

    if GROUP == "g1":
        g = codec.g1_ops(c)
        base = ref.g1_sample(5)
        pts = [ref.g1_mul(base, rng.randrange(1, c.r)) for _ in range(64)]
        # duplicates + infinities stress the complete formulas
        pool = pts + [None, pts[0], pts[1]]
        chosen = [pool[rng.randrange(len(pool))] for _ in range(n)]
        P = tuple(
            jnp.stack([x, x], axis=-2)
            for x in codec.g1_to_device(c, chosen)
        )
        from_dev = codec.g1_from_device
        mul = ref.g1_mul
        add = ref.g1_add
    else:
        g = codec.g2_ops(c)
        base = ref.g2_sample(1)
        pts = [ref.g2_mul(base, rng.randrange(1, c.r)) for _ in range(32)]
        pool = pts + [None, pts[0]]
        chosen = [pool[rng.randrange(len(pool))] for _ in range(n)]
        P = tuple(
            jnp.stack([x, x], axis=-2)
            for x in codec.g2_to_device(c, chosen)
        )
        from_dev = codec.g2_from_device
        mul = ref.g2_mul
        add = ref.g2_add

    sc = [[rng.randrange(c.r) for _ in range(n)] for _ in range(LANES)]
    sc[1] = sc[0]  # shared-scalar lanes like the prover's rho pair
    from groth16_tpu.fields.spec import encode, make_spec

    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    S = jnp.stack([jnp.asarray(encode(s, fr, mont=False)) for s in sc])
    if LANES != 2:
        P = tuple(jnp.repeat(x, LANES // 2, axis=-2) for x in P)

    wbits = int(WBITS) if WBITS else None

    def run(fused):
        with configure(msm_fused_scan=fused):
            f = jax.jit(lambda p, s: msm_device_lanes(g, p, s, sbits, wbits))
            t, out = timed_sync(f, P, S, reps=3, inner=1)
        return t, out

    t_f, out_f = run(True)
    t_o, out_o = run(False)
    got_f = from_dev(c, g, out_f)
    got_o = from_dev(c, g, out_o)
    print(f"fused == capture: {got_f == got_o}")
    if LOG_N <= 12:
        expect = []
        for lane in range(LANES):
            acc = None
            for p, s in zip(chosen, sc[lane]):
                if p is None:
                    continue
                acc = add(acc, mul(p, s))
            expect.append(acc)
        print(f"fused == exact:   {got_f == expect}")
    print(f"n=2^{LOG_N} lanes={LANES} {GROUP}: fused {t_f*1e3:.1f} ms | capture {t_o*1e3:.1f} ms")


if __name__ == "__main__":
    main()
