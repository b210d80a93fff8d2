"""Why GLV/GLS endomorphism decomposition does NOT speed up this MSM.

VERDICT r4 proposed GLV (split a 254-bit scalar k into k1 + lambda*k2
with ~128-bit halves via the cube-root-of-unity endomorphism
phi(x,y) = (beta*x, y), phi(P) = lambda*P) as the remaining >=2x
algorithmic lever for the MSM phase.  This script works the add-count
arithmetic and (with --measure, on the TPU) times the decisive
experiment.  The conclusion is that for a SCAN-BASED Pippenger the
decomposition is an identity transformation on the dominant cost:

  scatter-free Pippenger cost per MSM:
      adds ~= W * (N + KB * B)  +  c * W doublings (Horner)
  where W = number of c-bit windows ~= sb / c.

  GLV halves sb -> W' = W/2, but the decomposition needs BOTH halves
  accumulated: either 2N points in one pass (P and phi(P)), or two
  N-point scalar sets over the same points combined as
  MSM(P,k1) + phi(MSM(P,k2)).  Either way the SCAN term is
      W/2 * 2N = W * N        -- invariant.
  Only the bucket tail (W/2 * KB * B, ~20% of the scan at 2^16 with
  c=13/KB~4) and the Horner doublings (~0.1%) halve.  Net model win:
  ~8-10% at 2^16, less at 2^20 (tail fraction shrinks with N), in
  exchange for an exact 254x130-bit Barrett mul-shift device kernel on
  the witness-map output.  (On a CPU Pippenger the same arithmetic
  holds; GLV pays off there mainly by enabling one-window-larger c and
  cheaper affine-batch tricks, neither of which applies to the
  VMEM-carried scan kernel.)

  The same invariance kills 4-dim GLS for G2 (psi eigenvalue x, the BLS
  parameter): W/4 * 4N = W * N.

What round 5 did instead (both land the adds GLV could not):
  * size-grouped G1 lanes — the rho/aux lanes are ~n/2 at the bench
    circuits and were padded to the h_query length, wasting ~40% of all
    G1 scan adds (protocol/device_keys.group_lane_sizes): ~1.7x.
  * carry-window elimination — the signed recode's +1 window is
    provably all-zero unless c | sb (msm/pippenger.signed_num_windows):
    21 -> 20 windows at c=13.

Run `python scripts/glv_analysis.py` for the model table;
`--measure` times msm_device at (N, 254 bit) vs (2N, 130 bit) on the
attached chip — equal wall-clock within noise is the invariance made
visible.  Reference bar: /root/reference/src/prover.rs:66,74,92,101.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def model(n: int, sb: int, c: int, kb: float = 4.0) -> float:
    from groth16_tpu.msm.pippenger import signed_num_windows

    W = signed_num_windows(sb, c)
    B = (1 << (c - 1)) + 1
    return W * (n + kb * B) + W * (c + 1)


def best(n: int, sb: int, kb: float = 4.0):
    return min(((model(n, sb, c, kb), c) for c in range(8, 17)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--logn", type=int, default=16)
    args = ap.parse_args()

    print("adds model: plain (N, 254b) vs GLV (2N, 130b), kb=4")
    print(f"{'log2 N':>7} {'plain adds':>12} {'c':>3} {'glv adds':>12} "
          f"{'c':>3} {'ratio':>6}")
    for ln in (12, 14, 16, 18, 20, 24):
        n = 1 << ln
        pa, pc = best(n, 254)
        ga, gc = best(2 * n, 130)
        print(f"{ln:>7} {pa:>12.0f} {pc:>3} {ga:>12.0f} {gc:>3} "
              f"{pa / ga:>6.3f}")

    if not args.measure:
        return

    import numpy as np
    import jax

    from groth16_tpu.curves import codec
    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.fields.spec import make_spec
    from groth16_tpu.msm.pippenger import msm_device
    from groth16_tpu.utils.profiling import timed_sync

    c = get_curve("bn254")
    g1 = codec.g1_ops(c)
    fr = make_spec(c.r, name="bn254.Fr")
    n = 1 << args.logn
    rnd = np.random.RandomState(5)

    def run(npts, sbits, label):
        ks = [int.from_bytes(rnd.bytes(32), "little") % (1 << sbits)
              for _ in range(npts)]
        pts_h = [c.g1_gen] * npts  # same point is fine for timing
        pts = codec.g1_to_device(c, pts_h)
        sc = codec.scalars_to_device(ks, fr)
        f = jax.jit(lambda p, s: msm_device(g1, p, s, sbits))
        t, _ = timed_sync(f, pts, sc, reps=3)
        print(f"{label}: {t * 1e3:.1f} ms")
        return t

    t_plain = run(n, 254, f"plain  N=2^{args.logn}, 254-bit")
    t_glv = run(2 * n, 130, f"glv   2N=2^{args.logn + 1}, 130-bit")
    print(f"ratio plain/glv: {t_plain / t_glv:.3f} "
          "(1.0 = decomposition is cost-neutral)")


if __name__ == "__main__":
    main()
