"""Benchmark driver: end-to-end Groth16 prove on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
`extras` carries the sub-metrics BASELINE.json asks for (per-phase times,
MSM points/s, NTT butterflies/s, verify latency, evaluate_constraint
microbench, compile times).

Config: synthetic R1CS (DummyCircuit, /root/reference/benches/bench.rs:22-64
analog) at 2^G16_BENCH_LOGN constraints on G16_BENCH_CURVE —
BASELINE.json configs #2 (2^16 bn254) and #3 (2^20 bls12_381; the
reference's own bench size, bench.rs:19-20).  Wall-clock is the
steady-state device prove (witness map + 5 MSMs + assembly), proving-key
resident on device, assignment streamed in — the
create_proof_with_reduction_and_matrices shape (prover.rs:26-51).

## Baseline (vs_baseline)

The reference publishes no numbers (BASELINE.md) and this image has no
Rust toolchain, so the denominator is an explicit MODEL, not a
measurement: arkworks' rayon prover on a 96-core x86 host at
~900 ns/constraint for 2^20 (scaling to ~1300 ns/constraint at 2^16 and
~2000 at 2^12 as per-core batch sizes shrink).  The model is derived
from the prove cost profile (4 G1 MSMs + 1 G2 MSM + 7 NTTs,
SURVEY.md §0) and public multicore MSM throughput reports for
arkworks-class implementations; see BASELINE.md for the derivation and
its error bars.  vs_baseline = model_s / ours_s (>1 = faster than the
modeled 96-core host).  It is clearly labeled `baseline_kind: "model"`
in the output — never presented as a measurement.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Probe the TPU tunnel in a SUBPROCESS before touching jax in-process:
# when the tunnel is down, backend init blocks forever (uninterruptible
# C call) and the bench would hang rather than fail.  See
# tests/conftest.py for the same guard.
_probe_s = int(os.environ.get("G16_BENCH_PROBE_TIMEOUT_S", "300"))
try:
    subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        timeout=_probe_s, check=True, capture_output=True,
    )
except Exception as e:
    print(json.dumps({
        "metric": "prove_wall", "value": None, "unit": "s",
        "vs_baseline": None,
        "extras": {"error": f"tpu backend unavailable ({type(e).__name__})"},
    }))
    sys.exit(1)

import jax

from groth16_tpu.utils.jitcache import enable_compilation_cache

enable_compilation_cache()

CURVE = os.environ.get("G16_BENCH_CURVE", "bn254")
LOG_N = int(os.environ.get("G16_BENCH_LOGN", "16"))

# modeled arkworks 96-core ns/constraint (see module docstring + BASELINE.md)
_MODEL_NS_PER_CONSTRAINT = {12: 2000.0, 16: 1300.0, 20: 900.0, 24: 800.0}


def model_prove_seconds(log_n: int) -> float:
    ks = sorted(_MODEL_NS_PER_CONSTRAINT)
    if log_n <= ks[0]:
        npc = _MODEL_NS_PER_CONSTRAINT[ks[0]]
    elif log_n >= ks[-1]:
        npc = _MODEL_NS_PER_CONSTRAINT[ks[-1]]
    else:
        for lo, hi in zip(ks, ks[1:]):
            if lo <= log_n <= hi:
                f = (log_n - lo) / (hi - lo)
                npc = (1 - f) * _MODEL_NS_PER_CONSTRAINT[lo] + f * _MODEL_NS_PER_CONSTRAINT[hi]
                break
    return npc * (1 << log_n) * 1e-9


def main():
    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.protocol.generator_tpu import setup_device
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.protocol.verifier import prepare_verifying_key, verify_proof
    from groth16_tpu.r1cs.circuits import DummyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.profiling import (
        PhaseTimer,
        msm_work_point_adds,
        ntt_butterflies,
    )
    from groth16_tpu.utils.rng import Rng
    from groth16_tpu.serde import deserialize_proving_key, serialize_proving_key

    c = get_curve(CURVE)
    n_constraints = (1 << LOG_N) - 2  # domain = 2^LOG_N with 2 instance vars
    n_vars = 1 << (LOG_N - 1)
    rng = Rng(0xBE7C)
    extras = {"curve": CURVE, "log_n": LOG_N, "baseline_kind": "model"}

    cache = f"/root/.cache/g16_bench_pk_{CURVE}_{LOG_N}.bin"
    # G16_BENCH_FRESH_SETUP=1: drop the PK cache so setup_s is measured
    # and recorded in the artifact (VERDICT r4: the setup claim was
    # never in a driver artifact because the cache always hit)
    if os.environ.get("G16_BENCH_FRESH_SETUP") and os.path.exists(cache):
        os.remove(cache)
    t0 = time.time()
    if os.path.exists(cache):
        pk = deserialize_proving_key(
            open(cache, "rb").read(), CURVE, compress=False, validate=False
        )
        vk = pk.vk
        print(f"# pk loaded from cache: {time.time() - t0:.1f}s", file=sys.stderr)
    else:
        pk, vk = setup_device(DummyCircuit(n_vars, n_constraints), CURVE, rng)
        extras["setup_s"] = round(time.time() - t0, 1)
        print(f"# setup (device batch muls): {extras['setup_s']}s", file=sys.stderr)
        with open(cache, "wb") as f:
            f.write(serialize_proving_key(pk, compress=False))

    a, b = 3, 5
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(n_vars, n_constraints, a=a, b=b)(cs)
    matrices = cs.to_matrices()
    z = cs.full_assignment()

    t0 = time.time()
    prover = TpuProver(pk, matrices)
    extras["pk_upload_s"] = round(time.time() - t0, 1)
    print(f"# pk upload: {extras['pk_upload_s']}s", file=sys.stderr)

    r, s = rng.field_element(c.r), rng.field_element(c.r)
    t0 = time.time()
    proof = prover.prove(z, r, s)
    extras["first_prove_compile_s"] = round(time.time() - t0, 1)
    print(f"# first prove (compile+run): {extras['first_prove_compile_s']}s",
          file=sys.stderr)

    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, [a * b % c.r]), "proof must verify"

    # Steady-state boundary: assignment as field elements resident on
    # device — the exact analog of create_proof_with_reduction_and_matrices'
    # `full_assignment: &[F]` input (prover.rs:26-51; arkworks assignments
    # are already Vec<F> in Montgomery form, with into_bigint INSIDE the
    # timed prove, as here via the on-device from_mont pass).  The Python
    # int -> limb encode + host->HBM upload is a frontend cost reported
    # separately below.
    t0 = time.time()
    z_enc = jax.block_until_ready(prover.encode_assignment(z))
    extras["assignment_encode_upload_s"] = round(time.time() - t0, 3)

    times = []
    timer = PhaseTimer(verbose=False)
    for i in range(3):
        r, s = rng.field_element(c.r), rng.field_element(c.r)
        t0 = time.time()
        proof = prover.prove_encoded_host(
            z_enc, r, s, timer=timer if i == 2 else None
        )
        times.append(time.time() - t0)
    wall = min(times)
    assert verify_proof(pvk, proof, [a * b % c.r]), "steady-state proof must verify"
    print(f"# steady-state proves: {[round(t, 2) for t in times]}", file=sys.stderr)
    phases = timer.as_dict()
    extras["phases_s"] = {k: round(v, 3) for k, v in phases.items()}

    # throughput + SoL metrics (BASELINE.json: MSM points/s, NTT
    # butterflies/s, "profiled against speed-of-light per chip")
    from groth16_tpu.curves import codec as _codec
    from groth16_tpu.msm.pippenger import _bucket_cost, choose_window_bits
    from groth16_tpu.utils.profiling import point_add_sol_per_s

    n_pad = prover.dpk.n_pad
    if "msm_g1_x4" in phases:
        fq_limbs = prover.dpk.g1_groups[0][0].shape[0]
        sbits = c.r.bit_length()
        g1_ops = _codec.g1_ops(c)
        cbits = choose_window_bits(
            n_pad, sbits, signed=True, bucket_cost=_bucket_cost(g1_ops)
        )
        n_g2 = len(pk.b_g2_query) - 1
        # grouped G1 layout: adds accounted per size class, each at its
        # own window choice (device_keys.group_lane_sizes)
        g1_adds = 0
        g1_points = 0
        for npad_g, lane_ids in prover.dpk.g1_group_info:
            cb_g = choose_window_bits(
                npad_g, sbits, signed=True, bucket_cost=_bucket_cost(g1_ops)
            )
            g1_adds += len(lane_ids) * msm_work_point_adds(npad_g, sbits, cb_g)
            g1_points += len(lane_ids) * npad_g
        g2_adds = msm_work_point_adds(n_g2, sbits, cbits)
        extras["msm_window_bits"] = cbits
        extras["msm_g1_groups"] = [
            {"n_pad": npad_g, "lanes": len(lane_ids)}
            for npad_g, lane_ids in prover.dpk.g1_group_info
        ]
        extras["msm_g1_points_per_s"] = round(g1_points / phases["msm_g1_x4"])
        extras["msm_g2_points_per_s"] = round(n_g2 / phases["msm_g2"])
        # achieved point-adds/s vs the VPU speed-of-light for the 13-mul
        # complete RCB mixed add (utils/profiling.py SoL model): the
        # "msm_*_sol_frac" numbers are the fraction of chip peak the
        # whole MSM pipeline (digits, sort, gathers, scan, tail)
        # sustains — 1.0 would mean the VPU never stalls and every
        # non-add stage is free.
        extras["msm_g1_adds_total"] = g1_adds
        extras["msm_g1_adds_per_s"] = round(g1_adds / phases["msm_g1_x4"])
        sol_g1 = point_add_sol_per_s(fq_limbs, fp2=False)
        sol_g2 = point_add_sol_per_s(fq_limbs, fp2=not c.g2_over_base)
        extras["msm_g1_sol_frac"] = round(
            g1_adds / phases["msm_g1_x4"] / sol_g1, 3
        )
        extras["msm_g2_adds_per_s"] = round(g2_adds / phases["msm_g2"])
        extras["msm_g2_sol_frac"] = round(
            g2_adds / phases["msm_g2"] / sol_g2, 3
        )
        domain_n = prover.dpk.domain.size
        bflies = 7 * ntt_butterflies(domain_n)
        extras["ntt_butterflies_per_s"] = round(bflies / phases["witness_map"])
        # one butterfly ~ 1 montmul + 2 adds on the limb engine
        from groth16_tpu.utils.profiling import (
            VPU_U32_OPS_PER_S,
            mont_mul_u32_ops,
        )

        fr_limbs = z_enc.shape[0]
        sol_bfly = VPU_U32_OPS_PER_S / (mont_mul_u32_ops(fr_limbs) + 6 * fr_limbs)
        extras["ntt_sol_frac"] = round(
            bflies / phases["witness_map"] / sol_bfly, 3
        )

    # verify latency, 50 reps like the reference (benches/bench.rs:97-124);
    # runs the native C++ host engine (groth16_tpu/native) when available
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        verify_proof(pvk, proof, [a * b % c.r])
    extras["verify_latency_s"] = round((time.time() - t0) / reps, 5)
    from groth16_tpu.native import native_pairing

    extras["verify_engine"] = (
        "native" if native_pairing(CURVE) is not None else "python"
    )

    # evaluate_constraint microbench (benches/bench.rs:126-150 analog):
    # device sparse matvec at nnz = 10^2..10^5
    from groth16_tpu.qap.device import sparse_matvec, DeviceMatrix
    import numpy as np
    import jax.numpy as jnp
    from groth16_tpu.fields.spec import encode as enc

    fr = prover.fr
    ec = {}
    rnd = np.random.RandomState(7)
    nv = max(1024, min(65536, len(z)))
    z_dev = jnp.asarray(enc(list(z[:nv]) + [0] * max(0, nv - len(z)), fr))
    from groth16_tpu.utils.profiling import timed_sync

    for nnz in (100, 1000, 10000, 100000):
        cols = jnp.asarray(rnd.randint(0, nv, size=nnz).astype(np.int32))
        coeffs = jnp.asarray(enc([3] * nnz, fr))
        dm = DeviceMatrix(
            coeffs=coeffs, cols=cols,
            seg_start=jnp.zeros((nnz,), jnp.bool_).at[0].set(True),
            end_idx=jnp.asarray([nnz - 1], jnp.int32),
            nonempty=jnp.asarray([True]), num_rows=1,
        )
        fn = jax.jit(lambda d, zz: sparse_matvec(fr, d, zz))
        # marginal per-call time: 16 chained dispatches per fence minus
        # the 1-dispatch fence, /15 — subtracts the ~25 ms tunnel sync
        # floor that made the round-3 numbers flat in nnz
        t1, _ = timed_sync(fn, dm, z_dev, reps=2, inner=1)
        t16, _ = timed_sync(fn, dm, z_dev, reps=2, inner=16)
        ec[str(nnz)] = round(max(0.0, (16 * t16 - t1) / 15) * 1e3, 3)
    extras["evaluate_constraint_ms"] = ec
    extras["evaluate_constraint_note"] = (
        "marginal device-program time (sync floor subtracted); "
        "dominated by dispatch+launch below nnz~10^5"
    )

    # batch proving (BASELINE config #5's single-chip proxy): B proofs
    # of the same circuit through the vmapped prover (par/batch_pp
    # analog of the 2^24 batch config)
    if LOG_N <= 16:
        B = 4
        t0 = time.time()
        proofs = prover.prove_batch(
            [z] * B,
            [rng.field_element(c.r) for _ in range(B)],
            [rng.field_element(c.r) for _ in range(B)],
        )
        t_first = time.time() - t0
        t0 = time.time()
        proofs = prover.prove_batch(
            [z] * B,
            [rng.field_element(c.r) for _ in range(B)],
            [rng.field_element(c.r) for _ in range(B)],
        )
        t_batch = time.time() - t0
        assert all(
            verify_proof(pvk, pf, [a * b % c.r]) for pf in proofs
        ), "batch proofs must verify"
        extras["batch_prove"] = {
            "batch": B,
            "proofs_per_s": round(B / t_batch, 3),
            "batch_wall_s": round(t_batch, 3),
            "per_proof_vs_single": round(t_batch / B / wall, 3),
            "first_call_compile_s": round(t_first, 1),
        }

    model_s = model_prove_seconds(LOG_N)
    extras["baseline_model_s"] = round(model_s, 3)
    print(json.dumps({
        "metric": f"prove_2p{LOG_N}_{CURVE}_wall",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(model_s / wall, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
