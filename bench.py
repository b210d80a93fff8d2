"""Benchmark driver: end-to-end Groth16 prove on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: synthetic R1CS (DummyCircuit, benches/bench.rs:22-64 analog) at
2^16 constraints on BN254 — BASELINE.json config #2.  Wall-clock is the
steady-state device prove (witness map + 5 MSMs + assembly), proving-key
resident on device, assignment streamed in — the
create_proof_with_reduction_and_matrices shape (prover.rs:26-51).

vs_baseline: the reference publishes no numbers (BASELINE.md) and this
image has no Rust toolchain to run its harness, so the baseline constant
below is an arkworks-measured-elsewhere estimate for a multicore x86
host: ~0.9 s for a 2^16-constraint BLS12-381/BN254 prove at 16-32 cores
(scaled from public arkworks bench reports of ~850 ns/constraint-class
provers).  vs_baseline = baseline_s / ours_s (>1 means faster than the
estimate).  Treat it as indicative until the Rust harness can run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_g16")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CURVE = "bn254"
LOG_N = int(os.environ.get("G16_BENCH_LOGN", "16"))
BASELINE_PROVE_S = 0.9  # arkworks multicore estimate, see module docstring


def main():
    from groth16_tpu.fields import fp
    # TPU compiles are cheap; unrolling the CIOS limb loop removes L
    # sequential scan iterations per multiply (~13% on the MSM).
    fp.CIOS_UNROLL = True
    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.protocol.generator_tpu import setup_device
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.protocol.verifier import prepare_verifying_key, verify_proof
    from groth16_tpu.r1cs.circuits import DummyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.rng import Rng

    from groth16_tpu.serde import deserialize_proving_key, serialize_proving_key

    c = get_curve(CURVE)
    n_constraints = (1 << LOG_N) - 2  # domain = 2^LOG_N with 2 instance vars
    n_vars = 1 << (LOG_N - 1)
    rng = Rng(0xBE7C)

    cache = f"/root/.cache/g16_bench_pk_{CURVE}_{LOG_N}.bin"
    t0 = time.time()
    if os.path.exists(cache):
        pk = deserialize_proving_key(
            open(cache, "rb").read(), CURVE, compress=False, validate=False
        )
        vk = pk.vk
        print(f"# pk loaded from cache: {time.time() - t0:.1f}s", file=sys.stderr)
    else:
        pk, vk = setup_device(DummyCircuit(n_vars, n_constraints), CURVE, rng)
        setup_s = time.time() - t0
        print(f"# setup (device batch muls): {setup_s:.1f}s", file=sys.stderr)
        with open(cache, "wb") as f:
            f.write(serialize_proving_key(pk, compress=False))

    a, b = 3, 5
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(n_vars, n_constraints, a=a, b=b)(cs)
    matrices = cs.to_matrices()
    z = cs.full_assignment()

    t0 = time.time()
    prover = TpuProver(pk, matrices)
    upload_s = time.time() - t0
    print(f"# pk upload: {upload_s:.1f}s", file=sys.stderr)

    r, s = rng.field_element(c.r), rng.field_element(c.r)
    t0 = time.time()
    proof = prover.prove(z, r, s)
    first_s = time.time() - t0
    print(f"# first prove (compile+run): {first_s:.1f}s", file=sys.stderr)

    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, [a * b % c.r]), "proof must verify"

    times = []
    for i in range(3):
        r, s = rng.field_element(c.r), rng.field_element(c.r)
        t0 = time.time()
        prover.prove(z, r, s)
        times.append(time.time() - t0)
    wall = min(times)
    print(f"# steady-state proves: {[round(t, 2) for t in times]}", file=sys.stderr)

    print(json.dumps({
        "metric": f"prove_2p{LOG_N}_{CURVE}_wall",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_PROVE_S / wall, 3),
    }))


if __name__ == "__main__":
    main()
