"""Which part of the sharded prove dominates XLA:CPU compile time?

Times .lower() and .compile() of each phase of the sharded prove at the
dryrun shapes (8 virtual CPU devices, 126-constraint DummyCircuit).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_backend_optimization_level=0"
    + " --xla_llvm_disable_expensive_passes=true"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import functools

import jax.numpy as jnp

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import make_spec
from groth16_tpu.par.mesh import make_mesh
from groth16_tpu.par.prover_dp import (
    ShardedProver,
    _g1_scalar_stack,
    msm_sharded_lanes,
)
from groth16_tpu.protocol.prover_tpu import scalar_bits_array

CURVE = "bn254"


def _fixture(num_constraints: int):
    from groth16_tpu.protocol.generator import setup
    from groth16_tpu.r1cs.circuits import DummyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.rng import Rng

    c = get_curve(CURVE)
    num_vars = max(3, num_constraints // 2)
    rng = Rng(0xE17)
    from groth16_tpu.protocol.generator import setup as _setup

    pk, vk = _setup(DummyCircuit(num_vars, num_constraints), CURVE, rng)
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(num_vars, num_constraints, a=3, b=5)(cs)
    return pk, cs


def timeit(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f}s", flush=True)
    return out


def main():
    mesh = make_mesh(8)
    S = 8
    pk, cs = _fixture(2 * S * S - 2)
    c = get_curve(CURVE)
    prover = ShardedProver(pk, cs.to_matrices(), mesh=mesh)
    dpk = prover.dpk
    fr = make_spec(c.r, name=f"{CURVE}.Fr")
    z = prover.encode_assignment(cs.full_assignment())
    nbits = c.r.bit_length()
    rb = scalar_bits_array(777, nbits)

    g1 = codec.g1_ops(c)
    g2 = codec.g2_ops(c)
    sbits = nbits

    # phase 1: witness map + scalar stack
    f1 = jax.jit(
        lambda z_: _g1_scalar_stack(fr, mesh, "data", dpk, z_, dpk.num_inputs)
    )
    lowered = timeit("witness lower", lambda: f1.lower(z))
    timeit("witness compile", lowered.compile)
    scalars4, rho_std = timeit("witness run", lambda: jax.block_until_ready(f1(z)))

    # phase 2: G1 MSM sharded
    f2 = jax.jit(
        lambda s4: msm_sharded_lanes(g1, dpk.g1_msm_points, s4, sbits, mesh, "data")
    )
    lowered = timeit("msm_g1 lower", lambda: f2.lower(scalars4))
    timeit("msm_g1 compile", lowered.compile)
    acc4 = timeit("msm_g1 run", lambda: jax.block_until_ready(f2(scalars4)))

    # phase 3: G2 MSM sharded
    n2 = rho_std.shape[-1]
    n2_pad = -(-n2 // S) * S
    g2_pts = dpk.b_g2_tail

    def g2_msm(rho):
        sc2 = jnp.pad(rho, ((0, 0), (0, n2_pad - n2)))
        return msm_sharded_lanes(
            g2, tuple(x[..., None, :] for x in g2_pts), sc2[None], sbits,
            mesh, "data",
        )

    f3 = jax.jit(g2_msm)
    lowered = timeit("msm_g2 lower", lambda: f3.lower(rho_std))
    timeit("msm_g2 compile", lowered.compile)
    timeit("msm_g2 run", lambda: jax.block_until_ready(f3(rho_std)))


if __name__ == "__main__":
    main()
