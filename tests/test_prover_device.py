"""Device witness map + device prover vs. the exact engine (bit-identical)."""

import numpy as np
import pytest
import jax.numpy as jnp

from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import decode, encode, make_spec
from groth16_tpu.ntt.ntt import NttDomain
from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
from groth16_tpu.protocol.prover import create_proof_with_reduction
from groth16_tpu.protocol.prover_tpu import TpuProver
from groth16_tpu.qap.device import encode_matrices, witness_map_device
from groth16_tpu.qap.reduction import LibsnarkReduction
from groth16_tpu.r1cs.circuits import MIMC_ROUNDS, MiMCDemo, MySillyCircuit, mimc
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.utils.rng import Rng


def _synth(circuit, modulus):
    cs = ConstraintSystem(modulus, mode=SynthesisMode.PROVE)
    circuit(cs)
    assert cs.is_satisfied()
    return cs


def test_witness_map_device_mimc():
    name = "bls12_377"
    c = get_curve(name)
    rng = Rng(99)
    constants = [rng.field_element(c.r) for _ in range(MIMC_ROUNDS)]
    xl, xr = rng.field_element(c.r), rng.field_element(c.r)
    cs = _synth(MiMCDemo(constants, xl=xl, xr=xr), c.r)
    matrices = cs.to_matrices()
    z = cs.full_assignment()

    expect = LibsnarkReduction.witness_map_from_matrices(
        matrices, c.fr, cs.num_instance_variables, cs.num_constraints, z
    )

    fr = make_spec(c.r, name=f"{name}.Fr")
    domain = NttDomain(c.fr, cs.num_constraints + cs.num_instance_variables)
    mats = encode_matrices(matrices, fr)
    z_dev = jnp.asarray(encode(z, fr))
    import jax

    h = jax.jit(
        lambda m, zz: witness_map_device(
            fr, domain, m, zz, cs.num_instance_variables, cs.num_constraints
        )
    )(mats, z_dev)
    got = decode(np.asarray(h), fr)
    assert got == expect


def test_prover_device_silly_bn254():
    name = "bn254"
    rng = Rng(5)
    c = get_curve(name)
    pk, vk = setup(MySillyCircuit(), name, rng)
    pvk = prepare_verifying_key(vk)
    a, b = rng.field_element(c.r), rng.field_element(c.r)
    cval = a * b % c.r
    r, s = rng.field_element(c.r), rng.field_element(c.r)

    expect = create_proof_with_reduction(MySillyCircuit(a=a, b=b), pk, r, s)

    cs = _synth(MySillyCircuit(a=a, b=b), c.r)
    prover = TpuProver(pk, cs.to_matrices())
    got = prover.prove(cs.full_assignment(), r, s)

    assert got == expect
    assert verify_proof(pvk, got, [cval])

    # no-zk path (r = s = 0) skips the G1 B MSM (prover.rs:98-108)
    expect0 = create_proof_with_reduction(MySillyCircuit(a=a, b=b), pk, 0, 0)
    got0 = prover.prove(cs.full_assignment(), 0, 0)
    assert got0 == expect0
    assert verify_proof(pvk, got0, [cval])


def test_prover_device_batch_bn254():
    """vmapped batch proving: B proofs == B sequential proofs."""
    name = "bn254"
    rng = Rng(21)
    c = get_curve(name)
    pk, vk = setup(MySillyCircuit(), name, rng)
    pvk = prepare_verifying_key(vk)
    cases = []
    for _ in range(3):
        a, b = rng.field_element(c.r), rng.field_element(c.r)
        cases.append((a, b, rng.field_element(c.r), rng.field_element(c.r)))
    cs0 = _synth(MySillyCircuit(a=cases[0][0], b=cases[0][1]), c.r)
    prover = TpuProver(pk, cs0.to_matrices())

    assignments, rs, ss, expects = [], [], [], []
    for a, b, r, s in cases:
        cs = _synth(MySillyCircuit(a=a, b=b), c.r)
        assignments.append(cs.full_assignment())
        rs.append(r)
        ss.append(s)
        expects.append(
            create_proof_with_reduction(MySillyCircuit(a=a, b=b), pk, r, s)
        )
    got = prover.prove_batch(assignments, rs, ss)
    assert got == expects
    for (a, b, _, _), pf in zip(cases, got):
        assert verify_proof(pvk, pf, [a * b % c.r])


def test_prover_device_mimc_bls12_377():
    """The canonical fixture (tests/mimc.rs), proved on the device engine."""
    name = "bls12_377"
    rng = Rng(1234)
    c = get_curve(name)
    constants = [rng.field_element(c.r) for _ in range(MIMC_ROUNDS)]
    pk, vk = setup(MiMCDemo(constants), name, rng)
    pvk = prepare_verifying_key(vk)

    xl, xr = rng.field_element(c.r), rng.field_element(c.r)
    image = mimc(xl, xr, constants, c.r)
    r, s = rng.field_element(c.r), rng.field_element(c.r)

    cs = _synth(MiMCDemo(constants, xl=xl, xr=xr), c.r)
    expect = create_proof_with_reduction(MiMCDemo(constants, xl=xl, xr=xr), pk, r, s)

    prover = TpuProver(pk, cs.to_matrices())
    got = prover.prove(cs.full_assignment(), r, s)

    assert got == expect
    assert verify_proof(pvk, got, [image])
    assert not verify_proof(pvk, got, [(image + 1) % c.r])


def test_prove_2p12_pallas_path_bit_exact():
    """Production-configuration test at scale: a 2^12-domain prove runs
    the Pallas kernel path on TPU (batch sizes far above the dispatch
    threshold, both _pad_size regimes inside the MSM) and must be
    bit-identical to the exact prover."""
    import jax

    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover import create_proof_with_reduction
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.r1cs.circuits import DummyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.rng import Rng

    curve = "bn254"
    c = get_curve(curve)
    ncon, nvar = (1 << 12) - 2, 1 << 11
    rng = Rng(0x2B12)
    pk, vk = setup(DummyCircuit(nvar, ncon), curve, rng)
    a, b = 3, 5
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(nvar, ncon, a=a, b=b)(cs)
    assert cs.is_satisfied()
    r_zk, s_zk = rng.field_element(c.r), rng.field_element(c.r)
    expect = create_proof_with_reduction(
        DummyCircuit(nvar, ncon, a=a, b=b), pk, r_zk, s_zk
    )
    prover = TpuProver(pk, cs.to_matrices())
    got = prover.prove(cs.full_assignment(), r_zk, s_zk)
    assert got == expect, "device (Pallas-path) proof != exact proof"
    assert verify_proof(prepare_verifying_key(vk), got, [15])


def test_witness_fine_matches_fused():
    """The large-domain per-op witness path (_witness_fine) must produce
    digit-identical outputs to the fused single-program path."""
    import numpy as np
    import jax

    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.protocol import setup
    from groth16_tpu.protocol.prover_tpu import (
        TpuProver,
        _witness_fine,
        _witness_jit,
    )
    from groth16_tpu.r1cs.circuits import DummyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.rng import Rng

    curve = "bn254"
    c = get_curve(curve)
    ncon, nvar = 126, 64
    rng = Rng(0xF1)
    pk, _ = setup(DummyCircuit(nvar, ncon), curve, rng)
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(nvar, ncon, a=3, b=5)(cs)
    prover = TpuProver(pk, cs.to_matrices())
    z = prover.encode_assignment(cs.full_assignment())
    fused = jax.block_until_ready(_witness_jit(curve, prover.dpk, z))
    fine = jax.block_until_ready(_witness_fine(curve, prover.dpk, z))
    for a, b in zip(jax.tree.leaves(fused), jax.tree.leaves(fine)):
        assert (np.asarray(a) == np.asarray(b)).all()
