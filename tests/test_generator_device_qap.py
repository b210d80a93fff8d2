"""Device QAP instance map + device setup-scalar pipeline vs the exact
host engine (bit-exactness: /root/reference/src/r1cs_to_qap.rs:128-170,
generator.rs:113-123, r1cs_to_qap.rs:237-247)."""

import numpy as np

from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import decode, make_spec
from groth16_tpu.ntt.ntt import NttDomain
from groth16_tpu.qap.device import (
    encode_matrix_transposed,
    instance_map_device,
    lagrange_coeffs_device,
)
from groth16_tpu.qap.reduction import LibsnarkReduction
from groth16_tpu.r1cs.circuits import DummyCircuit
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
from groth16_tpu.ref.domain import RefDomain
from groth16_tpu.utils.rng import Rng

CURVE = "bn254"


def _fixture(n_con=37, n_vars=11):
    c = get_curve(CURVE)
    cs = ConstraintSystem(c.r, mode=SynthesisMode.SETUP)
    DummyCircuit(n_vars, n_con)(cs)
    return c, cs.to_matrices(), cs.num_instance_variables, cs.num_constraints


def _from_mont_ints(arr, spec):
    # decode() divides by R itself (mont=True default)
    return decode(np.asarray(arr), spec)


def test_lagrange_coeffs_device_matches_exact():
    c, _, _, _ = _fixture()
    spec = make_spec(c.r, name=f"{CURVE}.Fr")
    dom = NttDomain(c.fr, 64)
    ref = RefDomain(c.fr, 64)
    t = 0xDEADBEEF12345
    got = _from_mont_ints(lagrange_coeffs_device(spec, dom, t), spec)
    want = ref.evaluate_all_lagrange_coefficients(t)
    assert got == want


def test_instance_map_device_matches_exact():
    c, matrices, ni, nc = _fixture()
    spec = make_spec(c.r, name=f"{CURVE}.Fr")
    dom = NttDomain(c.fr, nc + ni)
    t = 0x1234567890ABCDEF11 % c.r
    num_vars = ni + matrices.num_witness_variables
    mats_t = {
        k: encode_matrix_transposed(v, spec, num_vars)
        for k, v in matrices.flatten().items()
    }
    a_d, b_d, c_d = instance_map_device(spec, dom, mats_t, t, ni, nc)
    a_h, b_h, c_h, _, qnv, _ = LibsnarkReduction.instance_map_with_evaluation(
        matrices, c.fr, t
    )
    assert num_vars == qnv + 1
    assert _from_mont_ints(a_d, spec) == a_h
    assert _from_mont_ints(b_d, spec) == b_h
    assert _from_mont_ints(c_d, spec) == c_h


def test_setup_device_qap_matches_host_scalars():
    """Full device scalar pipeline == host key-scalar lists."""
    from groth16_tpu.protocol.generator_tpu import _device_setup_scalars

    c, matrices, ni, nc = _fixture()
    spec = make_spec(c.r, name=f"{CURVE}.Fr")
    r = c.r
    rng = Rng(7)
    alpha, beta, gamma, delta = (rng.nonzero_field_element(r) for _ in range(4))
    gamma_inv = pow(gamma, r - 2, r)
    delta_inv = pow(delta, r - 2, r)
    ref_dom = RefDomain(c.fr, nc + ni)
    t = ref_dom.sample_element_outside_domain(rng)
    ndom = NttDomain(c.fr, nc + ni)

    n_hint, counts, g1_std, g2_std = _device_setup_scalars(
        c, spec, ndom, matrices, t,
        alpha, beta, gamma, delta, gamma_inv, delta_inv, ni,
    )
    a, b, ce, zt, qnv, m_raw = LibsnarkReduction.instance_map_with_evaluation(
        matrices, c.fr, t
    )
    gamma_abc = [
        (beta * a[i] + alpha * b[i] + ce[i]) % r * gamma_inv % r
        for i in range(ni)
    ]
    l_scalars = [
        (beta * a[i] + alpha * b[i] + ce[i]) % r * delta_inv % r
        for i in range(ni, qnv + 1)
    ]
    h_scalars = LibsnarkReduction.h_query_scalars(
        m_raw - 1, t, zt, delta_inv, c.fr
    )
    want = (
        list(a) + list(b) + list(h_scalars) + list(l_scalars)
        + list(gamma_abc) + [alpha, beta, delta]
    )
    got = decode(np.asarray(g1_std), spec, mont=False)
    assert counts == (len(a), len(b), len(h_scalars), len(l_scalars), ni)
    assert got == want
    got2 = decode(np.asarray(g2_std), spec, mont=False)
    assert got2 == list(b) + [beta, gamma, delta]


def test_setup_device_end_to_end_roundtrip():
    """setup_device (device QAP + device batch muls) -> prove -> verify."""
    from groth16_tpu.protocol.generator_tpu import setup_device
    from groth16_tpu.protocol.prover import (
        create_proof_with_reduction_and_matrices,
    )
    from groth16_tpu.protocol.verifier import (
        prepare_verifying_key,
        verify_proof,
    )

    c = get_curve(CURVE)
    rng = Rng(3)
    pk, vk = setup_device(DummyCircuit(6, 13), CURVE, rng)
    cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
    DummyCircuit(6, 13, a=3, b=7)(cs)
    m = cs.to_matrices()
    proof = create_proof_with_reduction_and_matrices(
        pk, 111, 222, m, m.num_instance_variables, m.num_constraints,
        cs.full_assignment(),
    )
    pvk = prepare_verifying_key(vk)
    assert verify_proof(pvk, proof, [21 % c.r])
    assert not verify_proof(pvk, proof, [22])
