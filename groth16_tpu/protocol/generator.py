"""Trusted setup (reference: src/generator.rs).

Follows the exact flow of generate_parameters_with_qap (generator.rs:47-208)
per SURVEY.md §2.3(4): synthesize in Setup mode, sample t outside the
domain, QAP instance map, gamma_abc / l scalar vectors, then fixed-base
batch muls of every query.  This module is the exact-engine implementation;
the sharded device implementation reuses the same scalar pipeline and
offloads the batch muls (protocol/generator_tpu.py).
"""

from __future__ import annotations

from typing import Callable, Tuple

from groth16_tpu.curves.params import get_curve
from groth16_tpu.protocol.data_structures import ProvingKey, VerifyingKey
from groth16_tpu.qap.reduction import LibsnarkReduction
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisError, SynthesisMode
from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.ref.domain import RefDomain
from groth16_tpu.utils.rng import Rng


def setup(circuit: Callable, curve: str, rng: Rng, qap=LibsnarkReduction):
    """SNARK::circuit_specific_setup analog (lib.rs:66-74): random toxic
    waste + random generators, returns (pk, vk)."""
    c = get_curve(curve)
    r = c.r
    alpha = rng.field_element(r)
    beta = rng.field_element(r)
    gamma = rng.field_element(r)
    delta = rng.field_element(r)
    groups = RefGroups(curve)
    g1 = groups.g1_mul(groups.g1_sample(seed=rng.u64() % 1000 + 1), rng.nonzero_field_element(r))
    g2 = groups.g2_mul(groups.g2_sample(seed=rng.u64() % 1000 + 1), rng.nonzero_field_element(r))
    pk = generate_parameters_with_qap(
        circuit, curve, alpha, beta, gamma, delta, g1, g2, rng, qap=qap
    )
    return pk, pk.vk


def generate_parameters_with_qap(
    circuit: Callable,
    curve: str,
    alpha: int,
    beta: int,
    gamma: int,
    delta: int,
    g1_generator,
    g2_generator,
    rng: Rng,
    qap=LibsnarkReduction,
) -> ProvingKey:
    c = get_curve(curve)
    r = c.r
    fr = c.fr

    # Synthesize the circuit in Setup mode (generator.rs:63-74).
    cs = ConstraintSystem(r, mode=SynthesisMode.SETUP)
    circuit(cs)
    matrices = cs.to_matrices()

    # Evaluation domain + t outside it (generator.rs:88-90).
    domain = RefDomain(fr, cs.num_constraints + cs.num_instance_variables)
    t = domain.sample_element_outside_domain(rng)

    a, b, c_evals, zt, qap_num_variables, m_raw = qap.instance_map_with_evaluation(
        matrices, fr, t
    )

    # Query densities (generator.rs:102-108) — parity quirk: counts indices
    # 0..qap_num_variables, i.e. excludes the final entry.  Only used for
    # window-table sizing, which our batch_mul derives differently.
    non_zero_a = sum(1 for i in range(qap_num_variables) if a[i] != 0)
    non_zero_b = sum(1 for i in range(qap_num_variables) if b[i] != 0)
    del non_zero_a, non_zero_b

    if gamma % r == 0 or delta % r == 0:
        raise SynthesisError(SynthesisError.Kind.UNEXPECTED_IDENTITY)
    gamma_inv = pow(gamma, r - 2, r)
    delta_inv = pow(delta, r - 2, r)

    num_instance = cs.num_instance_variables
    gamma_abc = [
        (beta * a[i] + alpha * b[i] + c_evals[i]) % r * gamma_inv % r
        for i in range(num_instance)
    ]
    l_scalars = [
        (beta * a[i] + alpha * b[i] + c_evals[i]) % r * delta_inv % r
        for i in range(num_instance, qap_num_variables + 1)
    ]
    h_scalars = qap.h_query_scalars(m_raw - 1, t, zt, delta_inv, fr)

    # Fixed-base batch muls (generator.rs:129-183).
    from groth16_tpu.ref.group import g1_jacobian, g2_jacobian

    g1_ops = g1_jacobian(c)
    g2_ops = g2_jacobian(c)
    bits = r.bit_length()

    b_g2_query = g2_ops.batch_mul(g2_generator, b, bits)
    a_query = g1_ops.batch_mul(g1_generator, a, bits)
    b_g1_query = g1_ops.batch_mul(g1_generator, b, bits)
    h_query = g1_ops.batch_mul(g1_generator, h_scalars, bits)
    l_query = g1_ops.batch_mul(g1_generator, l_scalars, bits)
    gamma_abc_g1 = g1_ops.batch_mul(g1_generator, gamma_abc, bits)

    sm1 = g1_ops.batch_mul(g1_generator, [alpha, beta, delta], bits)
    sm2 = g2_ops.batch_mul(g2_generator, [beta, gamma, delta], bits)

    vk = VerifyingKey(
        curve=curve,
        alpha_g1=sm1[0],
        beta_g2=sm2[0],
        gamma_g2=sm2[1],
        delta_g2=sm2[2],
        gamma_abc_g1=gamma_abc_g1,
    )
    return ProvingKey(
        vk=vk,
        beta_g1=sm1[1],
        delta_g1=sm1[2],
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
    )
