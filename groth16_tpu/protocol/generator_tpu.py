"""Trusted setup with device fixed-base batch muls (the setup hot loop).

Mirrors generate_parameters_with_qap (/root/reference/src/generator.rs:47-208,
SURVEY.md §3.1) exactly, with BOTH hot sides on device:

* the ~5 G1 + 1 G2 fixed-base batch multiplications (the dominant cost,
  generator.rs:129-183) via the shared-window-table kernel
  (msm/fixed_base.py);
* the QAP instance map — Lagrange evaluation + per-variable sparse
  accumulate (r1cs_to_qap.rs:128-170) — plus the gamma_abc/l key-scalar
  maps (generator.rs:113-123) and the h-query powers
  (r1cs_to_qap.rs:237-247), via qap/device.instance_map_device and the
  device power tables (round 5; previously these were O(n) host Python
  bigint loops, tens of seconds at 2^20).

Mixed-radix (MNT) domains keep the exact host instance map — the device
Lagrange identity is radix-2-specific.  Bit-identical either way
(tests/test_generator_device_qap.py).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import make_spec
from groth16_tpu.msm.fixed_base import batch_mul_device, build_window_table
from groth16_tpu.protocol.data_structures import ProvingKey, VerifyingKey
from groth16_tpu.qap.reduction import LibsnarkReduction
from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisError, SynthesisMode
from groth16_tpu.ref.domain import RefDomain
from groth16_tpu.utils.rng import Rng


def _window_bits(num_scalars: int) -> int:
    # table build costs 2*2^c adds/window; lookups cost 1 add/scalar/window
    best, best_cost = 4, None
    for c in range(4, 15):
        cost = (num_scalars + 2 * (1 << c)) / c
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


class _DeviceBatchMul:
    """One window table per (curve group, generator); batch_mul on device.

    Scalar batches are zero-padded up to a power-of-two-ish bucket so
    every call of a setup compiles at most ONE program shape per group —
    round 3's setup spent ~90% of its 736 s compiling a fresh batch-mul
    graph for each of the 6 differently-sized query vectors
    (generator.rs:129-183 batches; the math is identical, only the
    shapes differed).  Zero scalars multiply to infinity and are sliced
    off after decode."""

    def __init__(self, g, base_affine, to_device, from_device, bits: int, n_hint: int):
        self.g = g
        self.bits = bits
        self.c = _window_bits(max(n_hint, 1))
        self.num_windows = -(-bits // self.c)
        base = to_device([base_affine])
        base_single = tuple(a[..., 0] for a in base)
        self.table = jax.jit(
            lambda b: build_window_table(self.g, b, self.c, self.num_windows),
        )(base_single)
        self.from_device = from_device

    @staticmethod
    def _pad_to(n: int) -> int:
        m = 256
        while m < n:
            m <<= 1
        return m

    def __call__(self, fr_spec, scalars: Sequence[int]) -> List:
        if len(scalars) == 0:
            return []
        n = len(scalars)
        npad = self._pad_to(n)
        s = codec.scalars_to_device(list(scalars) + [0] * (npad - n), fr_spec)
        out = batch_mul_device(self.g, self.table, s, self.c, self.bits)
        return self.from_device(out)[:n]

    def call_std_device(self, s_std) -> List:
        """Batch mul on an ALREADY-DEVICE standard-form scalar tensor
        uint32[Ls, n] (the device-QAP setup path: key scalars never
        visit the host)."""
        import jax.numpy as jnp

        n = s_std.shape[-1]
        npad = self._pad_to(n)
        if npad != n:
            s_std = jnp.pad(s_std, ((0, 0), (0, npad - n)))
        out = batch_mul_device(self.g, self.table, s_std, self.c, self.bits)
        return self.from_device(out)[:n]


def _device_setup_scalars(
    c, fr_spec, ndom, matrices, t,
    alpha, beta, gamma, delta, gamma_inv, delta_inv, num_instance,
):
    """All setup key scalars built ON DEVICE in one jitted program:
    instance map (qap/device.instance_map_device), the gamma_abc / l
    maps (generator.rs:113-123: (beta*a_i + alpha*b_i + c_i) * gamma^-1
    resp. delta^-1), and the h-query powers Z(t)*delta^-1*t^i
    (r1cs_to_qap.rs:237-247) — returned as ONE standard-form scalar
    tensor per group, ready for the fixed-base batch muls.  Replaces
    O(n) host Python bigint loops (round-4 Weak #4).

    Returns (n_hint, counts, g1_std, g2_std) with counts =
    (len a, len b, len h, len l, len gamma_abc) and the G1 tensor laid
    out [a | b | h | l | gamma_abc | alpha beta delta], the G2 tensor
    [b | beta gamma delta] (generator.rs:129-183 order)."""
    import jax.numpy as jnp

    from groth16_tpu.fields import fp
    from groth16_tpu.fields.spec import encode
    from groth16_tpu.ntt.ntt import powers_device
    from groth16_tpu.qap.device import (
        encode_matrix_transposed,
        instance_map_device,
    )

    r = c.r
    num_vars = num_instance + matrices.num_witness_variables
    flat = matrices.flatten()
    mats_t = {
        k: encode_matrix_transposed(v, fr_spec, num_vars)
        for k, v in flat.items()
    }
    n = ndom.size
    zt = (pow(t, n, r) - 1) % r
    zt_dinv = zt * delta_inv % r

    # The matrix tensors and the domain-element table MUST be traced
    # ARGUMENTS, not closure captures: captured concrete arrays become
    # inline constants of the compiled program, and at 2^20 that is a
    # 162 MB MLIR blob that OOM-kills the server-side compile helper
    # (observed round 5: "tpu_compile_helper subprocess exit signal
    # SIGKILL").  As arguments they are runtime buffers and the program
    # stays O(kB).
    from groth16_tpu.ntt.ntt import powers

    xs = powers(fr_spec, ndom.group_gen, n)

    @jax.jit
    def build(mats_t, xs):
        a, b, cc = instance_map_device(
            fr_spec, ndom, mats_t, t, num_instance,
            matrices.num_constraints, xs=xs,
        )
        s = fp.add_strict(
            fr_spec,
            fp.add_strict(
                fr_spec,
                fp.mul_const(fr_spec, a, beta),
                fp.mul_const(fr_spec, b, alpha),
            ),
            cc,
        )
        gabc = fp.mul_const(fr_spec, s[:, :num_instance], gamma_inv)
        l = fp.mul_const(fr_spec, s[:, num_instance:], delta_inv)
        # t^i table built by log-doubling (pow2 length), sliced to n-1
        h = fp.mul_const(
            fr_spec, powers_device(fr_spec, t, n)[:, : n - 1], zt_dinv
        )
        g1_m = jnp.concatenate([a, b, h, l, gabc], axis=-1)
        return fp.from_mont(fr_spec, g1_m), fp.from_mont(fr_spec, b)

    g1_std, b_std = build(mats_t, xs)
    c3 = jnp.asarray(encode([alpha, beta, delta], fr_spec, mont=False))
    g1_std = jnp.concatenate([g1_std, c3], axis=-1)
    c3g2 = jnp.asarray(encode([beta, gamma, delta], fr_spec, mont=False))
    g2_std = jnp.concatenate([b_std, c3g2], axis=-1)
    counts = (num_vars, num_vars, n - 1, num_vars - num_instance,
              num_instance)
    return num_vars, counts, g1_std, g2_std


def generate_parameters_with_qap_device(
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
    fr_spec = make_spec(r, name=f"{curve}.Fr")

    cs = ConstraintSystem(r, mode=SynthesisMode.SETUP)
    circuit(cs)
    matrices = cs.to_matrices()

    domain = RefDomain(fr, cs.num_constraints + cs.num_instance_variables)
    t = domain.sample_element_outside_domain(rng)

    if gamma % r == 0 or delta % r == 0:
        raise SynthesisError(SynthesisError.Kind.UNEXPECTED_IDENTITY)
    gamma_inv = pow(gamma, r - 2, r)
    delta_inv = pow(delta, r - 2, r)
    num_instance = cs.num_instance_variables

    bits = r.bit_length()
    g1 = codec.g1_ops(c)
    g2 = codec.g2_ops(c)

    from groth16_tpu.ntt.ntt import NttDomain

    ndom = NttDomain(fr, cs.num_constraints + num_instance)
    device_qap = (
        qap is LibsnarkReduction
        and not ndom.radixes  # radix-2 Lagrange identity only
        and ndom.size == domain.size
    )
    if device_qap:
        n_scalars, counts, g1_std, g2_std = _device_setup_scalars(
            c, fr_spec, ndom, matrices, t,
            alpha, beta, gamma, delta, gamma_inv, delta_inv, num_instance,
        )
    else:
        a, b, c_evals, zt, qap_num_variables, m_raw = (
            qap.instance_map_with_evaluation(matrices, fr, t)
        )
        gamma_abc = [
            (beta * a[i] + alpha * b[i] + c_evals[i]) % r * gamma_inv % r
            for i in range(num_instance)
        ]
        l_scalars = [
            (beta * a[i] + alpha * b[i] + c_evals[i]) % r * delta_inv % r
            for i in range(num_instance, qap_num_variables + 1)
        ]
        h_scalars = qap.h_query_scalars(m_raw - 1, t, zt, delta_inv, fr)
        g1_list = (
            list(a) + list(b) + list(h_scalars) + list(l_scalars)
            + list(gamma_abc) + [alpha, beta, delta]
        )
        counts = (len(a), len(b), len(h_scalars), len(l_scalars),
                  len(gamma_abc))
        n_scalars = len(a)

    bm_g1 = _DeviceBatchMul(
        g1, g1_generator,
        lambda pts: codec.g1_to_device(c, pts),
        lambda pt: codec.g1_from_device(c, g1, _affine_batch(g1, pt)),
        bits, n_scalars,
    )
    bm_g2 = _DeviceBatchMul(
        g2, g2_generator,
        lambda pts: codec.g2_to_device(c, pts),
        lambda pt: codec.g2_from_device(c, g2, _affine_batch(g2, pt)),
        bits, n_scalars,
    )

    # ONE padded G1 call and ONE padded G2 call cover every query
    # (generator.rs:129-183's six batch_muls share the generators, so
    # concatenating the scalar vectors costs nothing and compiles a
    # single program shape per group)
    if device_qap:
        g1_pts = bm_g1.call_std_device(g1_std)
        g2_pts = bm_g2.call_std_device(g2_std)
    else:
        g1_pts = bm_g1(fr_spec, g1_list)
        g2_pts = bm_g2(fr_spec, list(b) + [beta, gamma, delta])
    ofs = 0

    def take(k):
        nonlocal ofs
        out = g1_pts[ofs : ofs + k]
        ofs += k
        return out

    na, nb, nh, nl, ni = counts
    a_query = take(na)
    b_g1_query = take(nb)
    h_query = take(nh)
    l_query = take(nl)
    gamma_abc_g1 = take(ni)
    sm1 = take(3)
    b_g2_query = g2_pts[:nb]
    sm2 = g2_pts[nb:]

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


def _affine_batch(g, pt):
    # batch_mul_device returns Jacobian; from_device paths expect Jacobian
    return pt


def setup_device(circuit: Callable, curve: str, rng: Rng, qap=LibsnarkReduction):
    """SNARK::circuit_specific_setup analog with device batch muls."""
    from groth16_tpu.ref.curve import RefGroups

    c = get_curve(curve)
    r = c.r
    alpha = rng.field_element(r)
    beta = rng.field_element(r)
    gamma = rng.field_element(r)
    delta = rng.field_element(r)
    groups = RefGroups(curve)
    g1 = groups.g1_mul(groups.g1_sample(seed=rng.u64() % 1000 + 1), rng.nonzero_field_element(r))
    g2 = groups.g2_mul(groups.g2_sample(seed=rng.u64() % 1000 + 1), rng.nonzero_field_element(r))
    pk = generate_parameters_with_qap_device(
        circuit, curve, alpha, beta, gamma, delta, g1, g2, rng, qap=qap
    )
    return pk, pk.vk
