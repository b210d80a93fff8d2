"""Device prover: the full Groth16 prove as one jitted device program.

TPU realization of create_proof_with_reduction_and_matrices
(/root/reference/src/prover.rs:26-51 + :54-132; math spec SURVEY.md
§2.3(3)): witness map (7 NTTs + sparse matvecs) -> MSMs -> O(1) group
assembly -> batched to_affine.  Bit-identical to the exact prover
(tested in tests/test_prover_device.py).

Graph shape: the four G1 MSMs (h, l, a, b1) run as ONE vmapped MSM over
the device key's stacked [4, N] point tensor; the G2 MSM is separate;
the O(1) scalar multiplications (r/s/rs * delta, s*A, r*B1) are batched
into two fori-loop double-and-add sweeps.  Scalars enter MSMs in
standard form (the into_bigint analog, prover.rs:64) via an on-device
from_mont pass.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import decode, encode, make_spec
from groth16_tpu.msm.pippenger import msm_device, msm_device_lanes
from groth16_tpu.protocol.data_structures import Proof, ProvingKey
from groth16_tpu.protocol.device_keys import DeviceProvingKey, upload_proving_key
from groth16_tpu.qap.device import witness_map_device
from groth16_tpu.r1cs.matrices import ConstraintMatrices


def scalar_bits_array(v: int, nbits: int) -> jnp.ndarray:
    """Host int -> uint32[nbits] little-endian bit array (for the O(1)
    r/s/rs scalar muls in proof assembly)."""
    return jnp.asarray(
        np.array([(v >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )


def _pad_scalars(s: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    n = s.shape[-1]
    if n == n_pad:
        return s
    return jnp.pad(s, ((0, 0), (0, n_pad - n)))


# Domains above this size run the witness map as per-op device programs:
# the single fused program exceeds the backend compile-service limits
# (observed at 2^20 on the axon tunnel; the 3-phase split alone is not
# fine enough there).
WITNESS_FUSED_MAX = 1 << 18


@functools.partial(jax.jit, static_argnums=(0,))
def _to_mont_jit(curve: str, std: jnp.ndarray):
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    return fp.to_mont(fr, std)


@functools.partial(jax.jit, static_argnums=(0,))
def _matvec_jit(curve: str, dm, z_mont: jnp.ndarray):
    from groth16_tpu.qap.device import sparse_matvec

    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    return sparse_matvec(fr, dm, z_mont)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _splice_pad_jit(curve: str, rows: jnp.ndarray, z_mont: jnp.ndarray,
                    cfg):
    """Input-consistency splice + zero-pad (r1cs_to_qap.rs:195-199)."""
    num_constraints, num_inputs, n = cfg
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    a = jnp.concatenate(
        [rows[:, :num_constraints], z_mont[:, :num_inputs]], axis=-1
    )
    pad = n - a.shape[-1]
    if pad:
        a = jnp.concatenate([a, fp.zeros(fr, (pad,))], axis=-1)
    return a


@functools.partial(jax.jit, static_argnums=(0, 2))
def _pad_rows_jit(curve: str, rows: jnp.ndarray, cfg):
    num_constraints, n = cfg
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    a = rows[:, :num_constraints]
    pad = n - a.shape[-1]
    if pad:
        a = jnp.concatenate([a, fp.zeros(fr, (pad,))], axis=-1)
    return a


@functools.partial(jax.jit, static_argnums=(0,))
def _mul_jit(curve: str, a: jnp.ndarray, b: jnp.ndarray):
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    return fp.mont_mul(fr, a, b)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _subscale_jit(curve: str, ab: jnp.ndarray, zg_inv: int, c_rows: jnp.ndarray):
    cc = get_curve(curve)
    fr = make_spec(cc.r, name=f"{curve}.Fr")
    return fp.mont_mul(
        fr, fp.sub(fr, ab, c_rows), fp.const(fr, zg_inv, (1,))
    )


def _group_scalars(dpk: DeviceProvingKey, rho_std, h_std, aux_std):
    """Per-size-class scalar stacks matching dpk.g1_groups: each lane
    pads only to ITS group's npad (device_keys.group_lane_sizes), not to
    the h_query length."""
    srcs = [
        rho_std[:, : dpk.nv_tail],
        rho_std[:, : dpk.nv_tail],
        h_std[:, : dpk.n_h],
        aux_std[:, : dpk.n_aux],
    ]
    return tuple(
        jnp.stack([_pad_scalars(srcs[i], npad_g) for i in lane_ids], axis=0)
        for npad_g, lane_ids in dpk.g1_group_info
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _scalar_prep_jit(curve: str, dpk: DeviceProvingKey, h_mont, z_mont):
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    h_std = fp.from_mont(fr, h_mont)
    z_std = fp.from_mont(fr, z_mont)
    rho_std = z_std[:, 1:]
    aux_std = z_std[:, dpk.num_inputs :]
    return _group_scalars(dpk, rho_std, h_std, aux_std), rho_std


def _witness_fine(curve: str, dpk: DeviceProvingKey, z_mont: jnp.ndarray):
    """witness_map_device's exact op sequence as SEPARATE device
    programs (each NTT/matvec/pointwise its own jit) — the large-domain
    path.  Bit-identical to _witness_jit (same kernels, same order)."""
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    dom = dpk.domain
    n = dom.size
    ni, nc = dpk.num_inputs, dpk.num_constraints
    a = _splice_pad_jit(curve, _matvec_jit(curve, dpk.mats["a"], z_mont),
                        z_mont, (nc, ni, n))
    b = _pad_rows_jit(curve, _matvec_jit(curve, dpk.mats["b"], z_mont),
                      (nc, n))
    a = dom.coset_fft(dom.ifft(a))
    b = dom.coset_fft(dom.ifft(b))
    ab = _mul_jit(curve, a, b)
    crows = _pad_rows_jit(curve, _matvec_jit(curve, dpk.mats["c"], z_mont),
                          (nc, n))
    crows = dom.coset_fft(dom.ifft(crows))
    p = fr.modulus
    zg = dom.evaluate_vanishing_polynomial(dom.field.generator)
    zg_inv = pow(zg, p - 2, p)
    ab = _subscale_jit(curve, ab, zg_inv, crows)
    h_mont = dom.coset_ifft(ab)
    return _scalar_prep_jit(curve, dpk, h_mont, z_mont)


@functools.partial(jax.jit, static_argnums=(0,))
def _witness_jit(curve: str, dpk: DeviceProvingKey, z_mont: jnp.ndarray):
    """Phase 1: witness map + standard-form scalar prep."""
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    h_mont = witness_map_device(
        fr, dpk.domain, dpk.mats, z_mont, dpk.num_inputs, dpk.num_constraints
    )
    h_std = fp.from_mont(fr, h_mont)
    z_std = fp.from_mont(fr, z_mont)
    rho_std = z_std[:, 1:]
    aux_std = z_std[:, dpk.num_inputs :]
    return _group_scalars(dpk, rho_std, h_std, aux_std), rho_std


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_g1_jit(curve: str, dpk: DeviceProvingKey, scalars_g):
    """Phase 2a: the 4 G1 query MSMs — a_query[1:], b_g1_query[1:],
    h_query (zip-truncated to n-1), l_query (prover.rs:63-113) — run as
    one lane-batched MSM PER SIZE CLASS (device_keys.group_lane_sizes):
    the short rho/aux lanes don't pad to the h_query length, and lanes
    within a class ride the window-group batch dimension.  Returns the
    four accumulators re-stacked in canonical lane order ([..., 4])."""
    c = get_curve(curve)
    g1 = codec.g1_ops(c)
    sbits = c.r.bit_length()
    by_lane = [None] * 4
    for (npad_g, lane_ids), pts, sc in zip(
        dpk.g1_group_info, dpk.g1_groups, scalars_g
    ):
        acc = msm_device_lanes(g1, pts, sc, sbits)
        for j, lane in enumerate(lane_ids):
            by_lane[lane] = tuple(x[..., j] for x in acc)
    return tuple(
        jnp.stack([by_lane[i][k] for i in range(4)], axis=-1)
        for k in range(3)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_g2_jit(curve: str, dpk: DeviceProvingKey, rho_std: jnp.ndarray):
    """Phase 2b: the G2 MSM (b_g2_query tail)."""
    c = get_curve(curve)
    g2 = codec.g2_ops(c)
    return msm_device(g2, dpk.b_g2_tail, rho_std, c.r.bit_length())


@functools.partial(jax.jit, static_argnums=(0,))
def _assembly_jit(
    curve: str,
    dpk: DeviceProvingKey,
    acc4,
    b2_acc,
    r_bits: jnp.ndarray,
    s_bits: jnp.ndarray,
    rs_bits: jnp.ndarray,
):
    """Phase 3: O(1) proof assembly (prover.rs:54-132) + to_affine."""
    c = get_curve(curve)
    g1 = codec.g1_ops(c)
    g2 = codec.g2_ops(c)
    a_acc = tuple(x[..., 0] for x in acc4)
    b1_acc = tuple(x[..., 1] for x in acc4)
    h_acc = tuple(x[..., 2] for x in acc4)
    l_aux_acc = tuple(x[..., 3] for x in acc4)

    # batched O(1) scalar muls: [r, s, rs] * delta_g1
    delta3 = tuple(jnp.stack([x, x, x], axis=-1) for x in dpk.delta_g1)
    bits3 = jnp.stack([r_bits, s_bits, rs_bits], axis=0)
    rsd = g1.scalar_mul_bits(delta3, bits3)
    r_delta = g1.index(rsd, 0)
    s_delta = g1.index(rsd, 1)
    rs_delta = g1.index(rsd, 2)

    # calculate_coeff (prover.rs:252-270) for A, B1; B2 in G2
    def finish(initial, q0, acc, vk_param):
        res = g1.add(initial, q0)
        res = g1.add(res, acc)
        return g1.add(res, vk_param)

    g_a = finish(r_delta, dpk.a0, a_acc, dpk.alpha_g1)
    g1_b = finish(s_delta, dpk.b10, b1_acc, dpk.beta_g1)

    s_delta_g2 = g2.scalar_mul_bits(dpk.delta_g2, s_bits)
    g2_b = g2.add(g2.add(g2.add(s_delta_g2, dpk.b20), b2_acc), dpk.beta_g2)

    # s*A and r*B1, batched
    ab = tuple(jnp.stack([x, y], axis=-1) for x, y in zip(g_a, g1_b))
    bits2 = jnp.stack([s_bits, r_bits], axis=0)
    sab = g1.scalar_mul_bits(ab, bits2)
    s_g_a = g1.index(sab, 0)
    r_g1_b = g1.index(sab, 1)
    # r == 0 => B1 contribution must vanish (prover.rs:98-108); r*B1 is
    # already infinity when r == 0, so no special-casing is needed.

    g_c = g1.add(s_g_a, r_g1_b)
    g_c = g1.add(g_c, g1.neg(rs_delta))
    g_c = g1.add(g_c, l_aux_acc)
    g_c = g1.add(g_c, h_acc)

    # batched to_affine: A and C share one G1 batch inversion
    ac = tuple(jnp.stack([x, y], axis=-1) for x, y in zip(g_a, g_c))
    ax, ay, ainf = g1.to_affine(ac)
    b_batch = tuple(x[..., None] for x in g2_b)
    bx, by, binf = g2.to_affine(b_batch)
    return (ax, ay, ainf, bx, by, binf)


def _decode_proj_host(curve: str, ops, coords, idx=None):
    """HOST homogeneous-projective (X, Y, Z) limb coords (numpy) -> host
    affine point (or None for infinity).  coords: 3 arrays shaped
    [*cs] or [*cs, lanes] (idx selects the lane).  Callers must fetch
    the device arrays FIRST (one jax.device_get for everything — each
    separate fetch costs a ~25 ms tunnel round trip)."""
    c = get_curve(curve)
    spec = make_spec(c.p, name=f"{curve}.Fq")
    vals = []
    for coord in coords:
        arr = np.asarray(coord if idx is None else coord[..., idx])
        v = decode(arr, spec)
        vals.append(tuple(v) if len(v) > 1 else v[0])
    X, Y, Z = vals
    k = ops.k
    if k.is_zero(Z):
        return None
    zi = k.inv(Z)
    return (k.mul(X, zi), k.mul(Y, zi))


def _host_assembly(pk: ProvingKey, acc4, b2_acc, r: int, s: int) -> Proof:
    """Phase 3 on the HOST: the O(1) group-op tail of prover.rs:54-132.

    The device path (_assembly_jit) spends ~0.1 s running ~1500 tiny
    double-and-add kernels through fori_loops for six scalar
    multiplications of O(1) points; on the host the same work is ~5 ms
    of exact bignum arithmetic.  Only the five MSM accumulators cross
    the device boundary (a few hundred bytes) — the same single
    device->host fence the proof decode needed anyway.  Bit-identical
    to the device assembly (tests/test_prover_device.py)."""
    # ONE device->host fetch for all five accumulators (per-array reads
    # each pay the tunnel's ~25 ms round trip)
    acc4_np, b2_np = jax.device_get((acc4, b2_acc))
    return _host_assembly_np(pk, acc4_np, b2_np, r, s)


def _host_assembly_np(pk: ProvingKey, acc4_np, b2_np, r: int, s: int) -> Proof:
    """_host_assembly on already-fetched numpy accumulators (the batch
    prover fetches a whole batch in one device_get and assembles each
    proof from its slice)."""
    from groth16_tpu.protocol.prover import _ops

    curve = pk.vk.curve
    c = get_curve(curve)
    g1, g2 = _ops(curve)
    a_acc, b1_acc, h_acc, l_acc = (
        _decode_proj_host(curve, g1, acc4_np, i) for i in range(4)
    )
    b2_aff = _decode_proj_host(curve, g2, b2_np)

    delta = g1.from_affine(pk.delta_g1)

    def finish(initial, q0, acc_aff, vk_param):
        res = g1.add(initial, g1.from_affine(q0))
        res = g1.add(res, g1.from_affine(acc_aff))
        return g1.add(res, g1.from_affine(vk_param))

    g_a = finish(g1.scalar_mul(delta, r), pk.a_query[0], a_acc,
                 pk.vk.alpha_g1)
    g1_b = finish(g1.scalar_mul(delta, s), pk.b_g1_query[0], b1_acc,
                  pk.beta_g1)
    s_d2 = g2.scalar_mul(g2.from_affine(pk.vk.delta_g2), s)
    g2_b = g2.add(s_d2, g2.from_affine(pk.b_g2_query[0]))
    g2_b = g2.add(g2_b, g2.from_affine(b2_aff))
    g2_b = g2.add(g2_b, g2.from_affine(pk.vk.beta_g2))

    g_c = g1.add(g1.scalar_mul(g_a, s), g1.scalar_mul(g1_b, r))
    g_c = g1.add(g_c, g1.neg(g1.scalar_mul(delta, (r * s) % c.r)))
    g_c = g1.add(g_c, g1.from_affine(l_acc))
    g_c = g1.add(g_c, g1.from_affine(h_acc))
    return Proof(
        curve=curve,
        a=g1.to_affine(g_a),
        b=g2.to_affine(g2_b),
        c=g1.to_affine(g_c),
    )


def _prove_phases(curve, dpk, z_mont, r_bits, s_bits, rs_bits, timer=None):
    """The full prove as three device programs (witness map | MSMs |
    assembly).  Split keeps each compiled program within backend
    program-size limits at large N and gives per-phase profiling; all
    intermediates stay on device.

    timer: optional utils.profiling.PhaseTimer — when given, each phase
    is blocked on and timed (the ark_std start_timer!/end_timer! analog,
    prover.rs:35-125)."""
    witness = (
        _witness_fine if dpk.domain.size > WITNESS_FUSED_MAX else _witness_jit
    )
    if timer is None:
        scalars4, rho_std = witness(curve, dpk, z_mont)
        acc4 = _msm_g1_jit(curve, dpk, scalars4)
        b2_acc = _msm_g2_jit(curve, dpk, rho_std)
        return _assembly_jit(curve, dpk, acc4, b2_acc, r_bits, s_bits, rs_bits)
    import jax as _jax

    with timer.phase("witness_map"):
        scalars4, rho_std = _jax.block_until_ready(
            witness(curve, dpk, z_mont)
        )
    with timer.phase("msm_g1_x4"):
        acc4 = _jax.block_until_ready(_msm_g1_jit(curve, dpk, scalars4))
    with timer.phase("msm_g2"):
        b2_acc = _jax.block_until_ready(_msm_g2_jit(curve, dpk, rho_std))
    with timer.phase("assembly"):
        out = _jax.block_until_ready(
            _assembly_jit(curve, dpk, acc4, b2_acc, r_bits, s_bits, rs_bits)
        )
    return out


@functools.partial(jax.jit, static_argnums=(0,))
def _prove_jit(
    curve: str,
    dpk: DeviceProvingKey,
    z_mont: jnp.ndarray,
    r_bits: jnp.ndarray,
    s_bits: jnp.ndarray,
    rs_bits: jnp.ndarray,
):
    """Whole prove as ONE jitted program (used by the driver entry's
    compile check and small circuits; large circuits go through
    _prove_phases)."""
    scalars4, rho_std = _witness_jit.__wrapped__(curve, dpk, z_mont)
    acc4 = _msm_g1_jit.__wrapped__(curve, dpk, scalars4)
    b2_acc = _msm_g2_jit.__wrapped__(curve, dpk, rho_std)
    return _assembly_jit.__wrapped__(
        curve, dpk, acc4, b2_acc, r_bits, s_bits, rs_bits
    )


class TpuProver:
    """Per-(pk, circuit-shape) prover; holds the device key mirror."""

    def __init__(self, pk: ProvingKey, matrices: ConstraintMatrices):
        self.pk = pk
        self.curve = pk.vk.curve
        self.c = get_curve(self.curve)
        self.fr = make_spec(self.c.r, name=f"{self.curve}.Fr")
        self.dpk = upload_proving_key(pk, matrices)

    def encode_assignment(self, full_assignment: List[int]) -> jnp.ndarray:
        """Host limbs in STANDARD form, Montgomery conversion on device:
        one wide mont_mul replaces a python bigint mulmod per value (the
        dominant per-prove host cost at 2^20)."""
        std = jnp.asarray(encode(list(full_assignment), self.fr, mont=False))
        return _to_mont_jit(self.curve, std)

    def prove(self, full_assignment: List[int], r: int, s: int,
              timer=None, host_assembly: bool = True) -> Proof:
        rr = self.c.r
        r %= rr
        s %= rr
        z = self.encode_assignment(full_assignment)
        if host_assembly:
            return self.prove_encoded_host(z, r, s, timer=timer)
        out = self.prove_encoded(z, r, s, timer=timer)
        return decode_proof_arrays(self.curve, out)

    def prove_encoded_host(self, z_mont: jnp.ndarray, r: int, s: int,
                           timer=None) -> Proof:
        """Device witness map + MSMs, HOST O(1) assembly
        (_host_assembly).  The single-proof fast path: the proof decode
        fence doubles as the accumulator fetch.  prove_encoded (device
        assembly) remains for pipelined callers that must keep results
        on device (par/batch_pp.ProofStream)."""
        rr = self.c.r
        r %= rr
        s %= rr
        witness = (
            _witness_fine
            if self.dpk.domain.size > WITNESS_FUSED_MAX
            else _witness_jit
        )
        if timer is None:
            scalars4, rho_std = witness(self.curve, self.dpk, z_mont)
            acc4 = _msm_g1_jit(self.curve, self.dpk, scalars4)
            b2_acc = _msm_g2_jit(self.curve, self.dpk, rho_std)
            return _host_assembly(self.pk, acc4, b2_acc, r, s)
        with timer.phase("witness_map"):
            scalars4, rho_std = jax.block_until_ready(
                witness(self.curve, self.dpk, z_mont)
            )
        with timer.phase("msm_g1_x4"):
            acc4 = jax.block_until_ready(
                _msm_g1_jit(self.curve, self.dpk, scalars4)
            )
        with timer.phase("msm_g2"):
            b2_acc = jax.block_until_ready(
                _msm_g2_jit(self.curve, self.dpk, rho_std)
            )
        with timer.phase("assembly"):
            return _host_assembly(self.pk, acc4, b2_acc, r, s)

    def prove_encoded(self, z_mont: jnp.ndarray, r: int, s: int, timer=None):
        rr = self.c.r
        nbits = rr.bit_length()
        return _prove_phases(
            self.curve,
            self.dpk,
            z_mont,
            scalar_bits_array(r, nbits),
            scalar_bits_array(s, nbits),
            scalar_bits_array(r * s % rr, nbits),
            timer=timer,
        )

    def prove_batch(self, assignments, rs, ss) -> List[Proof]:
        """B proofs by PIPELINED ASYNC DISPATCH of the single-prove
        programs (witness -> grouped G1 MSM -> G2 MSM per proof, all
        enqueued before the first fence), then ONE device_get for all
        5B accumulators and ~5 ms of host bignum assembly each
        (_host_assembly_np).

        Two earlier designs lost: the round-4 vmapped DEVICE assembly
        was 1.244x sequential (BENCH_r04), and vmapped MSMs generally
        must divide the window-group HBM budget by B, multiplying the
        sequential group steps per MSM.  Async dispatch reuses the
        already-compiled single-prove programs (no extra batch compile
        at all), keeps the full HBM budget per MSM, and overlaps the
        per-proof host encode/assembly with device compute of the
        proofs in flight.  On one chip the MSM work itself scales with
        B — batch parallelism beyond host-overlap belongs to the mesh
        batch axis (par/batch_pp.prove_batch_sharded)."""
        rr = self.c.r
        B = len(assignments)
        assert len(rs) == len(ss) == B
        witness = (
            _witness_fine
            if self.dpk.domain.size > WITNESS_FUSED_MAX
            else _witness_jit
        )
        accs = []
        for z_host in assignments:
            z = self.encode_assignment(z_host)
            scalars_g, rho_std = witness(self.curve, self.dpk, z)
            acc4 = _msm_g1_jit(self.curve, self.dpk, scalars_g)
            b2 = _msm_g2_jit(self.curve, self.dpk, rho_std)
            accs.append((acc4, b2))
        fetched = jax.device_get(accs)
        return [
            _host_assembly_np(self.pk, acc4_np, b2_np, rs[i] % rr,
                              ss[i] % rr)
            for i, (acc4_np, b2_np) in enumerate(fetched)
        ]


def decode_proof_arrays(curve: str, out) -> Proof:
    """(ax, ay, ainf, bx, by, binf) device arrays -> host Proof."""
    c = get_curve(curve)
    ax, ay, ainf, bx, by, binf = out
    spec = make_spec(c.p, name=f"{curve}.Fq")
    xs = decode(np.asarray(ax), spec)
    ys = decode(np.asarray(ay), spec)
    infs = np.asarray(ainf)
    a_pt = None if infs[0] else (xs[0], ys[0])
    c_pt = None if infs[1] else (xs[1], ys[1])
    # bx/by: [L, 2, 1] (Fp2 G2) or [L, 1] (bw6 G2 over Fq)
    bx_v = decode(np.asarray(bx), spec)
    by_v = decode(np.asarray(by), spec)
    if np.asarray(binf)[0]:
        b_pt = None
    elif c.g2_over_base:
        b_pt = (bx_v[0], by_v[0])
    else:
        b_pt = ((bx_v[0], bx_v[1]), (by_v[0], by_v[1]))
    return Proof(curve=curve, a=a_pt, b=b_pt, c=c_pt)
