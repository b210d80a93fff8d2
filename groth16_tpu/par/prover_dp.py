"""Multi-chip Groth16 prover: sharded witness map + sharded MSMs.

Composes the parallel components of SURVEY.md §2.4 into one jitted
multi-device prove step:
  - NTT pipeline (7 transforms) via the four-step all-to-all ShardedNtt
    (par/ntt_cp.py) on coefficient vectors sharded over the mesh axis;
  - the four G1 MSMs as one vmapped-and-sharded Pippenger inside a
    single shard_map (all_gather of S partials + log2(S) tree combine);
  - the G2 MSM the same way;
  - O(1) assembly replicated.

The sparse witness evaluation (O(nnz) field ops) stays replicated — it
is two orders of magnitude lighter than the NTTs/MSMs it feeds
(SURVEY.md §3.2 hot-loop table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from groth16_tpu.curves import codec
from groth16_tpu.curves.point import CurveDevice, Point
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import encode, make_spec
from groth16_tpu.msm.pippenger import msm_device_lanes
from groth16_tpu.par.mesh import DATA_AXIS, axis_size, make_mesh
from groth16_tpu.par.ntt_cp import ShardedNtt
from groth16_tpu.protocol.data_structures import Proof, ProvingKey
from groth16_tpu.protocol.device_keys import DeviceProvingKey, upload_proving_key
from groth16_tpu.protocol.prover_tpu import (
    decode_proof_arrays,
    scalar_bits_array,
)
from groth16_tpu.qap.device import sparse_matvec
from groth16_tpu.r1cs.matrices import ConstraintMatrices


def msm_sharded_lanes(
    g: CurveDevice,
    points: Point,  # leaves [*coords, lanes, N], sharded on N
    scalars: jnp.ndarray,  # [lanes, Ls, N]
    scalar_bits: int,
    mesh,
    axis: str = DATA_AXIS,
    window_bits: int | None = None,
) -> Point:
    """Lane-batched MSM over a sharded point axis; returns points with
    batch (lanes,) (replicated).  One local lane-batched Pippenger per
    shard, then an all_gather of the S partials and a log2(S) halving
    combine."""
    S = axis_size(mesh, axis)
    assert scalars.shape[-1] % S == 0

    def local(pts, sc):
        acc = msm_device_lanes(g, pts, sc, scalar_bits, window_bits)
        # combine the S shard partials: all_gather + log2(S) tree combine
        # under the point-add monoid (par/collectives.py)
        from groth16_tpu.par.collectives import gather_tree_reduce

        return gather_tree_reduce(g.add, acc, axis)  # [*coords, lanes]

    def leaf_spec(x):
        return P(*([None] * (x.ndim - 1)), axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            tuple(leaf_spec(x) for x in points),
            leaf_spec(scalars),
        ),
        out_specs=tuple(P() for _ in range(3)),
        check_vma=False,
    )(points, scalars)


def witness_map_sharded(
    spec, sntt: ShardedNtt, mats, z_mont, num_inputs, num_constraints, mesh,
    axis: str = DATA_AXIS,
):
    """Sharded witness map (r1cs_to_qap.rs:172-235): replicated sparse
    matvec, sharded NTT pipeline."""
    n = sntt.domain.size
    shard = NamedSharding(mesh, P(None, axis))

    def zero_pad(x):
        if x.shape[-1] < n:
            x = jnp.concatenate(
                [x, fp.zeros(spec, (n - x.shape[-1],))], axis=-1
            )
        return jax.lax.with_sharding_constraint(x, shard)

    a = sparse_matvec(spec, mats["a"], z_mont)
    b = sparse_matvec(spec, mats["b"], z_mont)
    a = jnp.concatenate(
        [a[:, :num_constraints], z_mont[:, :num_inputs]], axis=-1
    )
    a = zero_pad(a)
    b = zero_pad(b[:, :num_constraints])

    a = sntt.coset_fft(sntt.ifft(a))
    b = sntt.coset_fft(sntt.ifft(b))
    ab = fp.mont_mul(spec, a, b)

    c = sparse_matvec(spec, mats["c"], z_mont)
    c = zero_pad(c[:, :num_constraints])
    c = sntt.coset_fft(sntt.ifft(c))

    p = spec.modulus
    zg = sntt.domain.evaluate_vanishing_polynomial(sntt.domain.field.generator)
    zg_inv = pow(zg, p - 2, p)
    ab = fp.mont_mul(spec, fp.sub(spec, ab, c), fp.const(spec, zg_inv, (1,)))
    return sntt.coset_ifft(ab)


class ShardedProver:
    """Multi-device prover over a 1D mesh (SURVEY.md §2.4 msm_dp+ntt_cp).

    The prove runs as a sequence of SMALL per-op device programs (each
    jitted once per (curve, mesh, shape) and reused across the 7 NTTs /
    repeated matvecs) rather than one monolithic program: the fused
    module held 7 inlined copies of the four-step NTT graph and its
    XLA compile dominated the multi-chip dryrun (~5 min on XLA:CPU at
    8 virtual devices).  Intermediates stay on device; shardings ride
    the arrays between programs."""

    def __init__(self, pk: ProvingKey, matrices: ConstraintMatrices, mesh=None,
                 axis: str = DATA_AXIS):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.curve = pk.vk.curve
        self.c = get_curve(self.curve)
        self.fr = make_spec(self.c.r, name=f"{self.curve}.Fr")
        S = axis_size(self.mesh, axis)
        self.dpk = upload_proving_key(
            pk, matrices, pad_multiple=S, layout="stacked"
        )
        # place the large query tensors sharded over the mesh element
        # axis at upload time (SURVEY.md §5.4: PKs for 2^24 constraints
        # are tens of GB — they must land directly in sharded HBM, never
        # materialize replicated)
        from groth16_tpu.par.mesh import shard_elements

        self.dpk.g1_msm_points = shard_elements(
            self.mesh, self.dpk.g1_msm_points, axis
        )
        # b_g2_tail is uploaded unpadded (its MSM length is nv_tail, not
        # n_pad); round it up to a mesh-divisible length BEFORE the
        # sharded placement — the in-jit pad then no-ops
        from groth16_tpu.curves import codec as _codec
        from groth16_tpu.protocol.device_keys import _pad_points

        n2 = self.dpk.b_g2_tail[2].shape[-1]
        n2_pad = -(-n2 // S) * S
        if n2_pad != n2:
            self.dpk.b_g2_tail = _pad_points(
                self.dpk.b_g2_tail, n2_pad, _codec.g2_ops(self.c)
            )
        self.dpk.b_g2_tail = shard_elements(
            self.mesh, self.dpk.b_g2_tail, axis
        )
        self.sntt = ShardedNtt(self.dpk.domain, self.mesh, axis)

    def encode_assignment(self, full_assignment):
        return jnp.asarray(encode(list(full_assignment), self.fr))

    def _witness_ops(self, z_mont):
        """Sharded witness map as per-op programs; bit-identical op
        sequence to witness_map_sharded (r1cs_to_qap.rs:172-235)."""
        from groth16_tpu.protocol.prover_tpu import (
            _matvec_jit,
            _mul_jit,
            _subscale_jit,
        )
        from groth16_tpu.utils.jitcache import jit_with_static

        curve, mesh, axis = self.curve, self.mesh, self.axis
        dpk = self.dpk
        dom = self.sntt.domain
        n = dom.size
        nc, ni = dpk.num_constraints, dpk.num_inputs
        num = nc + ni
        splice = jit_with_static(_splice_op, curve, mesh, axis, (nc, ni, n))
        pad = jit_with_static(_pad_op, curve, mesh, axis, (nc, n))
        ifft = jit_with_static(_ntt_op, curve, num, mesh, axis, "ifft")
        cfft = jit_with_static(_ntt_op, curve, num, mesh, axis, "coset_fft")
        cifft = jit_with_static(_ntt_op, curve, num, mesh, axis, "coset_ifft")

        a = splice(_matvec_jit(curve, dpk.mats["a"], z_mont), z_mont)
        b = pad(_matvec_jit(curve, dpk.mats["b"], z_mont))
        a = cfft(ifft(a))
        b = cfft(ifft(b))
        ab = _mul_jit(curve, a, b)
        cr = pad(_matvec_jit(curve, dpk.mats["c"], z_mont))
        cr = cfft(ifft(cr))
        p = self.fr.modulus
        zg = dom.evaluate_vanishing_polynomial(dom.field.generator)
        zg_inv = pow(zg, p - 2, p)
        ab = _subscale_jit(curve, ab, zg_inv, cr)
        h_mont = cifft(ab)
        return jit_with_static(_scalar_stack_op, curve, mesh, axis)(
            dpk, h_mont, z_mont
        )

    def prove(self, full_assignment, r: int, s: int) -> Proof:
        from groth16_tpu.protocol.prover_tpu import _assembly_jit
        from groth16_tpu.utils.jitcache import jit_with_static

        rr = self.c.r
        r %= rr
        s %= rr
        nbits = rr.bit_length()
        z = self.encode_assignment(full_assignment)
        scalars4, rho_std = self._witness_ops(z)
        acc4 = jit_with_static(
            _msm_g1_op, self.curve, self.mesh, self.axis
        )(self.dpk, scalars4)
        b2_acc = jit_with_static(
            _msm_g2_op, self.curve, self.mesh, self.axis
        )(self.dpk, rho_std)
        out = _assembly_jit(
            self.curve,
            self.dpk,
            acc4,
            b2_acc,
            scalar_bits_array(r, nbits),
            scalar_bits_array(s, nbits),
            scalar_bits_array(r * s % rr, nbits),
        )
        return decode_proof_arrays(self.curve, out)


def _g1_scalar_stack(fr, mesh, axis, dpk: DeviceProvingKey, z_mont,
                     num_inputs):
    """Witness map + standard-form scalar prep for the 4-lane G1 MSM
    (prover.rs:63-113 scalar assembly).  Returns (scalars4 [4, Ls, n_pad]
    sharded on the element axis, rho_std [Ls, nv_tail])."""
    sntt = ShardedNtt(dpk.domain, mesh, axis)
    h_mont = witness_map_sharded(
        fr, sntt, dpk.mats, z_mont, num_inputs, dpk.num_constraints, mesh,
        axis,
    )
    h_std = fp.from_mont(fr, h_mont)
    z_std = fp.from_mont(fr, z_mont)
    rho_std = z_std[:, 1:]
    aux_std = z_std[:, num_inputs:]

    n_pad = dpk.n_pad

    def pad_to(s):
        return jnp.pad(s, ((0, 0), (0, n_pad - s.shape[-1])))

    shard2 = NamedSharding(mesh, P(None, None, axis))
    scalars4 = jnp.stack(
        [
            pad_to(rho_std),
            pad_to(rho_std),
            pad_to(h_std[:, : dpk.n_h]),
            pad_to(aux_std[:, : dpk.n_aux]),
        ],
        axis=0,
    )
    scalars4 = jax.lax.with_sharding_constraint(scalars4, shard2)
    return scalars4, rho_std


# -- per-op device programs for the sharded prove --------------------------
# Each is jitted once per (curve, mesh, static-shape) key via
# utils.jitcache.jit_with_static and reused across calls (the 3 iNTTs /
# 3 coset NTTs of a prove share ONE compiled program, etc.).


@functools.lru_cache(maxsize=None)
def _sntt_cached(curve: str, num_coeffs: int, mesh, axis) -> ShardedNtt:
    from groth16_tpu.ntt.ntt import NttDomain

    c = get_curve(curve)
    return ShardedNtt(NttDomain(c.fr, num_coeffs), mesh, axis)


def _ntt_op(curve, num_coeffs, mesh, axis, kind, a):
    sntt = _sntt_cached(curve, num_coeffs, mesh, axis)
    return {
        "ifft": sntt.ifft,
        "coset_fft": sntt.coset_fft,
        "coset_ifft": sntt.coset_ifft,
    }[kind](a)


def _splice_op(curve, mesh, axis, cfg, rows, z_mont):
    """Input-consistency splice + zero-pad, sharded placement
    (r1cs_to_qap.rs:195-199)."""
    nc, ni, n = cfg
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    a = jnp.concatenate([rows[:, :nc], z_mont[:, :ni]], axis=-1)
    if a.shape[-1] < n:
        a = jnp.concatenate([a, fp.zeros(fr, (n - a.shape[-1],))], axis=-1)
    return jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, P(None, axis))
    )


def _pad_op(curve, mesh, axis, cfg, rows):
    nc, n = cfg
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    a = rows[:, :nc]
    if a.shape[-1] < n:
        a = jnp.concatenate([a, fp.zeros(fr, (n - a.shape[-1],))], axis=-1)
    return jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, P(None, axis))
    )


def _scalar_stack_op(curve, mesh, axis, dpk: DeviceProvingKey, h_mont,
                     z_mont):
    """from_mont + pad + stack of the 4 G1 scalar lanes (prover.rs:63-113
    scalar assembly), sharded on the element axis."""
    c = get_curve(curve)
    fr = make_spec(c.r, name=f"{curve}.Fr")
    h_std = fp.from_mont(fr, h_mont)
    z_std = fp.from_mont(fr, z_mont)
    rho_std = z_std[:, 1:]
    aux_std = z_std[:, dpk.num_inputs:]
    n_pad = dpk.n_pad

    def pad_to(s):
        return jnp.pad(s, ((0, 0), (0, n_pad - s.shape[-1])))

    scalars4 = jnp.stack(
        [
            pad_to(rho_std),
            pad_to(rho_std),
            pad_to(h_std[:, : dpk.n_h]),
            pad_to(aux_std[:, : dpk.n_aux]),
        ],
        axis=0,
    )
    scalars4 = jax.lax.with_sharding_constraint(
        scalars4, NamedSharding(mesh, P(None, None, axis))
    )
    return scalars4, rho_std


def _msm_g1_op(curve, mesh, axis, dpk: DeviceProvingKey, scalars4):
    c = get_curve(curve)
    g1 = codec.g1_ops(c)
    return msm_sharded_lanes(
        g1, dpk.g1_msm_points, scalars4, c.r.bit_length(), mesh, axis
    )


def _msm_g2_op(curve, mesh, axis, dpk: DeviceProvingKey, rho_std):
    """G2 MSM (b_g2_query tail): single lane, padded to a shardable
    length."""
    c = get_curve(curve)
    g2 = codec.g2_ops(c)
    S = axis_size(mesh, axis)
    n2 = rho_std.shape[-1]
    n2_pad = -(-n2 // S) * S
    g2_pts = dpk.b_g2_tail
    npts = g2_pts[2].shape[-1]  # may be pre-padded at upload
    if npts != n2_pad:
        inf = g2.infinity((n2_pad - npts,))
        g2_pts = tuple(
            jnp.concatenate([a, b], axis=-1) for a, b in zip(g2_pts, inf)
        )
    sc2 = jnp.pad(rho_std, ((0, 0), (0, n2_pad - n2)))
    b2_acc_l = msm_sharded_lanes(
        g2,
        tuple(x[..., None, :] for x in g2_pts),
        sc2[None],
        c.r.bit_length(),
        mesh,
        axis,
    )
    return tuple(x[..., 0] for x in b2_acc_l)
