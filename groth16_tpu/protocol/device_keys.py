"""Device-resident ProvingKey mirror (structure-of-arrays limb tensors).

The host ProvingKey (protocol/data_structures.py) is canonical and
serializable; proving uploads it once into this device mirror and then
every proof reuses it — the `ConstraintMatrices + full_assignment` prover
shape of /root/reference/src/prover.rs:26-51 with "matrices live on
device, assignment streamed in" (SURVEY.md §3.2).

Layout choice: the four G1 MSMs of a prove (a_query[1:], b_g1_query[1:],
h_query, l_query — prover.rs:66,74,92,101) share one stacked, padded
[4, N] point tensor so the prover runs them as a single vmapped MSM —
one graph instance, 4x wider lanes.  query[0] entries (the constant-1
wire, added separately per prover.rs:261-267) are stored as singles.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from groth16_tpu.curves import codec
from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import make_spec
from groth16_tpu.ntt.ntt import NttDomain
from groth16_tpu.protocol.data_structures import ProvingKey
from groth16_tpu.qap.device import encode_matrices
from groth16_tpu.r1cs.matrices import ConstraintMatrices


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceProvingKey:
    # device arrays (leaves)
    g1_msm_points: Any  # G1 Point leaves [L, 4, N_pad] (stacked layout)
    b_g2_tail: Any  # G2 Point batch [nv-1]
    a0: Any  # single G1: a_query[0]
    b10: Any  # single G1: b_g1_query[0]
    b20: Any  # single G2: b_g2_query[0]
    alpha_g1: Any
    beta_g1: Any
    delta_g1: Any
    beta_g2: Any
    delta_g2: Any
    mats: Dict[str, Any]  # a/b/c -> DeviceMatrix
    # grouped layout (single-chip prover): per size-class stacks, so the
    # short query lanes (rho/aux are ~n/2 at the bench circuits) do not
    # pad to the h_query length and waste ~40% of the G1 scan adds
    g1_groups: Any = ()  # tuple of G1 Point tuples, leaves [L, k_g, npad_g]
    # static
    curve: str = dataclasses.field(default="")
    num_inputs: int = 0
    num_constraints: int = 0
    n_pad: int = 0  # padded MSM length (stacked layout / max group)
    n_h: int = 0  # len(h_query) = domain_size - 1
    n_aux: int = 0  # len(l_query) = witness count
    # ((npad_g, (canonical lane ids...)), ...); canonical lane order is
    # 0=a_query[1:], 1=b_g1_query[1:], 2=h_query, 3=l_query
    g1_group_info: tuple = ()
    nv_tail: int = 0  # len(a_query) - 1 = rho length

    _LEAF_FIELDS = (
        "g1_msm_points", "b_g2_tail", "a0", "b10", "b20",
        "alpha_g1", "beta_g1", "delta_g1", "beta_g2", "delta_g2", "mats",
        "g1_groups",
    )

    def tree_flatten(self):
        return (
            tuple(getattr(self, f) for f in self._LEAF_FIELDS),
            (self.curve, self.num_inputs, self.num_constraints,
             self.n_pad, self.n_h, self.n_aux, self.g1_group_info,
             self.nv_tail),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            *children,
            curve=aux[0], num_inputs=aux[1], num_constraints=aux[2],
            n_pad=aux[3], n_h=aux[4], n_aux=aux[5], g1_group_info=aux[6],
            nv_tail=aux[7],
        )

    # -- host-side helpers (not traced) ---------------------------------------

    @property
    def params(self):
        return get_curve(self.curve)

    @property
    def fr_spec(self):
        return make_spec(self.params.r, name=f"{self.curve}.Fr")

    @property
    def domain(self) -> NttDomain:
        return NttDomain(self.params.fr, self.num_constraints + self.num_inputs)


def _pad_points(pt, n_pad, g):
    n = pt[2].shape[-1]
    if n == n_pad:
        return pt
    inf = g.infinity((n_pad - n,))
    return tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(pt, inf))


def group_lane_sizes(lengths) -> tuple:
    """Cluster MSM lane lengths into padded size classes.

    Greedy over ascending _pad_size: lanes whose padded length is within
    4/3 of the running class pad share a class (the class pads to its
    max).  At the bench circuits this yields {a, b1, l} at ~n/2 and {h}
    at n — 1.7x fewer scan adds than padding all four lanes to n —
    while identical lengths still collapse to the single-group layout.
    Returns ((npad, (canonical lane ids...)), ...)."""
    from groth16_tpu.msm.pippenger import _pad_size

    order = sorted(range(len(lengths)), key=lambda i: _pad_size(lengths[i]))
    groups = []
    for i in order:
        p = _pad_size(lengths[i])
        if groups and p * 3 <= groups[-1][0] * 4:
            groups[-1] = (max(groups[-1][0], p), groups[-1][1] + (i,))
        else:
            groups.append((p, (i,)))
    return tuple(groups)


def upload_proving_key(
    pk: ProvingKey,
    matrices: ConstraintMatrices,
    pad_multiple: int = 1,
    layout: str = "grouped",
) -> DeviceProvingKey:
    """pad_multiple: round the stacked MSM length up (mesh divisibility
    for the sharded prover).

    layout: "grouped" (single-chip prover; per-size-class G1 stacks so
    short lanes don't pad to the longest) or "stacked" (one [4, n_pad]
    stack — what the sharded prover's element-sharding consumes)."""
    c = get_curve(pk.vk.curve)
    fr = make_spec(c.r, name=f"{c.name}.Fr")
    g1 = codec.g1_ops(c)
    g2 = codec.g2_ops(c)

    def single_g1(p):
        return tuple(a[..., 0] for a in codec.g1_to_device(c, [p]))

    def single_g2(p):
        return tuple(a[..., 0] for a in codec.g2_to_device(c, [p]))

    n_h = len(pk.h_query)
    n_aux = len(pk.l_query)
    nv_tail = len(pk.a_query) - 1
    n_pad = max(n_h, n_aux, nv_tail)
    n_pad = -(-n_pad // pad_multiple) * pad_multiple

    queries = [pk.a_query[1:], pk.b_g1_query[1:], pk.h_query, pk.l_query]
    g1_groups = ()
    g1_group_info = ()
    stacked = None
    if layout == "grouped":
        info = group_lane_sizes([len(q) for q in queries])
        gs = []
        for npad_g, lane_ids in info:
            lanes_g = [
                _pad_points(codec.g1_to_device(c, queries[i]), npad_g, g1)
                for i in lane_ids
            ]
            gs.append(tuple(
                jnp.stack([lane[k] for lane in lanes_g], axis=-2)
                for k in range(3)
            ))
        g1_groups = tuple(gs)
        g1_group_info = info
    else:
        lanes = [_pad_points(codec.g1_to_device(c, q), n_pad, g1)
                 for q in queries]
        # lanes stacked just before the element axis: [*coords, 4, N] —
        # the layout msm_device_lanes consumes
        stacked = tuple(
            jnp.stack([lane[i] for lane in lanes], axis=-2) for i in range(3)
        )

    return DeviceProvingKey(
        g1_msm_points=stacked,
        g1_groups=g1_groups,
        g1_group_info=g1_group_info,
        nv_tail=nv_tail,
        b_g2_tail=codec.g2_to_device(c, pk.b_g2_query[1:]),
        a0=single_g1(pk.a_query[0]),
        b10=single_g1(pk.b_g1_query[0]),
        b20=single_g2(pk.b_g2_query[0]),
        alpha_g1=single_g1(pk.vk.alpha_g1),
        beta_g1=single_g1(pk.beta_g1),
        delta_g1=single_g1(pk.delta_g1),
        beta_g2=single_g2(pk.vk.beta_g2),
        delta_g2=single_g2(pk.vk.delta_g2),
        mats=encode_matrices(matrices, fr),
        curve=pk.vk.curve,
        num_inputs=matrices.num_instance_variables,
        num_constraints=matrices.num_constraints,
        n_pad=n_pad,
        n_h=n_h,
        n_aux=n_aux,
    )
