"""Device-mesh construction (the rayon-thread-pool analog, SURVEY.md §2.4).

The reference's only parallelism is shared-memory rayon
(/root/reference/Cargo.toml:44-47); the TPU equivalent is a
`jax.sharding.Mesh` over the slice with named axes, collectives riding
ICI.  Groth16's data parallelism is one-dimensional at heart (points /
coefficients sharded on one axis), so the default mesh is 1D "data";
multi-host topologies can reshape to ("host", "chip").
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def axis_size(mesh: Mesh, axis) -> int:
    """Devices along `axis` — a name or a tuple of names (a 2D
    host×chip mesh passes axis=("host", "chip") to shard the element
    axis across the combined extent, DCN-major so that the inner
    collective hops ride ICI)."""
    if isinstance(axis, (tuple, list)):
        s = 1
        for a in axis:
            s *= mesh.shape[a]
        return s
    return mesh.shape[axis]


def make_mesh(
    n_devices: Optional[int] = None, axis: str = DATA_AXIS
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(
    n_hosts: int,
    chips_per_host: int,
    axes: tuple = ("host", "chip"),
) -> Mesh:
    """Multi-host mesh (BASELINE config 5): outer axis = hosts (DCN),
    inner axis = chips within a host (ICI).  Collectives taking the
    combined axis tuple split traffic hierarchically; passing
    axis=axes to ShardedProver/ShardedNtt shards elements over all
    n_hosts * chips_per_host devices."""
    devs = jax.devices()[: n_hosts * chips_per_host]
    return Mesh(np.array(devs).reshape(n_hosts, chips_per_host), axes)


def shard_elements(mesh: Mesh, x, axis: str = DATA_AXIS):
    """Place a limb-major array (or pytree) sharded along its trailing
    element axis (the fields/fp.py convention: batch axes trail)."""

    def put(a):
        spec = P(*([None] * (a.ndim - 1) + [axis]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, x)


def replicated(mesh: Mesh, x):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
