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


def make_mesh(
    n_devices: Optional[int] = None, axis: str = DATA_AXIS
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


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
