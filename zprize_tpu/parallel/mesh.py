"""Mesh construction helpers.

The reference's only real distributed backend is winderica's hand-rolled
tokio-TCP RPC star (`distributed/src/worker/mod.rs:89-128`); on TPU the
entire layer collapses into SPMD collectives over a device mesh
(`SURVEY.md §5`): psum for partial-sum merges, all_to_all for transposes /
quotient scatter, all_gather for commitment collection.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, x, axis_name: str = "shard"):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, PartitionSpec(axis_name)))
