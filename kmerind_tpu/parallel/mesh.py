"""Device mesh helpers.

The reference's process model is a flat MPI communicator (``mxx::comm``);
ours is a `jax.sharding.Mesh`.  The default single-axis mesh ("shards") is
the analog of COMM_WORLD; a 2-level (host × chip) mesh maps the reference's
two-level hashing design (kmer_hash.hpp:24-54: hash prefix → process) onto
DCN × ICI axes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_axis_sharding", "SHARD_AXIS"]

SHARD_AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def shard_axis_sharding(mesh: Mesh, *rest_axes) -> NamedSharding:
    """Sharding that splits axis 0 across the shard axis."""
    return NamedSharding(mesh, P(SHARD_AXIS, *rest_axes))
