"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="space"):
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_grid(mesh, axis_name="space"):
    """Sharding that splits a (D, H, W) volume along z (axis 0)."""
    return NamedSharding(mesh, P(axis_name, None, None))


def shard_batch(mesh, axis_name="space"):
    """Sharding that splits a batch along axis 0."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh):
    return NamedSharding(mesh, P())
