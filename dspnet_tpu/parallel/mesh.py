"""Mesh + sharding helpers.

TPU-native replacement for the reference's parallelism story (SURVEY.md
section 2.7): the reference's only strategy is data parallelism through
MXNet KVStore on a GPU list (train/train_multitask.py:235-246); here DP is a
1-D ``jax.sharding.Mesh`` over all chips, batches sharded on the ``data``
axis, parameters replicated, and gradient reduction left to XLA's SPMD
partitioner (psum over ICI). A second ``model`` axis is plumbed through for
future tensor/spatial sharding experiments.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree onto the mesh, batch-sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
