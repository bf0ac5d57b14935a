"""Mesh construction and sharding specs.

The reference's only parallelism is single-host data parallelism via
``tf.distribute.MirroredStrategy`` (reference
``scripts/training/train_local.py:81-85``); its loss terms divide by
``num_replicas_in_sync`` so the implicit cross-replica SUM of gradients
equals the mean.

TPU-native redesign: training shards the batch over a 1-D ``data`` mesh
axis with ``jax.sharding.NamedSharding``; parameters and optimizer state
are replicated.  Gradients come out mean-reduced automatically because the
loss is a global mean over the sharded batch -- XLA inserts the psum over
ICI.  No explicit collectives, no replica bookkeeping, no loss rescaling.

Serving shards independent streams over the batch dim the same way
(multi-chip multi-stream), and the recurrent state inherits the batch
sharding so each stream's state stays pinned to its chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data-parallel mesh over the fastest (ICI) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_spec(mesh: Mesh) -> P:
    return P(mesh.axis_names[0])


def shard_batch(mesh: Mesh, tree):
    """Put a pytree on the mesh, sharding the leading (batch) axis."""
    spec = P(mesh.axis_names[0])

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)
