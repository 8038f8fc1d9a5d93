"""Sharding rules: how state and batches map onto the mesh.

Parameters and optimizer state are replicated (the model is small —
tens of MB — so tensor-parallel sharding would only add collectives);
batches shard their leading axis over ``data``.  The SPMD partitioner
then turns the loss-mean over the batch into a cross-device psum
automatically — no hand-written collectives in the train step.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch pytree with its leading axis over
    ``data`` (host -> device scatter)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_train_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
