"""Sharding layouts + helpers for the data-parallel training step.

Batch sharded over the ``data`` axis, parameters replicated; gradients are
reduced by XLA-inserted psums when the jitted step runs under these shardings
(pjit-style: we annotate in/out shardings and let the partitioner place the
collectives on ICI).  Host-side batches are placed with
``jax.device_put(batch, batch_sharding)`` so each chip only receives its
shard.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlvae_tpu.parallel.mesh import DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch) -> Any:
    """Place a host batch with its leading dim sharded over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_devices(batch, n_devices: int):
    """Drop trailing examples so the batch divides the mesh (static shapes)."""
    n = (batch.shape[0] // n_devices) * n_devices
    return batch[:n]
