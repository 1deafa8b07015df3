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

from rlvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


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


# ---------------------------------------------------------------------------
# Tensor parallelism over the 'model' axis
# ---------------------------------------------------------------------------

TP_MIN_PARAM_SIZE = 65536  # only shard weights that are worth the collectives


def _param_spec(shape, model_size: int) -> P:
    """Sharding rule for one parameter: big >=2-D kernels shard their largest
    divisible dim over the model axis; everything else replicates.

    The MLP encoder/decoder kernels ([12288, 512] / [512, 12288] at the
    flagship shapes) dominate the parameter count; sharding their wide dim
    gives row-/column-parallel matmuls with XLA (GSPMD) placing the
    all-gather/reduce-scatter collectives on ICI."""
    import numpy as _np

    if len(shape) < 2 or int(_np.prod(shape)) < TP_MIN_PARAM_SIZE:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for dim in order:
        if shape[dim] % model_size == 0 and shape[dim] >= model_size:
            spec = [None] * len(shape)
            spec[dim] = MODEL_AXIS
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, tree) -> Any:
    """NamedSharding pytree for params/opt-state under DP x TP: leaves follow
    :func:`_param_spec`; applies to any tree whose leaves mirror parameter
    shapes (optimizer moments included)."""
    model_size = mesh.shape[MODEL_AXIS]

    def one(leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, _param_spec(tuple(shape), model_size))

    return jax.tree_util.tree_map(one, tree)


def shard_params(mesh: Mesh, tree) -> Any:
    """Place params (or opt state) under the DP x TP layout."""
    return jax.device_put(tree, param_shardings(mesh, tree))
