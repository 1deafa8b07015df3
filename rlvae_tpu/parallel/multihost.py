"""Multi-host staging for whole-epoch compiled training.

Round-2 VERDICT item 3: ``make_epoch_fn_sharded`` was gated to
single-process runtimes, losing the one-dispatch-per-epoch win exactly where
the TPU-native story scales.  These helpers generalize its staging to any
``jax.process_count()`` (the reference has no analogue — single device
pinned, SURVEY §2c):

- ``stage_dataset``: assemble the GLOBAL dataset array over the mesh's data
  axis from each process's local rows via
  ``jax.make_array_from_process_local_data`` — each host uploads only its
  shard; no cross-host data movement (the data module already loads
  process-strided shards, data/cyclic.py).
- ``epoch_perm``: the per-epoch [steps, n_dev, local_bs] shard-local index
  matrix as a global array.  Every host computes the identical seeded numpy
  permutation and ``jax.make_array_from_callback`` hands each addressable
  device exactly its column — per-host slicing without assuming any device
  order.

Single-process runs take the same code path (process-local data = the whole
dataset), so the multi-host staging is exercised by every multi-device test
and by ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from rlvae_tpu.parallel.mesh import DATA_AXIS


def stage_dataset(mesh: Mesh, local_rows: np.ndarray) -> jax.Array:
    """Stage this process's dataset rows into the global batch-sharded array
    [N_global, ...] over the mesh's data axis.

    ``local_rows`` must be evenly divisible across this process's devices on
    the data axis (truncate first; `usable_local_rows` computes the count).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows)
    )


def usable_local_rows(mesh: Mesh, n_local: int) -> int:
    """Largest row count this process can stage evenly over its mesh-local
    data-axis devices."""
    n_dev_global = mesh.shape[DATA_AXIS]
    local_dev = max(1, n_dev_global // jax.process_count())
    return (n_local // local_dev) * local_dev


def host_epoch_perm(
    seed: int, epoch: int, n_steps: int, local_bs: int, shard_len: int, n_dev: int
) -> np.ndarray:
    """The seeded [n_steps, n_dev, local_bs] shard-LOCAL index matrix as host
    numpy — the single source of the epoch shuffle for BOTH the resident
    sharded epoch (staged via :func:`epoch_perm`) and the chunked sharded
    epoch (host-side row gather), so the two paths see identical batches."""
    rng = np.random.default_rng(seed + epoch)
    return np.stack(
        [
            rng.permutation(shard_len)[: n_steps * local_bs].reshape(n_steps, local_bs)
            for _ in range(n_dev)
        ],
        axis=1,
    ).astype(np.int32)  # [steps, n_dev, local_bs]


def epoch_perm(
    mesh: Mesh,
    seed: int,
    epoch: int,
    n_steps: int,
    local_bs: int,
    shard_len: int,
    n_dev: Optional[int] = None,
) -> jax.Array:
    """Global [n_steps, n_dev, local_bs] shard-LOCAL index matrix, sharded
    P(None, DATA_AXIS, None).

    Every host computes the identical seeded permutation (no collective
    needed); the callback hands each device its own column, so this works
    for any process count and device order.
    """
    n_dev = mesh.shape[DATA_AXIS] if n_dev is None else n_dev
    perm = host_epoch_perm(seed, epoch, n_steps, local_bs, shard_len, n_dev)
    sharding = NamedSharding(mesh, P(None, DATA_AXIS, None))
    return jax.make_array_from_callback(perm.shape, sharding, lambda idx: perm[idx])


def replicate_array(mesh: Mesh, value) -> jax.Array:
    """Fully-replicated global array (e.g. the epoch PRNG key) valid on any
    process count."""
    value = np.asarray(value)
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])
