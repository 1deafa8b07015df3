from rlvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh, resolve_num_devices
from rlvae_tpu.parallel.sharding import (
    batch_sharding,
    pad_to_devices,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_params,
)

from rlvae_tpu.parallel import metric_parallel

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "metric_parallel",
    "create_mesh",
    "resolve_num_devices",
    "batch_sharding",
    "replicated",
    "replicate",
    "shard_batch",
    "pad_to_devices",
    "param_shardings",
    "shard_params",
]
