"""Device mesh construction over ICI.

The reference trains on exactly one GPU (reference: conf/training/quick.yaml:11
pins ``devices: 1`` "to avoid device mismatches"; no torch.distributed
anywhere — SURVEY.md §2c).  This module is the TPU-native replacement: a
1-D ``data`` mesh over all local chips by default, with an optional second
axis accepted for future multi-slice (DCN) layouts.  XLA collectives over ICI
are the communication backend — there is no NCCL analogue to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh (or 2-D data x model when model_parallel > 1)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def resolve_num_devices(devices_config) -> int:
    """Map the trainer config's ``devices`` field (int | 'all' | 'auto') onto
    an actual device count."""
    if devices_config in (None, "auto"):
        return 1  # reference default: single device
    if devices_config == "all":
        return jax.device_count()
    # clamp to the real device count: create_mesh truncates its device list
    # to what exists, so an un-clamped request would leave Trainer.n_devices
    # disagreeing with mesh.shape['data'] and silently corrupt the
    # sharded-epoch batch/step math
    return max(1, min(int(devices_config), jax.device_count()))
