from rlvae_tpu.flows.iaf import iaf_forward, iaf_inverse, iaf_masks, init_iaf
from rlvae_tpu.flows.made import init_made, made_apply, make_degrees, make_masks
from rlvae_tpu.flows.temporal import (
    TemporalFlowConfig,
    apply_temporal_flows,
    count_params,
)

__all__ = [
    "make_degrees",
    "make_masks",
    "init_made",
    "made_apply",
    "init_iaf",
    "iaf_masks",
    "iaf_forward",
    "iaf_inverse",
    "TemporalFlowConfig",
    "apply_temporal_flows",
    "count_params",
]
