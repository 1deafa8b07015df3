from rlvae_tpu.models import losses
from rlvae_tpu.models.factory import (
    apply_model_overrides,
    create_comparison_suite,
    create_hybrid_model,
    create_model,
)
from rlvae_tpu.models.metrics import MetricsCollector
from rlvae_tpu.models.rlvae import RlVAE

__all__ = [
    "RlVAE",
    "losses",
    "create_model",
    "create_hybrid_model",
    "create_comparison_suite",
    "apply_model_overrides",
    "MetricsCollector",
]
