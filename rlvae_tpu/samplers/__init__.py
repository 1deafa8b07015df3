from rlvae_tpu.samplers.hmc import (
    HMCConfig,
    refine_for_training,
    sample_posterior_hmc,
    sample_prior_hmc,
    calibrate_adaptive_plan,
    sample_prior_hmc_adaptive,
    sample_prior_hmc_adaptive_budget,
    sample_prior_hmc_planned,
    tempering,
)
from rlvae_tpu.samplers.generation import (
    SAMPLER_REGISTRY,
    BaseGenerationSampler,
    NormalSampler,
    RHVAEGenerationSampler,
    VampSampler,
)
from rlvae_tpu.samplers.riemannian import (
    POSTERIOR_METHODS,
    PRIOR_METHODS,
    reparam,
    sample_metric_aware_posterior,
    sample_posterior,
    sample_prior,
)

__all__ = [
    "reparam",
    "sample_posterior",
    "sample_prior",
    "sample_metric_aware_posterior",
    "POSTERIOR_METHODS",
    "PRIOR_METHODS",
    "HMCConfig",
    "sample_prior_hmc",
    "calibrate_adaptive_plan",
    "sample_prior_hmc_adaptive",
    "sample_prior_hmc_adaptive_budget",
    "sample_prior_hmc_planned",
    "sample_posterior_hmc",
    "refine_for_training",
    "tempering",
    "BaseGenerationSampler",
    "NormalSampler",
    "VampSampler",
    "RHVAEGenerationSampler",
    "SAMPLER_REGISTRY",
]
