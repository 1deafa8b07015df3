"""Research model zoo — TPU-native reimplementations of the vendored pythae
longitudinal research models (reference: src/lib/src/pythae/models/{vamp,
gp_vae,riem}/; SURVEY §2b marked them inactive-legacy, VERDICT round 1 item
10 requested them for literal whole-repo coverage)."""

from rlvae_tpu.models.research.gpvae import GPVAE
from rlvae_tpu.models.research.gugus import LVAE_GUGUS
from rlvae_tpu.models.research.lldm import (
    LLDM,
    DDIMSampler,
    LatentDiffusion,
    SampledMetric,
    pretrain_latent_diffusion,
)
from rlvae_tpu.models.research.lvae_iaf import LVAE_IAF
from rlvae_tpu.models.research.riem import RIEM
from rlvae_tpu.models.research.vamp import VAMP

__all__ = [
    "VAMP", "GPVAE", "RIEM", "LLDM", "LVAE_IAF", "LVAE_GUGUS",
    "LatentDiffusion", "DDIMSampler", "SampledMetric",
    "pretrain_latent_diffusion",
]
