"""rlvae_tpu — a TPU-native (JAX/Flax/Pallas) framework for Riemannian Flow VAEs.

A from-scratch rebuild of the capabilities of the antoinelfg/RlVAE research
framework (Riemannian Flow VAEs over cyclic longitudinal image sequences),
designed TPU-first:

- ``geometry``: centroid-based Riemannian metric G(z) with a fused Pallas
  kernel for the hot path (reference: src/models/components/metric_tensor.py).
- ``flows``: MADE/IAF normalizing flows and the temporal flow chain as
  ``lax.scan`` loops (reference: pythae IAF + src/models/components/flow_manager.py).
- ``samplers``: Riemannian posterior/prior samplers and manifold HMC as
  jit/vmap'd nested scans (reference: src/models/samplers/).
- ``models``: the single configurable RlVAE model family
  (reference: src/models/{riemannian_flow_vae,modular_rlvae,hybrid_rlvae}.py).
- ``train`` / ``parallel``: a jit + shard_map data-parallel training loop over a
  ``jax.sharding.Mesh`` (replacing PyTorch Lightning).
- ``config``: a Hydra-compatible YAML config composer (group defaults, dotted
  CLI overrides, interpolation, multirun sweeps).
"""

__version__ = "0.1.0"

from rlvae_tpu.utils.output import ModelOutput  # noqa: F401
