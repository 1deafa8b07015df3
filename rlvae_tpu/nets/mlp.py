"""MLP encoder/decoder — the default architectures.

Flax reimplementation of the reference defaults the pretrained checkpoints
assume (reference: pythae models/nn/default_architectures.py:60-116 for
Encoder_VAE_MLP — flatten -> 512 -> ReLU -> {embedding, log_covariance}
heads — and :168-221 for Decoder_AE_MLP — latent -> 512 -> ReLU ->
prod(input_dim) -> Sigmoid).

``hidden_dims`` generalizes to deep MLPs with dropout (the reference's
mlp_rlvae config *declares* [1024, 512, 256] but its Encoder_VAE_MLP
silently ignores it — here the config actually takes effect).  The default
``hidden_dims=(512,)`` reproduces the reference shapes exactly so converted
torch checkpoints load.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.utils.output import ModelOutput


class MLPEncoder(nn.Module):
    input_dim: Tuple[int, ...]  # (C, H, W)
    latent_dim: int
    hidden_dims: Sequence[int] = (512,)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16  # activations; params stay fp32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> ModelOutput:
        out = x.reshape(x.shape[0], -1).astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            out = nn.Dense(h, dtype=self.dtype, name=f"hidden_{i}")(out)
            out = nn.relu(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        embedding = nn.Dense(self.latent_dim, dtype=jnp.float32, name="embedding")(out)
        log_covariance = nn.Dense(self.latent_dim, dtype=jnp.float32, name="log_var")(out)
        return ModelOutput(embedding=embedding, log_covariance=log_covariance)


class MLPDecoder(nn.Module):
    """``out_dtype`` controls the RECONSTRUCTION dtype (default fp32 —
    reference parity).  The recon tensor is the largest array the train step
    touches ([B*T, C*H*W]; every fwd/bwd pass reads or writes it several
    times), and the step is HBM-bandwidth-bound on TPU (measured:
    scripts/profile_step_breakdown.py — XLA counts ~4e10 bytes/step at
    B=4096, 49 ms at the 819 GB/s v5e roofline vs 7 ms of flops), so
    ``out_dtype=bfloat16`` halves the binding traffic; the loss accumulates
    in fp32 either way (models/losses.reconstruction_loss)."""

    input_dim: Tuple[int, ...]  # (C, H, W)
    latent_dim: int
    hidden_dims: Sequence[int] = (512,)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    out_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> ModelOutput:
        out = z.astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            out = nn.Dense(h, dtype=self.dtype, name=f"hidden_{i}")(out)
            out = nn.relu(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.Dense(int(np.prod(self.input_dim)), dtype=self.out_dtype, name="out")(out)
        recon = nn.sigmoid(out).reshape((z.shape[0], *self.input_dim))
        return ModelOutput(reconstruction=recon)


class SVAEEncoderMLP(nn.Module):
    """Hyperspherical-VAE encoder head: flatten -> 512 -> ReLU ->
    {embedding [B, D], log_concentration [B, 1]} — the von Mises-Fisher
    posterior parameterization (reference: pythae
    models/nn/default_architectures.py:119-167 Encoder_SVAE_MLP)."""

    input_dim: Tuple[int, ...]
    latent_dim: int
    hidden_dims: Sequence[int] = (512,)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> ModelOutput:
        out = x.reshape(x.shape[0], -1).astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            out = nn.Dense(h, dtype=self.dtype, name=f"hidden_{i}")(out)
            out = nn.relu(out)
        embedding = nn.Dense(self.latent_dim, dtype=jnp.float32, name="embedding")(out)
        log_concentration = nn.Dense(1, dtype=jnp.float32,
                                     name="log_concentration")(out)
        return ModelOutput(embedding=embedding, log_concentration=log_concentration)


class DiscriminatorMLP(nn.Module):
    """Adversarial discriminator head: flatten -> 256 -> ReLU -> 1 ->
    sigmoid (reference: pythae models/nn/default_architectures.py:265-331
    Discriminator_MLP).  Intermediate activations are exposed under
    ``embedding_layer_{i}`` like the reference's output_layer_levels."""

    discriminator_input_dim: Tuple[int, ...]
    hidden_dims: Sequence[int] = (256,)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> ModelOutput:
        out = z.reshape(z.shape[0], -1).astype(self.dtype)
        inter = {}
        for i, h in enumerate(self.hidden_dims):
            out = nn.Dense(h, dtype=self.dtype, name=f"hidden_{i}")(out)
            out = nn.relu(out)
            inter[f"embedding_layer_{i + 1}"] = out
        out = nn.Dense(1, dtype=jnp.float32, name="out")(out)
        return ModelOutput(embedding=nn.sigmoid(out), **inter)
