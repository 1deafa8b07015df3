"""CNN encoder/decoder.

Mirrors the reference's CNN variants (reference:
src/models/components/encoder_manager.py:67-135 — conv(3,s2,p1) + BN +
LeakyReLU + dropout per stage, then 512 -> 256 MLP head with dual latent
heads; decoder_manager.py:67-135 — latent -> 512 -> 256 -> C0*H0*W0 MLP,
ConvTranspose stack, final ConvTranspose to channels, no output activation).

TPU-first details: NHWC layout internally (NCHW at the API boundary for
reference-shaped data), bf16 activations / fp32 params, BatchNorm running
stats in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rlvae_tpu.utils.output import ModelOutput


class CNNEncoder(nn.Module):
    input_dim: Tuple[int, int, int]  # (C, H, W)
    latent_dim: int
    hidden_dims: Sequence[int] = (32, 64, 128, 256)
    kernel_size: int = 3
    stride: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> ModelOutput:
        # NCHW -> NHWC
        out = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            out = nn.Conv(
                h,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name=f"conv_{i}",
            )(out)
            out = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn_{i}"
            )(out)
            out = nn.leaky_relu(out.astype(self.dtype), 0.01)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = out.reshape(out.shape[0], -1)
        out = nn.relu(nn.Dense(512, dtype=self.dtype, name="head_0")(out))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.relu(nn.Dense(256, dtype=self.dtype, name="head_1")(out))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        embedding = nn.Dense(self.latent_dim, dtype=jnp.float32, name="embedding")(out)
        log_covariance = nn.Dense(self.latent_dim, dtype=jnp.float32, name="log_var")(out)
        return ModelOutput(embedding=embedding, log_covariance=log_covariance)


class CNNDecoder(nn.Module):
    input_dim: Tuple[int, int, int]  # (C, H, W)
    latent_dim: int
    hidden_dims: Sequence[int] = (256, 128, 64, 32)
    kernel_size: int = 3
    stride: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    # reconstruction dtype: fp32 default (parity); bfloat16 halves the
    # recon-sized HBM traffic that binds the train step (nets/mlp.py docs)
    out_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, deterministic: bool = True, train: bool = False
    ) -> ModelOutput:
        c, height, width = self.input_dim
        n = len(self.hidden_dims)
        h0, w0 = height // (2**n), width // (2**n)

        out = z.astype(self.dtype)
        out = nn.relu(nn.Dense(512, dtype=self.dtype, name="head_0")(out))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.relu(nn.Dense(256, dtype=self.dtype, name="head_1")(out))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.Dense(self.hidden_dims[0] * h0 * w0, dtype=self.dtype, name="expand")(out)
        out = out.reshape(out.shape[0], h0, w0, self.hidden_dims[0])

        for i, h in enumerate(self.hidden_dims[1:]):
            out = nn.ConvTranspose(
                h,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding="SAME",
                dtype=self.dtype,
                name=f"deconv_{i}",
            )(out)
            out = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn_{i}"
            )(out)
            out = nn.relu(out.astype(self.dtype))
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.ConvTranspose(
            c,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.out_dtype,
            name="deconv_out",
        )(out)
        # NHWC -> NCHW; the reference CNN decoder has no output activation
        recon = jnp.transpose(out, (0, 3, 1, 2))
        return ModelOutput(reconstruction=recon)
