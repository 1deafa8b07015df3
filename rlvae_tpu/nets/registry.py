"""Encoder/decoder factory — the plug-and-play architecture registry.

Replaces the reference's EncoderManager/DecoderManager construction switch
(reference: src/models/components/encoder_manager.py:40-239,
decoder_manager.py:40-240): ``mlp`` / ``cnn`` / ``resnet`` / ``custom``
(custom falls back to MLP with a warning, matching encoder_manager.py:227-239).

Config keys accept both the reference YAML spellings (``layers``) and the
manager-internal ones (``hidden_dims``).
"""

from __future__ import annotations

import warnings
from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rlvae_tpu.nets.cnn import CNNDecoder, CNNEncoder
from rlvae_tpu.nets.mlp import MLPDecoder, MLPEncoder
from rlvae_tpu.nets.resnet import ResNetDecoder, ResNetEncoder

# activation-dtype policy knob (config `dtype:`); params always stay fp32
_DTYPES = {
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    "float32": jnp.float32, "fp32": jnp.float32,
}


def _get(cfg: Optional[Mapping[str, Any]], *keys, default=None):
    for k in keys:
        if cfg is not None and cfg.get(k) is not None:
            return cfg[k]
    return default


def _dtype(config: Optional[Mapping[str, Any]]) -> jnp.dtype:
    return _DTYPES[str(_get(config, "dtype", default="bfloat16")).lower()]


def _out_dtype(config: Optional[Mapping[str, Any]]) -> jnp.dtype:
    # reconstruction dtype (decoders only): fp32 default = reference parity;
    # bfloat16 halves the recon-sized HBM traffic that binds the train step
    # (see MLPDecoder docstring / scripts/profile_step_breakdown.py)
    return _DTYPES[str(_get(config, "out_dtype", default="float32")).lower()]


def create_encoder(
    input_dim: Tuple[int, ...],
    latent_dim: int,
    config: Optional[Mapping[str, Any]] = None,
) -> nn.Module:
    arch = str(_get(config, "architecture", default="mlp")).lower()
    if arch == "custom":
        warnings.warn("Custom encoder not implemented, falling back to MLP")
        arch = "mlp"
    if arch == "mlp":
        return MLPEncoder(
            input_dim=tuple(input_dim),
            latent_dim=latent_dim,
            hidden_dims=tuple(_get(config, "hidden_dims", default=(512,))),
            dropout=float(_get(config, "dropout", default=0.0)),
            dtype=_dtype(config),
        )
    if arch == "cnn":
        return CNNEncoder(
            input_dim=tuple(input_dim),
            latent_dim=latent_dim,
            hidden_dims=tuple(_get(config, "layers", "hidden_dims", default=(32, 64, 128, 256))),
            kernel_size=int(_get(config, "kernel_size", default=3)),
            stride=int(_get(config, "stride", default=2)),
            dropout=float(_get(config, "dropout", default=0.1)),
            dtype=_dtype(config),
        )
    if arch == "resnet":
        return ResNetEncoder(
            input_dim=tuple(input_dim),
            latent_dim=latent_dim,
            hidden_dims=tuple(_get(config, "layers", "hidden_dims", default=(64, 128, 256, 512))),
            num_blocks=tuple(_get(config, "num_blocks", default=(2, 2, 2, 2))),
            dropout=float(_get(config, "dropout", default=0.1)),
            dtype=_dtype(config),
        )
    raise ValueError(f"Unknown encoder architecture: {arch}")


def create_decoder(
    input_dim: Tuple[int, ...],
    latent_dim: int,
    config: Optional[Mapping[str, Any]] = None,
) -> nn.Module:
    arch = str(_get(config, "architecture", default="mlp")).lower()
    if arch == "custom":
        warnings.warn("Custom decoder not implemented, falling back to MLP")
        arch = "mlp"
    if arch == "mlp":
        return MLPDecoder(
            input_dim=tuple(input_dim),
            latent_dim=latent_dim,
            hidden_dims=tuple(_get(config, "hidden_dims", default=(512,))),
            dropout=float(_get(config, "dropout", default=0.0)),
            dtype=_dtype(config),
            out_dtype=_out_dtype(config),
        )
    if arch == "cnn":
        return CNNDecoder(
            input_dim=tuple(input_dim),
            latent_dim=latent_dim,
            hidden_dims=tuple(_get(config, "layers", "hidden_dims", default=(256, 128, 64, 32))),
            kernel_size=int(_get(config, "kernel_size", default=3)),
            stride=int(_get(config, "stride", default=2)),
            dropout=float(_get(config, "dropout", default=0.1)),
            dtype=_dtype(config),
            out_dtype=_out_dtype(config),
        )
    if arch == "resnet":
        return ResNetDecoder(
            input_dim=tuple(input_dim),
            latent_dim=latent_dim,
            hidden_dims=tuple(_get(config, "layers", "hidden_dims", default=(512, 256, 128, 64))),
            num_blocks=tuple(_get(config, "num_blocks", default=(2, 2, 2, 2))),
            dropout=float(_get(config, "dropout", default=0.1)),
            dtype=_dtype(config),
            out_dtype=_out_dtype(config),
        )
    raise ValueError(f"Unknown decoder architecture: {arch}")
