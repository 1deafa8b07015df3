"""Torch-artifact converters.

The reference ships .pt artifacts (datasets, pretrained encoder/decoder state
dicts, metric files — reference: data/README.md, config.py:20-31).  These
converters produce the framework's native .npz equivalents; torch is only
required at conversion time.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np


def _torch_load(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_dataset(src: str | Path, dst: str | Path) -> tuple:
    """Convert a [N, T, C, H, W] tensor .pt dataset to .npz."""
    data = _torch_load(src)
    if isinstance(data, dict):
        # real Sprites artifacts wrap the tensor in {'data': ...}
        data = data["data"] if "data" in data else next(iter(data.values()))
    arr = data.detach().cpu().numpy().astype(np.float32)
    dst = Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dst, sequences=arr)
    return arr.shape


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Key-prefix tolerance matching the reference's 5-variant loader
    (reference: encoder_manager.py:260-326)."""
    prefixes = ("encoder.", "decoder.", "model.encoder.", "model.decoder.", "module.")
    out = dict(sd)
    for p in prefixes:
        if all(k.startswith(p) for k in out):
            out = {k[len(p):]: v for k, v in out.items()}
    return out


def torch_mlp_encoder_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a pythae Encoder_VAE_MLP state dict onto MLPEncoder params
    (reference: default_architectures.py:60-116: layers.0.0 -> hidden_0,
    embedding, log_var heads)."""
    sd = _strip_prefixes(sd)

    def wb(prefix):
        return sd[f"{prefix}.weight"].T.astype(np.float32), sd[f"{prefix}.bias"].astype(np.float32)

    k0, b0 = wb("layers.0.0")
    ke, be = wb("embedding")
    kv, bv = wb("log_var")
    return {
        "params": {
            "hidden_0": {"kernel": k0, "bias": b0},
            "embedding": {"kernel": ke, "bias": be},
            "log_var": {"kernel": kv, "bias": bv},
        }
    }


def torch_mlp_decoder_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a pythae Decoder_AE_MLP state dict onto MLPDecoder params
    (reference: default_architectures.py:168-221: layers.0.0, layers.1.0)."""
    sd = _strip_prefixes(sd)

    def wb(prefix):
        return sd[f"{prefix}.weight"].T.astype(np.float32), sd[f"{prefix}.bias"].astype(np.float32)

    k0, b0 = wb("layers.0.0")
    k1, b1 = wb("layers.1.0")
    return {
        "params": {
            "hidden_0": {"kernel": k0, "bias": b0},
            "out": {"kernel": k1, "bias": b1},
        }
    }


def convert_component(src: str | Path, dst: str | Path, kind: str) -> None:
    """Convert encoder.pt / decoder.pt to a flat .npz of flax params."""
    raw = _torch_load(src)
    sd = state_dict_to_numpy(raw if not hasattr(raw, "state_dict") else raw.state_dict())
    params = (
        torch_mlp_encoder_to_flax(sd) if kind == "encoder" else torch_mlp_decoder_to_flax(sd)
    )
    flat = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = v

    walk(params)
    dst = Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez(dst, **flat)


def load_component_npz(path: str | Path) -> Dict[str, Any]:
    """Load a flat component .npz back into a nested flax variables dict."""
    nested: Dict[str, Any] = {}
    with np.load(path) as zf:
        for key in zf.files:
            parts = key.split("/")
            node = nested
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(zf[key])
    return nested
