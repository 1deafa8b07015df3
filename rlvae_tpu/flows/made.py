"""MADE — masked autoencoder for autoregressive density estimation.

Functional JAX reimplementation of the reference's MADE
(reference: src/lib/src/pythae/models/normalizing_flows/made/made_model.py and
layers.py:15-33), with the exact parity knobs:

- sequential degree assignment: m_-1 = 1..D;
  m_i = max(min(min(m_{i-1}), D-1), ceil(arange(1..H) * (D-1) / (H+1)))
  (made_model.py:83-118)
- hidden masks m_i[:, None] >= m_{i-1}[None, :]; output mask
  m_last[None, :] < m_-1[:, None], tiled twice for the (mu, log_var) heads
- the first (context) layer output feeds the next masked layer *without* an
  activation (made_model.py:124-131: ReLU only inside the Sequential)
- log_var clamped to +-1.5 (made_model.py:136-137), final-layer log_var bias
  initialized to -2.0 (made_model.py:79-81)

Masks are static 0/1 arrays baked at config time — under jit the masked
matmul is just an elementwise multiply fused into the MXU feed, so the D-step
autoregressive structure costs nothing extra per pass.

Parameters are plain pytrees (dict of arrays) rather than flax modules so the
IAF dimension-scan and the temporal flow chain can thread them through
``lax.scan`` without module plumbing.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_VAR_CLAMP = 1.5
LOG_VAR_BIAS_INIT = -2.0


def make_degrees(input_dim: int, hidden_sizes: Sequence[int]) -> List[np.ndarray]:
    """Sequential degree vectors [m_-1, m_0, ..., m_{L-1}]."""
    degrees = [np.arange(1, input_dim + 1)]
    for h in hidden_sizes:
        min_deg = min(int(degrees[-1].min()), input_dim - 1)
        deg = np.maximum(
            min_deg,
            np.ceil(np.arange(1, h + 1) * (input_dim - 1) / float(h + 1)).astype(np.int64),
        )
        degrees.append(deg)
    return degrees


def make_masks(input_dim: int, hidden_sizes: Sequence[int]) -> List[np.ndarray]:
    """Masks in [in, out] orientation (for ``x @ (mask * kernel)``).

    Returns one mask per masked layer: L hidden-feeding layers plus the
    output layer (already tiled x2 along out for the two heads).
    """
    degrees = make_degrees(input_dim, hidden_sizes)
    masks = []
    for prev, cur in zip(degrees[:-1], degrees[1:]):
        masks.append((cur[None, :] >= prev[:, None]).astype(np.float32))  # [in, out]
    out_mask = (degrees[-1][:, None] < degrees[0][None, :]).astype(np.float32)  # [H, D]
    masks.append(np.tile(out_mask, (1, 2)))  # [H, 2D]
    return masks


def init_made(
    key: jax.Array,
    input_dim: int,
    hidden_sizes: Sequence[int],
    context_dim: Optional[int] = None,
    log_var_bias_init: float = LOG_VAR_BIAS_INIT,
) -> Dict[str, jax.Array]:
    """Torch-Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    kernel and bias, log_var half of the final bias at ``log_var_bias_init``
    (reference default -2.0; 0.0 gives near-identity flows whose density
    direction doesn't amplify ~exp(1.5) per block at init)."""
    sizes = [input_dim, *hidden_sizes, 2 * input_dim]
    params: Dict[str, jax.Array] = {}
    keys = jax.random.split(key, 2 * len(sizes))
    for li, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        bound = 1.0 / np.sqrt(fan_in)
        params[f"w{li}"] = jax.random.uniform(
            keys[2 * li], (fan_in, fan_out), jnp.float32, -bound, bound
        )
        params[f"b{li}"] = jax.random.uniform(
            keys[2 * li + 1], (fan_out,), jnp.float32, -bound, bound
        )
    params[f"b{len(sizes) - 2}"] = (
        params[f"b{len(sizes) - 2}"].at[input_dim:].set(log_var_bias_init)
    )
    if context_dim is not None:
        bound = 1.0 / np.sqrt(context_dim)
        params["cw"] = jax.random.uniform(
            keys[-1], (context_dim, hidden_sizes[0]), jnp.float32, -bound, bound
        )
    return params


def made_apply(
    params: Dict[str, jax.Array],
    masks: Sequence[jax.Array],
    x: jax.Array,
    h: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward pass -> (mu, log_var), each [B, D].

    Layer stack mirrors the reference exactly: masked layer 0 (+ context, no
    bias on the context path), then [masked, ReLU] pairs, then the masked
    output layer; NO activation between layer 0 and layer 1.
    """
    n_layers = len(masks)
    d = x.shape[-1]
    out = x @ (masks[0] * params["w0"]) + params["b0"]
    if h is not None and "cw" in params:
        out = out + h @ params["cw"]
    for li in range(1, n_layers - 1):
        out = out @ (masks[li] * params[f"w{li}"]) + params[f"b{li}"]
        out = jax.nn.relu(out)
    li = n_layers - 1
    out = out @ (masks[li] * params[f"w{li}"]) + params[f"b{li}"]
    mu, log_var = out[..., :d], out[..., d:]
    log_var = jnp.clip(log_var, -LOG_VAR_CLAMP, LOG_VAR_CLAMP)
    return mu, log_var
