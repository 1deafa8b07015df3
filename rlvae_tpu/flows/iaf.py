"""Inverse Autoregressive Flow, jit/scan-native.

Functional reimplementation of the reference IAF (reference:
src/lib/src/pythae/models/normalizing_flows/iaf/iaf_model.py:15-111, config
iaf_config.py: n_blocks=2, n_hidden_in_made=3, hidden 128/256, no batchnorm):

- ``forward`` is the density direction the temporal flow chain uses
  (flow_manager.py:45-56): per MADE block, the D-dimensional autoregressive
  update y_i = (x_i - mu_i(y)) * exp(-s_i(y)) runs as a ``lax.scan`` over
  dims (the reference's Python loop, iaf_model.py:63-82); sum log|det J|
  accumulates -s_i; dims are flipped after every block (iaf_model.py:81).
- ``inverse`` (sampling direction) is a single parallel pass per block:
  y = y * exp(s) + mu, log|det J| += sum(s) (iaf_model.py:85-111).

Params are a list (one dict per MADE block); masks are static and shared by
all blocks.  The whole flow is differentiable end-to-end.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rlvae_tpu.flows.made import init_made, make_masks, made_apply


def iaf_masks(input_dim: int, hidden_size: int, n_hidden: int = 3):
    return [jnp.asarray(m) for m in make_masks(input_dim, [hidden_size] * n_hidden)]


def init_iaf(
    key: jax.Array,
    input_dim: int,
    hidden_size: int = 256,
    n_blocks: int = 2,
    n_hidden: int = 3,
    context_dim: Optional[int] = None,
    log_var_bias_init: float = -2.0,
) -> List[Dict[str, jax.Array]]:
    keys = jax.random.split(key, n_blocks)
    return [
        init_made(k, input_dim, [hidden_size] * n_hidden, context_dim,
                  log_var_bias_init=log_var_bias_init)
        for k in keys
    ]


def _block_forward(
    params: Dict[str, jax.Array],
    masks: Sequence[jax.Array],
    x: jax.Array,
    h: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """One MADE block in the density direction: scan over the D dims."""
    d = x.shape[-1]

    def step(carry, i):
        y, logdet = carry
        mu, s = made_apply(params, masks, y, h)
        col = jax.lax.dynamic_index_in_dim(x, i, axis=1, keepdims=False)
        mu_i = jax.lax.dynamic_index_in_dim(mu, i, axis=1, keepdims=False)
        s_i = jax.lax.dynamic_index_in_dim(s, i, axis=1, keepdims=False)
        y_i = (col - mu_i) * jnp.exp(-s_i)
        y = jax.lax.dynamic_update_index_in_dim(y, y_i, i, axis=1)
        return (y, logdet - s_i), None

    init = (jnp.zeros_like(x), jnp.zeros(x.shape[0], x.dtype))
    (y, logdet), _ = jax.lax.scan(step, init, jnp.arange(d))
    return y, logdet


def iaf_forward(
    params: List[Dict[str, jax.Array]],
    masks: Sequence[jax.Array],
    x: jax.Array,
    h: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Density direction f^{-1}: returns (out, sum log|det J|)."""
    logdet = jnp.zeros(x.shape[0], x.dtype)
    for block in params:
        x, ld = _block_forward(block, masks, x, h)
        logdet = logdet + ld
        x = jnp.flip(x, axis=1)
    return x, logdet


def iaf_inverse(
    params: List[Dict[str, jax.Array]],
    masks: Sequence[jax.Array],
    y: jax.Array,
    h: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sampling direction f: one parallel pass per block."""
    logdet = jnp.zeros(y.shape[0], y.dtype)
    for block in reversed(params):
        y = jnp.flip(y, axis=1)
        mu, s = made_apply(block, masks, y, h)
        y = y * jnp.exp(s) + mu
        logdet = logdet + jnp.sum(s, axis=-1)
    return y, logdet
