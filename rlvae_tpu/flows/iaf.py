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


def _block_forward_fixedpoint(
    params: Dict[str, jax.Array],
    masks: Sequence[jax.Array],
    x: jax.Array,
    h: Optional[jax.Array],
    n_iters: int,
) -> Tuple[jax.Array, jax.Array]:
    """One MADE block in the density direction by Jacobi fixed-point
    iteration instead of the D-step sequential scan.

    The density pass solves the strictly triangular system
    ``y = (x - mu(y)) * exp(-s(y))`` (MADE's output i depends only on
    ``y_{<i}``).  The Jacobi map ``y <- (x - mu(y)) * exp(-s(y))`` makes
    dim i EXACT after i+1 iterations — ``n_iters >= D`` reproduces the
    sequential algorithm bit-for-bit — and converges geometrically in far
    fewer passes when the flow contracts.  Each iteration is ONE full MADE
    pass, the same cost as one sequential dim-step, so the pass count
    drops from D to n_iters + 1 (a final pass evaluates (mu, s) at the
    converged y so the output and log|det J| are self-consistent, exactly
    as the sequential algorithm's per-dim terms are)."""

    def step(y, _):
        mu, s = made_apply(params, masks, y, h)
        return (x - mu) * jnp.exp(-s), None

    y, _ = jax.lax.scan(step, jnp.zeros_like(x), None, length=n_iters)
    mu, s = made_apply(params, masks, y, h)
    y = (x - mu) * jnp.exp(-s)
    return y, -jnp.sum(s, axis=-1)


def iaf_forward_fixedpoint(
    params: List[Dict[str, jax.Array]],
    masks: Sequence[jax.Array],
    x: jax.Array,
    h: Optional[jax.Array] = None,
    n_iters: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Density direction via Jacobi fixed-point blocks (see
    :func:`_block_forward_fixedpoint`); exact when ``n_iters >= input_dim``."""
    logdet = jnp.zeros(x.shape[0], x.dtype)
    for block in params:
        x, ld = _block_forward_fixedpoint(block, masks, x, h, n_iters)
        logdet = logdet + ld
        x = jnp.flip(x, axis=1)
    return x, logdet


def fixedpoint_error(
    params: List[Dict[str, jax.Array]],
    masks: Sequence[jax.Array],
    x: jax.Array,
    n_iters: int,
    h: Optional[jax.Array] = None,
) -> Tuple[float, float]:
    """Validate a fixed-point iteration count against the exact scan.

    Convergence at ``n_iters < D - 1`` is weight-dependent (the Jacobi map
    only contracts when the trained coupling does), so before lowering
    ``fixedpoint_iters`` on a trained model, probe it here with
    representative inputs.  Returns ``(max_rel_y, max_abs_logdet)``: the
    max elementwise relative deviation of the transformed latents (relative
    to ``max(|y_exact|, 1)``) and the max absolute log-det deviation, both
    as Python floats.  Bit-exact configurations return ``(0.0, 0.0)``.
    """
    y_ref, ld_ref = iaf_forward(params, masks, x, h)
    y_fp, ld_fp = iaf_forward_fixedpoint(params, masks, x, h, n_iters=n_iters)
    got = jax.device_get({"y": (y_fp, y_ref), "ld": (ld_fp, ld_ref)})
    (y_fp, y_ref), (ld_fp, ld_ref) = got["y"], got["ld"]
    import numpy as np

    rel = np.abs(y_fp - y_ref) / np.maximum(np.abs(y_ref), 1.0)
    return float(rel.max()), float(np.abs(ld_fp - ld_ref).max())


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
