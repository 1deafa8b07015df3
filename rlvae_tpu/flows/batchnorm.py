"""Invertible BatchNorm flow layer.

Reimplements the reference's flow BatchNorm (reference: pythae
models/normalizing_flows/layers.py:35-103): learnable (log_gamma, beta),
running mean/var with momentum 0.1, forward normalizes with batch stats in
training / running stats in eval, log|det J| = sum(log_gamma - 0.5 log(var+eps)).

The IAF config exposes ``include_batch_norm`` (default False, the reference's
setting — iaf_config.py; FlowManager never enables it).  This is the
functional building block: state (running stats) is threaded explicitly so it
composes with jit — ``apply`` returns (y, logdet, new_state).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def init_batchnorm(num_features: int) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Returns (params, state)."""
    params = {
        "log_gamma": jnp.zeros(num_features, jnp.float32),
        "beta": jnp.zeros(num_features, jnp.float32),
    }
    state = {
        "running_mean": jnp.zeros(num_features, jnp.float32),
        "running_var": jnp.ones(num_features, jnp.float32),
    }
    return params, state


def batchnorm_forward(
    params: Dict[str, Array],
    state: Dict[str, Array],
    x: Array,
    train: bool = False,
    eps: float = 1e-5,
    momentum: float = 0.1,
) -> Tuple[Array, Array, Dict[str, Array]]:
    """Forward (density direction); returns (y, log|det J| [B], new_state)."""
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0, ddof=1)  # torch .var() default: unbiased
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * var,
            # batch stats retained for a potential training-mode inverse
            # (reference: layers.py:83-95)
            "batch_mean": mean,
            "batch_var": var,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    y = (x - mean) / jnp.sqrt(var + eps) * jnp.exp(params["log_gamma"]) + params["beta"]
    logdet = jnp.sum(params["log_gamma"] - 0.5 * jnp.log(var + eps))
    return y, jnp.full(x.shape[0], logdet, x.dtype), new_state


def batchnorm_inverse(
    params: Dict[str, Array],
    state: Dict[str, Array],
    y: Array,
    train: bool = False,
    eps: float = 1e-5,
) -> Tuple[Array, Array]:
    """Inverse (sampling direction); returns (x, log|det J| [B])."""
    if train and "batch_mean" in state:
        mean, var = state["batch_mean"], state["batch_var"]
    else:
        mean, var = state["running_mean"], state["running_var"]
    x = (y - params["beta"]) * jnp.exp(-params["log_gamma"]) * jnp.sqrt(var + eps) + mean
    logdet = jnp.sum(-params["log_gamma"] + 0.5 * jnp.log(var + eps))
    return x, jnp.full(y.shape[0], logdet, y.dtype)
