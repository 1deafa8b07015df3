"""Held-out model evaluation: reconstruction and missing-data imputation.

Reimplements the reference's evaluation script capabilities (reference:
src/lib/scripts/evaluation.py:20-170): per-frame summed-MSE reconstruction
error averaged over repeated stochastic passes, and the two missing-data
metrics — MSE on masked-out pixels of observed frames, and MSE on fully
masked-out frames (imputation quality).

TPU-first: one jitted forward per batch; each metric is a masked reduction
over the same [B, T, ...] reconstruction (no per-sample Python loops).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _takes(model, name: str) -> bool:
    import inspect

    return name in inspect.signature(model.forward).parameters


def _forward_recon(model, variables, x, key, seq_mask=None, pix_mask=None,
                   vi_index=None):
    kwargs = {}
    if _takes(model, "epoch"):
        # forward's epoch defaults to 100, which still lands in the WARMUP
        # branch of models trained with warmup >= 100 — evaluation must run
        # the trained (post-warmup) branch
        kwargs["epoch"] = 10**9
    if vi_index is not None and _takes(model, "vi_index"):
        # longitudinal models (LVAE_IAF/RIEM families) draw a host-side
        # random visit index when it is omitted — under jit that draw would
        # be baked in at trace time, so the caller passes it explicitly
        kwargs["vi_index"] = vi_index
    if _takes(model, "seq_mask"):
        kwargs["seq_mask"] = seq_mask
        kwargs["pix_mask"] = pix_mask
    elif seq_mask is not None or pix_mask is not None:
        # models without native mask support (e.g. RlVAE) must not SEE the
        # masked-out content, or the imputation metrics are leaky: zero it
        # out before the forward instead
        if pix_mask is not None:
            x = x * pix_mask
        if seq_mask is not None:
            x = x * seq_mask[:, :, None, None, None]
    out = model.forward(variables, x, key, **kwargs)
    recon = out.get("recon_x", out.get("reconstruction"))
    return jnp.asarray(recon).reshape(x.shape)


def evaluate_reconstruction(
    model,
    variables: Dict[str, Any],
    data: np.ndarray,
    key: Optional[jax.Array] = None,
    batch_size: int = 32,
    n_runs: int = 5,
) -> Dict[str, float]:
    """Mean per-frame summed MSE over ``n_runs`` stochastic passes
    (evaluation.py:20-57)."""
    import functools

    key = key if key is not None else jax.random.PRNGKey(0)
    data = np.asarray(data, np.float32)
    # per-(run, batch) visit index for longitudinal models, drawn host-side
    # and passed as a STATIC arg (at most n_obs retraces) so jit cannot
    # freeze one random draw for every pass
    vi_rng = np.random.default_rng(0) if _takes(model, "vi_index") else None

    @functools.partial(jax.jit, static_argnums=(3,))
    def batch_sq_err(variables, x, k, vi):
        recon = _forward_recon(model, variables, x, k, vi_index=vi)
        return jnp.sum((recon - x) ** 2)

    runs = []
    for r in range(n_runs):
        sums = []  # device scalars; ONE fetch per run (CLAUDE.md fetch rule)
        for i in range(0, data.shape[0], batch_size):
            x = jnp.asarray(data[i : i + batch_size])
            vi = int(vi_rng.integers(model.n_obs)) if vi_rng is not None else None
            sums.append(
                batch_sq_err(variables, x, jax.random.fold_in(jax.random.fold_in(key, r), i), vi)
            )
        total = jax.device_get(sums)
        n_frames = data.shape[0] * data.shape[1]
        runs.append(float(np.sum(total)) / n_frames)  # exact dataset mean
    return {
        "recon_mse": float(np.mean(runs)),
        "recon_mse_std": float(np.std(runs)),
        "n_runs": n_runs,
    }


def evaluate_missing(
    model,
    variables: Dict[str, Any],
    data: np.ndarray,
    seq_mask: np.ndarray,
    pix_mask: np.ndarray,
    key: Optional[jax.Array] = None,
    batch_size: int = 32,
    n_runs: int = 5,
) -> Dict[str, float]:
    """Imputation metrics (evaluation.py:60-140): summed MSE on (a) missing
    pixels of OBSERVED frames and (b) fully missing frames, per sequence."""
    key = key if key is not None else jax.random.PRNGKey(0)
    data = np.asarray(data, np.float32)
    seq_mask = np.asarray(seq_mask, np.float32)
    pix_mask = np.asarray(pix_mask, np.float32)
    import functools

    pix_runs, seq_runs = [], []
    n_seqs = data.shape[0]
    vi_rng = np.random.default_rng(0) if _takes(model, "vi_index") else None

    @functools.partial(jax.jit, static_argnums=(5,))
    def batch_missing_sums(variables, x, k, sm, pm, vi):
        recon = _forward_recon(
            model, variables, x, k, seq_mask=sm, pix_mask=pm, vi_index=vi
        )
        b, t = x.shape[0], x.shape[1]
        sq = ((recon - x) ** 2).reshape(b, t, -1)
        # (a) missing pixels within observed frames
        miss_pix = (sq * (1.0 - pm.reshape(b, t, -1))).sum(-1)
        # (b) fully missing frames
        frame = sq.sum(-1)
        return (
            jnp.sum(jnp.sum(miss_pix * sm, axis=-1)),
            jnp.sum(jnp.sum(frame * (1.0 - sm), axis=-1)),
        )

    for r in range(n_runs):
        sums = []  # device scalars; ONE fetch per run (CLAUDE.md fetch rule)
        for i in range(0, data.shape[0], batch_size):
            vi = int(vi_rng.integers(model.n_obs)) if vi_rng is not None else None
            sums.append(
                batch_missing_sums(
                    variables,
                    jnp.asarray(data[i : i + batch_size]),
                    jax.random.fold_in(jax.random.fold_in(key, r), i),
                    jnp.asarray(seq_mask[i : i + batch_size]),
                    jnp.asarray(pix_mask[i : i + batch_size]),
                    vi,
                )
            )
        fetched = jax.device_get(sums)
        pix_runs.append(float(sum(p for p, _ in fetched)) / n_seqs)
        seq_runs.append(float(sum(s for _, s in fetched)) / n_seqs)
    return {
        "missing_pixel_mse": float(np.mean(pix_runs)),
        "missing_pixel_mse_std": float(np.std(pix_runs)),
        "missing_frame_mse": float(np.mean(seq_runs)),
        "missing_frame_mse_std": float(np.std(seq_runs)),
        "n_runs": n_runs,
    }
