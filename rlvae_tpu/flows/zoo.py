"""Additional normalizing flows: MAF, planar, radial.

Functional ports of the pythae flow zoo the reference vendors but does not
wire into the active path (reference: pythae models/normalizing_flows/
maf/maf_model.py, planar_flow/planar_flow_model.py,
radial_flow/radial_flow_model.py; SURVEY.md §2b marks them inactive).  They
share the MADE building block and the (y, log|det J|) convention of the IAF
module, so they can drop into the temporal chain or posterior experiments.

- MAF: the mirror of IAF — the *density* direction is one parallel MADE pass
  y = (x - mu) * exp(-s); the sampling direction is the D-step scan.
- Planar: y = x + u * tanh(w^T x + b) with the invertibility-preserving
  u-hat reparameterization.
- Radial: y = x + beta h(alpha, r) (x - x0) with softplus-constrained beta.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.flows.made import init_made, made_apply

Array = jax.Array


# ---------------------------------------------------------------------------
# MAF
# ---------------------------------------------------------------------------


def init_maf(key, input_dim, hidden_size=128, n_blocks=2, n_hidden=3):
    return [
        init_made(k, input_dim, [hidden_size] * n_hidden)
        for k in jax.random.split(key, n_blocks)
    ]


def maf_forward(params: List[Dict], masks: Sequence[Array], x: Array) -> Tuple[Array, Array]:
    """Density direction: one parallel pass per block."""
    logdet = jnp.zeros(x.shape[0], x.dtype)
    for block in params:
        mu, s = made_apply(block, masks, x)
        x = (x - mu) * jnp.exp(-s)
        logdet = logdet - jnp.sum(s, axis=-1)
        x = jnp.flip(x, axis=1)
    return x, logdet


def maf_inverse(params: List[Dict], masks: Sequence[Array], y: Array) -> Tuple[Array, Array]:
    """Sampling direction: D-step autoregressive scan per block."""
    d = y.shape[-1]
    logdet = jnp.zeros(y.shape[0], y.dtype)
    for block in reversed(params):
        y = jnp.flip(y, axis=1)

        def step(carry, i, block=block):
            x, ld = carry
            mu, s = made_apply(block, masks, x)
            y_i = jax.lax.dynamic_index_in_dim(y, i, axis=1, keepdims=False)
            mu_i = jax.lax.dynamic_index_in_dim(mu, i, axis=1, keepdims=False)
            s_i = jax.lax.dynamic_index_in_dim(s, i, axis=1, keepdims=False)
            x_i = y_i * jnp.exp(s_i) + mu_i
            x = jax.lax.dynamic_update_index_in_dim(x, x_i, i, axis=1)
            return (x, ld + s_i), None

        (y, ld), _ = jax.lax.scan(step, (jnp.zeros_like(y), jnp.zeros(y.shape[0], y.dtype)), jnp.arange(d))
        logdet = logdet + ld
    return y, logdet


# ---------------------------------------------------------------------------
# Planar
# ---------------------------------------------------------------------------


def init_planar(key, input_dim: int) -> Dict[str, Array]:
    kw, ku, kb = jax.random.split(key, 3)
    scale = 0.01
    return {
        "w": scale * jax.random.normal(kw, (input_dim,)),
        "u": scale * jax.random.normal(ku, (input_dim,)),
        "b": jnp.zeros(()),
    }


def planar_forward(params: Dict[str, Array], x: Array) -> Tuple[Array, Array]:
    w, u, b = params["w"], params["u"], params["b"]
    # u-hat reparameterization keeps the map invertible: w^T u >= -1
    wu = jnp.dot(w, u)
    u_hat = u + (jax.nn.softplus(wu) - 1.0 - wu) * w / (jnp.dot(w, w) + 1e-8)
    lin = x @ w + b  # [B]
    y = x + u_hat[None, :] * jnp.tanh(lin)[:, None]
    psi = (1.0 - jnp.tanh(lin) ** 2)[:, None] * w[None, :]
    logdet = jnp.log(jnp.abs(1.0 + psi @ u_hat) + 1e-8)
    return y, logdet


# ---------------------------------------------------------------------------
# Radial
# ---------------------------------------------------------------------------


def init_radial(key, input_dim: int) -> Dict[str, Array]:
    kx, ka, kb = jax.random.split(key, 3)
    return {
        "x0": 0.01 * jax.random.normal(kx, (input_dim,)),
        "log_alpha": jnp.zeros(()),
        "beta_raw": jnp.zeros(()),
    }


def radial_forward(params: Dict[str, Array], x: Array) -> Tuple[Array, Array]:
    d = x.shape[-1]
    x0, alpha = params["x0"], jnp.exp(params["log_alpha"])
    # invertibility: beta >= -alpha
    beta = -alpha + jax.nn.softplus(params["beta_raw"])
    diff = x - x0[None, :]
    r = jnp.linalg.norm(diff, axis=-1)  # [B]
    h = 1.0 / (alpha + r)
    y = x + (beta * h)[:, None] * diff
    h_prime = -(h**2)
    logdet = (d - 1) * jnp.log1p(beta * h) + jnp.log1p(beta * h + beta * h_prime * r)
    return y, logdet


def flow_param_count(params) -> int:
    return sum(np.asarray(a).size for a in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# BaseNF-style unified wrapper
# ---------------------------------------------------------------------------


class NormalizingFlow:
    """Unified stateful handle over the functional flow families — the
    equivalent of pythae's BaseNF surface (reference:
    normalizing_flows/base/base_nf_model.py:16-208: forward/inverse protocol
    + save/load), over ``iaf`` / ``maf`` / ``planar`` / ``radial``.

    ``forward`` maps data toward the prior returning (y, log|det J|);
    ``inverse`` maps prior samples back (planar/radial have no closed-form
    inverse — same as the reference, which raises there too).
    """

    FAMILIES = ("iaf", "maf", "planar", "radial")

    def __init__(self, family: str, input_dim: int, key=None,
                 hidden_size: int = 128, n_blocks: int = 2, n_hidden: int = 3,
                 params=None):
        from rlvae_tpu.flows.iaf import iaf_forward, iaf_inverse, iaf_masks, init_iaf

        if family not in self.FAMILIES:
            raise ValueError(f"family must be one of {self.FAMILIES}")
        self.family = family
        self.input_dim = input_dim
        self.meta = {"family": family, "input_dim": input_dim,
                     "hidden_size": hidden_size, "n_blocks": n_blocks,
                     "n_hidden": n_hidden}
        key = key if key is not None else jax.random.PRNGKey(0)
        if family in ("iaf", "maf"):
            self.masks = iaf_masks(input_dim, hidden_size, n_hidden)  # shared MADE masks
        if family == "iaf":
            self.params = params if params is not None else init_iaf(
                key, input_dim, hidden_size, n_blocks, n_hidden)
            self._fwd = lambda p, x: iaf_forward(p, self.masks, x)
            self._inv = lambda p, y: iaf_inverse(p, self.masks, y)
        elif family == "maf":
            self.params = params if params is not None else init_maf(
                key, input_dim, hidden_size, n_blocks, n_hidden)
            self._fwd = lambda p, x: maf_forward(p, self.masks, x)
            self._inv = lambda p, y: maf_inverse(p, self.masks, y)
        elif family == "planar":
            self.params = params if params is not None else init_planar(key, input_dim)
            self._fwd = planar_forward
            self._inv = None
        else:
            self.params = params if params is not None else init_radial(key, input_dim)
            self._fwd = radial_forward
            self._inv = None

    def forward(self, x) -> Tuple[Array, Array]:
        return self._fwd(self.params, jnp.asarray(x, jnp.float32))

    def inverse(self, y) -> Tuple[Array, Array]:
        if self._inv is None:
            raise NotImplementedError(
                f"{self.family} flows have no closed-form inverse "
                "(reference raises likewise)"
            )
        return self._inv(self.params, jnp.asarray(y, jnp.float32))

    # -- persistence (model.pt + model_config.json equivalent) ---------------
    def save(self, dir_path) -> None:
        import json
        from pathlib import Path

        d = Path(dir_path)
        d.mkdir(parents=True, exist_ok=True)
        flat = {}
        for i, leaf in enumerate(jax.tree_util.tree_leaves(self.params)):
            flat[f"leaf_{i}"] = np.asarray(leaf)
        np.savez(d / "model.npz", **flat)
        (d / "model_config.json").write_text(json.dumps(self.meta))

    @classmethod
    def load(cls, dir_path) -> "NormalizingFlow":
        import json
        from pathlib import Path

        d = Path(dir_path)
        meta = json.loads((d / "model_config.json").read_text())
        nf = cls(meta.pop("family"), meta.pop("input_dim"), **meta)
        with np.load(d / "model.npz") as zf:
            leaves = [jnp.asarray(zf[f"leaf_{i}"]) for i in range(len(zf.files))]
        treedef = jax.tree_util.tree_structure(nf.params)
        nf.params = jax.tree_util.tree_unflatten(treedef, leaves)
        return nf
