"""LVAE_GUGUS — the Riemannian-prior LVAE_IAF research line, unified.

The reference vendors FIVE incremental variants of this model (reference:
src/lib/src/pythae/models/lvae_gugus/{lvae_gugus,lvaeg,lvaeg2,lvaegA,
lvaegA2,lvaegg}_model.py, ~5.8k LoC of near-duplicates, all named
LVAE_GUGUS and all importing the same missing external diffusion packages).
They differ only in how far the Riemannian-prior experiment evolved; this
module implements their capability UNION once, on top of our LVAE_IAF:

- ``retrieve_metric`` / ``retrieve_metric_all``: estimate the mean latent
  GM_t and a diagonal metric G_t = diag(mean posterior std^2) per timestep
  from data (lvaeg2_model.py:113-163 retrieveG_all, :692 retrieveG),
- ``metric_tensor_field(z, t)``: stored G_t, or the pushforward of G_0
  through the flows via per-sample Jacobians (lvaeg2_model.py:946-965,
  :770-800 _push_metric — their per-sample autograd loop becomes one
  ``vmap(jacfwd)``),
- ``use_riemann_prior``: the visit-0 prior becomes the metric-volume
  density log p(z) = -0.5 log det G_0(z) (lvaeg_model.py _log_p_z),
- HMC generation on the estimated metric via the framework's own manifold
  HMC sampler (the reference calls the unvendored
  geometric_perspective_on_vaes.hmc_sampling)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.flows.iaf import iaf_forward, iaf_inverse
from rlvae_tpu.models.research.lvae_iaf import LVAE_IAF

Array = jax.Array


class LVAE_GUGUS(LVAE_IAF):
    def __init__(self, *args, use_riemann_prior: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_riemann_prior = use_riemann_prior
        self.gm_list: List[np.ndarray] = []  # mean latent per t, [1, D]
        self.g_list: List[np.ndarray] = []  # diagonal metric per t, [D, D]

    # -- metric estimation -------------------------------------------------------

    def retrieve_metric_all(
        self, variables: Dict[str, Any], data: Array, add_std_norm: bool = True
    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Per-timestep (GM_t, G_t) from the posterior statistics of ``data``
        [N, n_obs, ...] (lvaeg2_model.py:113-163)."""
        params = variables["params"]
        self.gm_list, self.g_list = [], []
        for t in range(self.n_obs):
            enc = self.encoder.apply({"params": params["encoder"]}, data[:, t])
            mu_avg = np.asarray(enc.embedding.mean(axis=0, keepdims=True))
            if add_std_norm:
                std_avg = np.asarray(jnp.exp(0.5 * enc.log_covariance).mean(axis=0))
                g_t = np.diag(std_avg**2)
            else:
                g_t = np.eye(self.latent_dim, dtype=np.float32)
            self.gm_list.append(mu_avg)
            self.g_list.append(g_t.astype(np.float32))
        return self.gm_list, self.g_list

    def retrieve_metric(self, variables: Dict[str, Any], data: Array,
                        vi_index: int = 0, add_std_norm: bool = True):
        """Single-timestep form kept for parity with retrieveG
        (lvaeg2_model.py:692-740)."""
        gms, gs = self.retrieve_metric_all(variables, data, add_std_norm)
        return gms[vi_index], gs[vi_index]

    # -- metric field -------------------------------------------------------------

    def push_metric(
        self, params, z: Array, g: Array, flow_idx: int, direction: str = "inverse"
    ) -> Tuple[Array, Array]:
        """Pushforward of the metric through one flow: for z' = f(z),
        G'(z') = J^{-T} G J^{-1} with J = df/dz (lvaeg2_model.py:770-800;
        the reference's per-sample autograd loop is one vmap(jacfwd))."""
        flow = params["flows"][flow_idx]

        def f(single):
            fn = iaf_inverse if direction == "inverse" else iaf_forward
            out, _ = fn(flow, self.masks, single[None, :])
            return out[0]

        jac = jax.vmap(jax.jacfwd(f))(z)  # [B, D, D]
        z_next = jax.vmap(f)(z)
        j_inv = jnp.linalg.inv(jac)
        g_next = jnp.einsum("bji,bjk,bkl->bil", j_inv, jnp.broadcast_to(g, jac.shape), j_inv)
        return z_next, g_next

    def metric_tensor_field(self, variables: Dict[str, Any], z: Array, t: int) -> Array:
        """G_t(z): the stored per-timestep metric when available, else G_0
        pushed through the flows (lvaeg2_model.py:946-965)."""
        if t < len(self.g_list):
            return jnp.broadcast_to(
                jnp.asarray(self.g_list[t]), (z.shape[0], self.latent_dim, self.latent_dim)
            )
        if not self.g_list:
            raise RuntimeError("metric not set; call retrieve_metric_all first")
        g = jnp.broadcast_to(
            jnp.asarray(self.g_list[0]), (z.shape[0], self.latent_dim, self.latent_dim)
        )
        params = variables["params"]
        z_t = z
        for i in range(t):
            z_t, g = self.push_metric(params, z_t, g, i, direction="inverse")
        return g

    # -- Riemannian prior ----------------------------------------------------------

    def log_p_z(self, params, z: Array) -> Array:
        """Visit-0 prior: metric-volume density when enabled
        (lvaeg_model.py _log_p_z Riemannian branch), else the parent's."""
        if self.use_riemann_prior and self.g_list:
            g0 = jnp.asarray(self.g_list[0])
            sign, logdet = jnp.linalg.slogdet(g0)
            return jnp.broadcast_to(-0.5 * logdet, (z.shape[0],)) - 0.5 * jnp.sum(
                (z - jnp.asarray(self.gm_list[0])) ** 2, axis=1
            )
        return super().log_p_z(params, z)

    # -- HMC generation ---------------------------------------------------------------

    def generate_hmc(
        self, variables: Dict[str, Any], key: Array, n: int, vi_index: int = 0
    ) -> Array:
        """Generate via manifold HMC on the estimated metric — the
        framework's sampler replaces the reference's unvendored
        geometric_perspective_on_vaes.hmc_sampling."""
        from rlvae_tpu.geometry.metric import CentroidMetric
        from rlvae_tpu.samplers import HMCConfig, sample_prior_hmc

        if not self.g_list:
            raise RuntimeError("metric not set; call retrieve_metric_all first")
        metric = CentroidMetric.create(
            np.asarray(self.gm_list[vi_index]),
            np.linalg.inv(self.g_list[vi_index])[None],
            temperature=1.0,
            regularization=0.01,
        )
        z = sample_prior_hmc(metric, key, n, HMCConfig(mcmc_steps=20, n_lf=15))
        params = variables["params"]
        z_seq, _ = self.propagate(params, z, vi_index)
        recon = self.decoder.apply(
            {"params": params["decoder"]},
            z_seq.reshape(n * self.n_obs, self.latent_dim),
        ).reconstruction
        return recon.reshape(n, self.n_obs, *self.input_dim)
