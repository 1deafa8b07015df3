"""LVAE_GUGUS — the Riemannian-prior LVAE_IAF research line, all variants.

The reference vendors FIVE incremental variants of this model (reference:
src/lib/src/pythae/models/lvae_gugus/{lvae_gugus,lvaeg,lvaeg2,lvaegg,lvaegA,
lvaegA2}_model.py, ~5.8k LoC of near-duplicates, all named LVAE_GUGUS and
all importing the same missing external diffusion packages).  This module
implements the shared machinery once on top of our LVAE_IAF and exposes each
variant's distinguishing knobs as config, selected by ``variant=`` presets:

- ``base`` (lvae_gugus_model.py): volume-only Riemannian prior
  log p(z) = -0.5 log det G(z) at visit 0 (_log_p_z Riemannian branch).
- ``lvaeg`` (lvaeg_model.py:23-60, _log_p_z): persistent (GM, G0) at t=0 and
  the FULL Gaussian metric prior
  log p(z) = -0.5 (log det G_t + z^T G_t^{-1} z + D log 2pi).
- ``lvaeg2`` (lvaeg2_model.py:113-163 retrieveG_all): per-timestep diagonal
  metrics G_t estimated for EVERY observation, stored; the field falls back
  to pushforward beyond the stored list.
- ``lvaegg`` (lvaegg_model.py:803-918): LOCAL metrics — k-medoids clusters,
  kNN local covariance around each centroid, G0 = the local metric of the
  centroid nearest the global latent mean, global temperature = max of min
  inter-centroid distances; also builds the sampled Mahalanobis observation
  metric (vae_model.py build_metrics) for HMC.
- ``lvaega`` (lvaegA_model.py forward): during training, the VISIT-0 latent
  is drawn by manifold HMC on the estimated metric instead of
  reparameterization (``use_hmc_visit0``); per-sample invertible-Jacobian
  metric pushforward.
- ``lvaega2`` (lvaegA2_model.py:60-75): engineering knobs —
  ``weight_norm_flows`` (weight-normalized flow matrices, w = g * v/|v|,
  trainable g and v), ``metric_mode`` "push" (always push G0 through the
  flows) vs "stored", and ``metric_eval_period`` periodic
  ``compare_metrics`` diagnostics (pushforward vs empirical metric drift);
  upstream's ``mixed_precision`` maps to this framework's bf16 activation
  default.

Each preset's distinguishing behavior is pinned by a dedicated test
(tests/test_research_models.py test_gugus_variant_*).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.flows.iaf import iaf_forward, iaf_inverse
from rlvae_tpu.models.research.lvae_iaf import LVAE_IAF

Array = jax.Array

VARIANT_PRESETS: Dict[str, Dict[str, Any]] = {
    "base": dict(riemann_prior_form="volume", metric_mode="stored",
                 use_hmc_visit0=False, weight_norm_flows=False),
    "lvaeg": dict(riemann_prior_form="gaussian", metric_mode="stored",
                  use_hmc_visit0=False, weight_norm_flows=False),
    "lvaeg2": dict(riemann_prior_form="gaussian", metric_mode="stored",
                   use_hmc_visit0=False, weight_norm_flows=False),
    "lvaegg": dict(riemann_prior_form="gaussian", metric_mode="push",
                   use_hmc_visit0=False, weight_norm_flows=False),
    "lvaega": dict(riemann_prior_form="gaussian", metric_mode="push",
                   use_hmc_visit0=True, weight_norm_flows=False),
    "lvaega2": dict(riemann_prior_form="gaussian", metric_mode="push",
                    use_hmc_visit0=True, weight_norm_flows=True),
}


def _wn_convert_block(block: Dict[str, Array]) -> Dict[str, Array]:
    """Torch-weight_norm storage: each weight w [in, out] becomes direction
    v (= w) plus per-output gain g (= column norms), both trainable
    (lvaegA2_model.py weight_norm_flows)."""
    out = {}
    for k, v in block.items():
        if k.startswith("w"):
            out[f"{k}_v"] = v
            out[f"{k}_g"] = jnp.linalg.norm(v, axis=0)
        else:
            out[k] = v
    return out


def _wn_materialize_block(block: Dict[str, Array]) -> Dict[str, Array]:
    """w = g * v / |v|_col — exact at conversion time, reparameterized
    gradients thereafter."""
    out = {}
    for k, v in block.items():
        if k.endswith("_v"):
            name = k[:-2]
            g = block[f"{name}_g"]
            out[name] = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))[None, :]
        elif not k.endswith("_g"):
            out[k] = v
    return out


class LVAE_GUGUS(LVAE_IAF):
    # GUGUS's _compute_recon_loss applies PLAIN mse — no 0.5 factor, unlike
    # the LVAE_IAF parent (lvaeg2_model.py:399-417 vs lvae_iaf_model.py:428)
    recon_scale = 1.0

    def __init__(
        self,
        *args,
        variant: str = "base",
        use_riemann_prior: bool = False,
        riemann_prior_form: Optional[str] = None,  # volume | gaussian
        metric_mode: Optional[str] = None,  # stored | push
        use_hmc_visit0: Optional[bool] = None,
        weight_norm_flows: Optional[bool] = None,
        metric_eval_period: int = 0,
        hmc_visit0_steps: int = 10,
        **kwargs,
    ):
        # GUGUS's own config defaults differ from LVAE_IAF's:
        # beta=5.0 and posterior='iaf' (lvae_gugus_config.py:29,34)
        kwargs.setdefault("beta", 5.0)
        kwargs.setdefault("posterior", "iaf")
        super().__init__(*args, **kwargs)
        if variant not in VARIANT_PRESETS:
            raise ValueError(f"unknown variant {variant!r}; one of {list(VARIANT_PRESETS)}")
        preset = VARIANT_PRESETS[variant]
        self.variant = variant
        self.use_riemann_prior = use_riemann_prior
        self.riemann_prior_form = riemann_prior_form or preset["riemann_prior_form"]
        self.metric_mode = metric_mode or preset["metric_mode"]
        self.use_hmc_visit0 = (preset["use_hmc_visit0"]
                               if use_hmc_visit0 is None else use_hmc_visit0)
        self.weight_norm_flows = (preset["weight_norm_flows"]
                                  if weight_norm_flows is None else weight_norm_flows)
        self.metric_eval_period = int(metric_eval_period)
        self.hmc_visit0_steps = int(hmc_visit0_steps)
        self._fwd_counter = 0
        self.last_metric_diagnostics: Optional[Dict[str, float]] = None
        self.gm_list: List[np.ndarray] = []  # mean latent per t, [1, D]
        self.g_list: List[np.ndarray] = []  # metric per t, [D, D]
        self.sampled_metric = None  # lvaegg's Mahalanobis observation metric

    # -- params (weight-normed flow storage for lvaega2) -------------------------

    def init(self, key: Array) -> Dict[str, Any]:
        variables = super().init(key)
        if self.weight_norm_flows:
            variables["params"]["flows"] = [
                [_wn_convert_block(b) for b in flow]
                for flow in variables["params"]["flows"]
            ]
        return variables

    def _flow_params(self, params):
        if self.weight_norm_flows:
            return [[_wn_materialize_block(b) for b in flow]
                    for flow in params["flows"]]
        return params["flows"]

    def propagate(self, params, z_vi: Array, vi_index: int):
        if self.weight_norm_flows:
            params = {**params, "flows": self._flow_params(params)}
        return super().propagate(params, z_vi, vi_index)

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

    def retrieve_metric_local(
        self,
        variables: Dict[str, Any],
        data: Array,
        vi_index: int = 0,
        num_centroids: int = 20,
        knn_neighbors: int = 30,
        t_multiplier: float = 1.0,
        add_std_norm: bool = True,
    ):
        """lvaegg's local-metric estimation (lvaegg_model.py:803-918):
        k-medoids clusters on the visit encodings, kNN local covariance per
        centroid, G0 = local metric of the centroid nearest the global mean,
        global temperature = max of min inter-centroid distances; also
        builds the sampled Mahalanobis observation metric for HMC.
        Returns (mu_avg, G0, T)."""
        from rlvae_tpu.models.research.lldm import SampledMetric, _kmedoids

        params = variables["params"]
        enc = self.encoder.apply({"params": params["encoder"]}, data[:, vi_index])
        mu = np.asarray(enc.embedding)
        log_var = np.asarray(enc.log_covariance)
        mu_avg = mu.mean(axis=0, keepdims=True)

        k = min(num_centroids, len(mu))
        centroids, idx = _kmedoids(mu, k)
        if k > 1:
            d = np.sqrt(((centroids[:, None] - centroids[None]) ** 2).sum(-1))
            np.fill_diagonal(d, np.inf)
            temp = float(d.min(axis=1).max()) * t_multiplier
        else:
            temp = t_multiplier

        knn_neighbors = min(knn_neighbors, len(mu))
        local_metrics = []
        for c in centroids:
            order = np.argsort(((mu - c[None]) ** 2).sum(-1))[:knn_neighbors]
            pts = mu[order]
            if add_std_norm and len(pts) > 1:
                g_local = np.cov(pts.T) + 1e-4 * np.eye(mu.shape[1])
            else:
                g_local = np.eye(mu.shape[1])
            local_metrics.append(g_local.astype(np.float32))
        nearest = int(np.argmin(((centroids - mu_avg) ** 2).sum(-1)))
        g0 = local_metrics[nearest]

        self.gm_list, self.g_list = [mu_avg], [g0]
        self.sampled_metric = SampledMetric(
            mu[idx], np.exp(-log_var[idx]), temp, 0.01
        )
        return mu_avg, g0, temp

    # -- metric field -------------------------------------------------------------

    def push_metric(
        self, params, z: Array, g: Array, flow_idx: int, direction: str = "inverse"
    ) -> Tuple[Array, Array]:
        """Pushforward of the metric through one flow: for z' = f(z),
        G'(z') = J^{-T} G J^{-1} with J = df/dz (lvaeg2_model.py:770-800;
        the reference's per-sample autograd loop is one vmap(jacfwd))."""
        flow = self._flow_params(params)[flow_idx]
        fwd, bwd = (
            (iaf_inverse, iaf_forward) if direction == "inverse"
            else (iaf_forward, iaf_inverse)
        )

        def f(single):
            return fwd(flow, self.masks, single[None, :])[0][0]

        def f_inv(single):
            return bwd(flow, self.masks, single[None, :])[0][0]

        z_next = jax.vmap(f)(z)
        # J^{-1} = d f^{-1}/dz' at z' = f(z) — exact (the flow directions are
        # exact inverses), and avoids inverting batched [B,16,16] matrices
        # (layout-poison tiny linalg on TPU, CLAUDE.md)
        j_inv = jax.vmap(jax.jacfwd(f_inv))(z_next)  # [B, D, D]
        g_next = jnp.einsum(
            "bji,bjk,bkl->bil", j_inv,
            jnp.broadcast_to(g, j_inv.shape), j_inv,
            precision=jax.lax.Precision.HIGHEST,
        )
        return z_next, g_next

    def metric_tensor_field(self, variables: Dict[str, Any], z: Array, t: int) -> Array:
        """G_t(z): ``metric_mode="stored"`` uses the per-timestep estimate
        when available with pushforward fallback (lvaeg2_model.py:946-965);
        ``"push"`` always pushes G_0 through the flows (lvaegg/lvaegA
        metric_tensor_field)."""
        if not self.g_list:
            raise RuntimeError("metric not set; call retrieve_metric_all first")
        shape = (z.shape[0], self.latent_dim, self.latent_dim)
        if self.metric_mode == "stored" and t < len(self.g_list):
            return jnp.broadcast_to(jnp.asarray(self.g_list[t]), shape)
        g = jnp.broadcast_to(jnp.asarray(self.g_list[0]), shape)
        params = variables["params"]
        z_t = z
        for i in range(t):
            z_t, g = self.push_metric(params, z_t, g, i, direction="inverse")
        return g

    def compare_metrics(self, variables: Dict[str, Any], data: Array, t: int
                        ) -> Dict[str, float]:
        """lvaegA2's periodic metric diagnostics: relative Frobenius drift
        between the pushforward field at t and the empirical (diagonal
        posterior-covariance) metric estimated from ``data[:, t]``."""
        params = variables["params"]
        enc = self.encoder.apply({"params": params["encoder"]}, data[:, t])
        mu = enc.embedding
        std_avg = np.asarray(jnp.exp(0.5 * enc.log_covariance).mean(axis=0))
        g_emp = np.diag(std_avg**2).astype(np.float32)
        g_push = np.asarray(self.metric_tensor_field(variables, mu, t)).mean(axis=0)
        denom = float(np.linalg.norm(g_emp)) + 1e-12
        diag = {
            "frobenius_rel": float(np.linalg.norm(g_push - g_emp)) / denom,
            "logdet_push": float(np.linalg.slogdet(g_push)[1]),
            "logdet_empirical": float(np.linalg.slogdet(g_emp)[1]),
        }
        self.last_metric_diagnostics = diag
        return diag

    # -- Riemannian prior ----------------------------------------------------------

    def log_p_z(self, params, z: Array) -> Array:
        """Visit-0 prior.  ``volume``: -0.5 log det G_0 (+ Gaussian distance
        to GM_0; base _log_p_z Riemannian branch).  ``gaussian``: the full
        metric Gaussian -0.5 (log det G_0 + z^T G_0^{-1} z + D log 2pi)
        (lvaeg_model.py _log_p_z).  Falls back to the parent prior when no
        metric is set or the Riemannian prior is off."""
        if not (self.use_riemann_prior and self.g_list):
            return super().log_p_z(params, z)
        g0 = jnp.asarray(self.g_list[0])
        sign, logdet = jnp.linalg.slogdet(g0)
        if self.riemann_prior_form == "volume":
            return jnp.broadcast_to(-0.5 * logdet, (z.shape[0],)) - 0.5 * jnp.sum(
                (z - jnp.asarray(self.gm_list[0])) ** 2, axis=1
            )
        from rlvae_tpu.ops.linalg import inv_psd_small

        g_inv = inv_psd_small(g0[None])[0]  # G_0 is PSD; fp32 unrolled path
        quad = jnp.einsum(
            "bi,ij,bj->b", z, g_inv, z, precision=jax.lax.Precision.HIGHEST
        )
        d = z.shape[1]
        return -0.5 * (logdet + quad + d * jnp.log(2.0 * jnp.pi))

    # -- lvaegA: HMC visit-0 sampling ---------------------------------------------

    def _hmc_metric(self, vi_index: int = 0):
        from rlvae_tpu.geometry.metric import CentroidMetric

        return CentroidMetric.create(
            np.asarray(self.gm_list[vi_index]),
            np.linalg.inv(self.g_list[vi_index])[None],
            temperature=1.0,
            regularization=0.01,
        )

    def sample_visit_latent(
        self, params, key: Array, mu: Array, log_var: Array, vi_index: int
    ) -> Array:
        """lvaegA's training-time draw: at visit 0 with a metric available,
        z ~ manifold HMC on the estimated metric instead of
        reparameterization (lvaegA_model.py forward,
        ``hmc_sampling(self, mu, ...)``)."""
        if self.use_hmc_visit0 and vi_index == 0 and self.g_list:
            from rlvae_tpu.samplers import HMCConfig, sample_prior_hmc

            # chains START at the per-sample posterior means — the reference
            # geometric-perspective convention hmc_sampling(self, mu, ...)
            # (second arg = starting positions), so the draw stays
            # conditioned on the input batch
            return sample_prior_hmc(
                self._hmc_metric(0), key, mu.shape[0],
                HMCConfig(mcmc_steps=self.hmc_visit0_steps, n_lf=15),
                z0=mu,
            )
        return super().sample_visit_latent(params, key, mu, log_var, vi_index)

    # -- forward (periodic diagnostics hook) ---------------------------------------

    def forward(self, variables, x, key, vi_index=None, epoch: int = 100,
                train: bool = False, seq_mask=None, pix_mask=None):
        self._fwd_counter += 1
        # the period counts EAGER forwards only: under research_cli's jitted
        # train step the hook cannot fire per step (forward is traced once),
        # but the CLI's per-epoch eval forward IS eager, so the period is
        # effectively in epochs there; compare_metrics stays public for
        # explicit trainer-level scheduling
        if (
            self.metric_eval_period > 0
            and self.g_list
            and self._fwd_counter % self.metric_eval_period == 0
            and not isinstance(x, jax.core.Tracer)
        ):
            self.compare_metrics(variables, x, t=0)
        return super().forward(variables, x, key, vi_index=vi_index, epoch=epoch,
                               train=train, seq_mask=seq_mask, pix_mask=pix_mask)

    # -- HMC generation ---------------------------------------------------------------

    def generate_hmc(
        self, variables: Dict[str, Any], key: Array, n: int, vi_index: int = 0
    ) -> Array:
        """Generate via manifold HMC on the estimated metric — the
        framework's sampler replaces the reference's unvendored
        geometric_perspective_on_vaes.hmc_sampling."""
        from rlvae_tpu.samplers import HMCConfig, sample_prior_hmc

        if not self.g_list:
            raise RuntimeError("metric not set; call retrieve_metric_all first")
        z = sample_prior_hmc(
            self._hmc_metric(vi_index), key, n, HMCConfig(mcmc_steps=20, n_lf=15)
        )
        params = variables["params"]
        z_seq, _ = self.propagate(params, z, vi_index)
        recon = self.decoder.apply(
            {"params": params["decoder"]},
            z_seq.reshape(n * self.n_obs, self.latent_dim),
        ).reconstruction
        return recon.reshape(n, self.n_obs, *self.input_dim)
