"""LLDM — Longitudinal Latent Diffusion Model (LLDM_IAF).

TPU-native reimplementation of the reference LLDM research model
(reference: src/lib/src/pythae/models/lldm/lldm_model.py:23-1029).  The
reference class is UNIMPORTABLE in its own tree — it imports
``diffusion.stable_diffusion.latent_diffusion``, ``...sampler.ddim`` and
``geometric_perspective_on_vaes.sampling`` (lldm_model.py:19-21), none of
which is vendored, and pythae's __init__ comments the model out for exactly
that reason.  This module therefore ships self-contained TPU-native
equivalents of the three external pieces and rebuilds the model's full
surface on top of them:

- ``LatentDiffusion``: a frozen latent noise-prediction model (MLP eps-net
  with sinusoidal time embedding over a 1000-step linear DDPM schedule) with
  the ``sequential_diffusion`` forward-noising bridge q(z_t2 | z_t1) the
  reference calls on its ``MyLatentDiffusion`` (lldm_model.py:476, 919).
  ``pretrain_latent_diffusion`` provides the "pretrained & frozen"
  provenance the reference assumes (lldm_model.py:88-89).
- ``DDIMSampler``: uniform time-step subsequence + the standard DDIM update
  ``get_x_prev_and_pred_x0`` (lldm_model.py:493-497), eta-parameterized.
- ``SampledMetric`` + ``hmc_sampling``: the pulled-back observation metric
  the reference builds with ``VAE.retrieveG`` (vae_model.py:288-341) — a
  Mahalanobis-weighted DIRECT-G centroid sum
  G(z) = sum_i diag(M_i) exp(-(z-c_i)^T diag(M_i) (z-c_i)/T^2) + lbd*I
  (vae_model.py:266-279; NB: unlike the RHVAE metric this parameterizes G,
  not G^{-1}, and G is diagonal) with ``log_pi = 0.5 log clamp(det G)``
  (vae_model.py:342), and plain HMC on that log-volume target standing in
  for ``geometric_perspective_on_vaes.hmc_sampling`` (lldm_model.py:636).

Model scheme (lldm_model.py): a sequence of n_obs observations maps onto a
DDIM time line ``diff_t_steps = flip(sampler.time_steps)`` — index 0 is the
most-noised end (prior N(0,I)), index n_obs-1 the data manifold (Riemannian
volume prior via log_pi).  Training encodes ONE visit (the variable of
interest), optionally refines it with a posterior IAF, then builds the full
latent sequence by forward-diffusion noising into the past and DDIM
denoising into the future, decoding every frame; the KL is active only at
the boundary visits and clamped to [-2, 500] (lldm_model.py:266-329).

Everything here is static-shape and jit-friendly: the sequence loops are
Python loops over the (static, small) n_obs axis, per-step schedule scalars
are gathered from precomputed tables, and HMC is a ``lax.scan``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.flows.iaf import iaf_inverse, iaf_masks, init_iaf
from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Latent diffusion (stand-in for diffusion.stable_diffusion.MyLatentDiffusion)
# ---------------------------------------------------------------------------


def _sinusoidal_embedding(t: Array, dim: int = 32, max_period: float = 1e4) -> Array:
    """Transformer-style sinusoidal embedding of (possibly fractional)
    diffusion steps t [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class EpsNet(nn.Module):
    """Noise predictor eps_theta(z_t, t) on flat latents."""

    latent_dim: int
    hidden: int = 128
    temb_dim: int = 32

    @nn.compact
    def __call__(self, z: Array, t: Array) -> Array:
        temb = _sinusoidal_embedding(t, self.temb_dim)
        h = jnp.concatenate([z, temb], axis=-1)
        h = nn.tanh(nn.Dense(self.hidden)(h))
        h = nn.tanh(nn.Dense(self.hidden)(h))
        return nn.Dense(self.latent_dim)(h)


class LatentDiffusion:
    """Frozen latent DDPM: linear beta schedule over ``n_train_steps`` with
    an eps-net, plus the sequential noising bridge (lldm_model.py:476).

    ``c/h/w`` mirror the reference's ``pretrained_ldm.c/h/w`` spatial view
    of the latent (lldm_model.py:679); for latent dims with no 3 x s x s
    factorization they default to (1, 1, D) — the eps-net consumes flat
    latents either way, so the reshape is purely cosmetic.
    """

    def __init__(
        self,
        latent_dim: int,
        params: Optional[Mapping[str, Any]] = None,
        hidden: int = 128,
        n_train_steps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 2e-2,
        key: Optional[Array] = None,
    ):
        self.latent_dim = latent_dim
        self.n_train_steps = n_train_steps
        betas = np.linspace(beta_start, beta_end, n_train_steps, dtype=np.float64)
        self.alpha_bar = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)  # [T]
        self.net = EpsNet(latent_dim=latent_dim, hidden=hidden)
        if params is None:
            key = jax.random.PRNGKey(0) if key is None else key
            z0 = jnp.zeros((1, latent_dim), jnp.float32)
            params = dict(self.net.init(key, z0, jnp.zeros((1,))))["params"]
        self.params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        side = round((latent_dim / 3) ** 0.5)
        if 3 * side * side == latent_dim:
            self.c, self.h, self.w = 3, side, side
        else:
            self.c, self.h, self.w = 1, 1, latent_dim

    def __call__(self, z: Array, t: Array) -> Array:
        """eps_theta(z_t, t); t scalar or [B] (diffusion step index)."""
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (z.shape[0],))
        return self.net.apply({"params": self.params}, z, t)

    def sequential_diffusion(self, key: Array, x: Array, t1: Array, t2: Array) -> Array:
        """q(z_{t2} | z_{t1}) for t2 > t1 (more noise): the noising bridge
        z_{t2} = sqrt(abar_{t2}/abar_{t1}) z_{t1} + sqrt(1 - abar_{t2}/abar_{t1}) eps
        (lldm_model.py:476 ``pretrained_ldm.sequential_diffusion``)."""
        a1 = self.alpha_bar[jnp.asarray(t1, jnp.int32)]
        a2 = self.alpha_bar[jnp.asarray(t2, jnp.int32)]
        ratio = jnp.clip(a2 / a1, 0.0, 1.0)
        if ratio.ndim == 1:
            ratio = ratio[:, None]
        eps = jax.random.normal(key, x.shape, x.dtype)
        return jnp.sqrt(ratio) * x + jnp.sqrt(1.0 - ratio) * eps


def pretrain_latent_diffusion(
    key: Array,
    latents: Array,
    hidden: int = 128,
    n_steps: int = 500,
    batch_size: int = 128,
    lr: float = 1e-3,
    n_train_steps: int = 1000,
) -> LatentDiffusion:
    """Train the eps-net by denoising score matching on a bank of latents and
    return it frozen — the provenance chain for the reference's
    ``pretrained_ldm`` argument (lldm_model.py:33, 88-89)."""
    import optax

    ldm = LatentDiffusion(latents.shape[-1], hidden=hidden,
                          n_train_steps=n_train_steps, key=key)
    params = ldm.params
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    latents = jnp.asarray(latents, jnp.float32)

    def loss_fn(p, z0, t, eps):
        a = ldm.alpha_bar[t][:, None]
        z_t = jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * eps
        pred = ldm.net.apply({"params": p}, z_t, t.astype(jnp.float32))
        return jnp.mean((pred - eps) ** 2)

    @jax.jit
    def step(p, s, k):
        k_i, k_t, k_e = jax.random.split(k, 3)
        idx = jax.random.randint(k_i, (batch_size,), 0, latents.shape[0])
        z0 = latents[idx]
        t = jax.random.randint(k_t, (batch_size,), 0, n_train_steps)
        eps = jax.random.normal(k_e, z0.shape)
        loss, grads = jax.value_and_grad(loss_fn)(p, z0, t, eps)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, _ = step(params, opt_state, k)
    ldm.params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    return ldm


class DDIMSampler:
    """DDIM sampler over a uniform ``n_steps`` subsequence of the diffusion
    timeline (the reference's ``DDIMSampler(model, n_steps, ddim_eta)``,
    lldm_model.py:550; update rule :493-497).

    ``time_steps`` is ASCENDING (index 0 = least noise); the model's
    sequence timeline is ``flip(time_steps)`` (lldm_model.py:63).
    """

    def __init__(self, ldm: LatentDiffusion, n_steps: int, ddim_eta: float = 0.0):
        self.ldm = ldm
        self.n_steps = n_steps
        self.ddim_eta = float(ddim_eta)
        big_t = ldm.n_train_steps
        self.time_steps = np.arange(0, big_t, big_t // n_steps)[:n_steps]
        abar = np.asarray(ldm.alpha_bar)
        a = abar[self.time_steps]
        a_prev = np.concatenate([abar[:1], a[:-1]])
        sigma = self.ddim_eta * np.sqrt(
            (1.0 - a_prev) / (1.0 - a) * (1.0 - a / a_prev)
        )
        self.ddim_alpha = jnp.asarray(a, jnp.float32)
        self.ddim_alpha_prev = jnp.asarray(a_prev, jnp.float32)
        self.ddim_sigma = jnp.asarray(sigma, jnp.float32)

    def get_x_prev_and_pred_x0(
        self,
        key: Array,
        e_t: Array,
        index: int,
        x: Array,
        temperature: float = 1.0,
        repeat_noise: bool = False,
    ) -> Tuple[Array, Array]:
        """One DDIM denoising step at timeline position ``index``
        (lldm_model.py:493-497)."""
        a = self.ddim_alpha[index]
        a_prev = self.ddim_alpha_prev[index]
        sigma = self.ddim_sigma[index]
        pred_x0 = (x - jnp.sqrt(1.0 - a) * e_t) / jnp.sqrt(a)
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * e_t
        if repeat_noise:
            noise = jax.random.normal(key, (1, *x.shape[1:]), x.dtype)
        else:
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * temperature * noise
        return x_prev, pred_x0


# ---------------------------------------------------------------------------
# Sampled observation metric (stand-in for VAE.retrieveG / log_pi)
# ---------------------------------------------------------------------------


class SampledMetric:
    """Direct-G Mahalanobis centroid metric from ``VAE.build_metrics``
    (vae_model.py:266-279): every component is diagonal, so G(z) is diagonal
    and det G is a product — the whole bundle is two MXU matmuls plus
    elementwise ops."""

    def __init__(self, centroids: Array, m_flat: Array, temperature: float,
                 regularization: float = 0.01):
        self.centroids = jnp.asarray(centroids, jnp.float32)  # [K, D]
        self.m_flat = jnp.asarray(m_flat, jnp.float32)  # [K, D]
        self.temperature = float(temperature)
        self.lbd = float(regularization)
        # constant term of the Mahalanobis expansion sum_d m_kd c_kd^2
        self._c2 = jnp.sum(self.m_flat * self.centroids**2, axis=-1)  # [K]

    def g_diag(self, z: Array) -> Array:
        """diag of G(z) [B, D]: sum_k m_k * exp(-(z-c_k)^T diag(m_k) (z-c_k)/T^2)
        + lbd (vae_model.py:268-277)."""
        z2 = jnp.einsum("bd,kd->bk", z**2, self.m_flat, precision=_HI)
        zc = jnp.einsum("bd,kd->bk", z, self.m_flat * self.centroids, precision=_HI)
        d2 = z2 - 2.0 * zc + self._c2[None, :]
        omega = jnp.exp(-d2 / self.temperature**2)  # [B, K]
        return jnp.einsum("bk,kd->bd", omega, self.m_flat, precision=_HI) + self.lbd

    def g(self, z: Array) -> Array:
        return jax.vmap(jnp.diag)(self.g_diag(z))

    def log_pi(self, z: Array) -> Array:
        """0.5 * log clamp(det G(z), 0, 1e32) (vae_model.py:342-343)."""
        logdet = jnp.sum(jnp.log(self.g_diag(z)), axis=-1)
        return 0.5 * jnp.minimum(logdet, math.log(1e32))


def _kmedoids(x: np.ndarray, k: int, iters: int = 10, seed: int = 0):
    """k-means refined to medoids (nearest actual sample to each center) —
    the deterministic stand-in for sklearn_extra.KMedoids in retrieveG
    (vae_model.py:313-315).  Returns (medoids [k, D], indices [k])."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k = min(k, n)
    centers = x[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)  # [N, k]
        assign = d.argmin(1)
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    idx = d.argmin(0)
    return x[idx], idx


def retrieve_g(
    mu: np.ndarray,
    log_var: np.ndarray,
    num_centroids: int = 200,
    t_multiplier: float = 1.0,
    add_std_norm: bool = False,
    regularization: float = 0.01,
    seed: int = 0,
) -> SampledMetric:
    """Build the sampled observation metric from posterior statistics — the
    tail of ``VAE.retrieveG`` (vae_model.py:288-341): k-medoids centroids,
    temperature = max over medoids of the min inter-medoid distance
    (times t_multiplier), M_i = exp(-log_var_i)."""
    mu = np.asarray(mu, np.float32)
    log_var = np.asarray(log_var, np.float32)
    medoids, idx = _kmedoids(mu, num_centroids, seed=seed)
    if len(medoids) > 1:
        d = np.sqrt(((medoids[:, None, :] - medoids[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        temp = float(d.min(axis=1).max())
    else:
        temp = 1.0
    temp *= t_multiplier
    centroids = mu[idx]
    m_flat = np.exp(-log_var[idx])
    if add_std_norm:  # vae_model.py:256-262
        centroids = np.concatenate([centroids, np.zeros((1, mu.shape[1]), np.float32)])
        m_flat = np.concatenate([m_flat, np.ones((1, mu.shape[1]), np.float32)])
    return SampledMetric(centroids, m_flat, temp, regularization)


def hmc_sampling(
    metric: SampledMetric,
    mu: Array,
    key: Array,
    n_samples: int,
    mcmc_steps_nbr: int = 100,
    n_lf: int = 10,
    eps_lf: float = 0.01,
) -> Tuple[Array, Array]:
    """Plain HMC on the manifold log-volume target log_pi(z) = 0.5 log det
    G(z), chains initialized at random encodings — the stand-in for
    ``geometric_perspective_on_vaes.sampling.hmc_sampling``
    (lldm_model.py:636).  Returns (z [n, D], log_pi [n])."""
    d = mu.shape[-1]
    k_init, k_scan = jax.random.split(key)
    idx = jax.random.randint(k_init, (n_samples,), 0, mu.shape[0])
    z0 = jnp.asarray(mu)[idx]

    log_pi = metric.log_pi
    grad_log_pi = jax.grad(lambda z: jnp.sum(log_pi(z)))

    def step(z, k):
        k_m, k_a = jax.random.split(k)
        rho = jax.random.normal(k_m, z.shape)
        h0 = -log_pi(z) + 0.5 * jnp.sum(rho**2, axis=-1)
        zl, rl = z, rho + 0.5 * eps_lf * grad_log_pi(z)

        def lf(carry, _):
            zl, rl = carry
            zl = zl + eps_lf * rl
            rl = rl + eps_lf * grad_log_pi(zl)
            return (zl, rl), None

        (zl, rl), _ = jax.lax.scan(lf, (zl, rl), None, length=n_lf - 1)
        zl = zl + eps_lf * rl
        rl = rl + 0.5 * eps_lf * grad_log_pi(zl)
        h1 = -log_pi(zl) + 0.5 * jnp.sum(rl**2, axis=-1)
        accept = jax.random.uniform(k_a, (z.shape[0],)) < jnp.exp(h0 - h1)
        return jnp.where(accept[:, None], zl, z), None

    z, _ = jax.lax.scan(step, z0, jax.random.split(k_scan, mcmc_steps_nbr))
    return z, log_pi(z)


# ---------------------------------------------------------------------------
# The model
# ---------------------------------------------------------------------------


class LLDM:
    """LLDM_IAF (lldm_model.py:23-1029): per-visit training of a sequence
    VAE whose latent timeline is a frozen latent-diffusion bridge, with a
    Riemannian volume prior at the data end of the timeline."""

    model_name = "LLDM_IAF"

    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 12,
        n_obs: int = 8,
        warmup: int = 50,  # lvae_iaf_config.py:28 default
        beta: float = 1.0,
        linear_scheduling_steps: int = 0,
        prior: str = "standard",  # standard | vamp (lldm_model.py:331-366)
        posterior: str = "gaussian",  # gaussian | iaf (:70-80)
        hidden_size: int = 128,
        context_dim: Optional[int] = None,
        vamp_number_components: int = 50,
        pretrained_metric: Optional[SampledMetric] = None,
        pretrained_ldm: Optional[LatentDiffusion] = None,
        ddim_sampler: Optional[DDIMSampler] = None,
        temperature: float = 1.0,
        reconstruction_loss: str = "mse",
        encoder_config: Optional[Mapping[str, Any]] = None,
        decoder_config: Optional[Mapping[str, Any]] = None,
    ):
        if prior not in ("standard", "vamp"):
            raise ValueError("prior must be 'standard' or 'vamp'")
        if posterior not in ("gaussian", "iaf"):
            raise ValueError("posterior must be 'gaussian' or 'iaf'")
        if reconstruction_loss not in ("mse", "bce"):
            raise ValueError("reconstruction_loss must be 'mse' or 'bce'")
        self.input_dim = tuple(input_dim)
        self.latent_dim = latent_dim
        self.n_obs = n_obs
        self.warmup = warmup
        self.beta = float(beta)
        self.linear_scheduling = linear_scheduling_steps
        self.prior = prior
        self.posterior = posterior
        self.hidden_size = hidden_size
        self.context_dim = context_dim
        self.vamp_number_components = vamp_number_components
        self.temperature = float(temperature)
        self.reconstruction_loss = reconstruction_loss

        # frozen external components (lldm_model.py:59-89)
        self.pretrained_metric = pretrained_metric
        self.ldm = pretrained_ldm or LatentDiffusion(latent_dim)
        self.ddim_sampler = ddim_sampler or DDIMSampler(self.ldm, n_steps=n_obs,
                                                        ddim_eta=1.0)
        if len(self.ddim_sampler.time_steps) != n_obs:
            raise ValueError(
                f"ddim_sampler must define exactly n_obs={n_obs} time steps "
                f"(got {len(self.ddim_sampler.time_steps)}): the sequence "
                "axis IS the diffusion timeline (lldm_model.py:63); for a "
                "denser timeline use oversample()"
            )
        # descending: index 0 = most noised (lldm_model.py:63)
        self.diff_t_steps = np.flip(np.asarray(self.ddim_sampler.time_steps)).copy()

        self.encoder = create_encoder(self.input_dim, latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)
        if posterior == "iaf":
            # reference posterior IAF: n_blocks=3, n_hidden_in_made=2 (:71-78)
            self.flow_blocks, self.flow_hidden_layers = 3, 2
            self.flow_masks = iaf_masks(latent_dim, hidden_size, 2)

        # per-visit running loss tallies (lldm_model.py:99-103)
        self.res_dict = {
            i: {"rec_loss": 0.0, "reg_loss": 0.0, "count": 0} for i in range(n_obs)
        }

    # -- params -----------------------------------------------------------------

    def init(self, key: Array) -> Dict[str, Any]:
        k_e, k_d, k_f, k_p = jax.random.split(key, 4)
        x0 = jnp.zeros((2, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((2, self.latent_dim), jnp.float32)
        params = {
            "encoder": dict(self.encoder.init(k_e, x0))["params"],
            "decoder": dict(self.decoder.init(k_d, z0))["params"],
        }
        if self.posterior == "iaf":
            params["posterior_flow"] = init_iaf(
                k_f, self.latent_dim, self.hidden_size,
                self.flow_blocks, self.flow_hidden_layers,
                context_dim=self.context_dim,
            )
        if self.prior == "vamp":
            # learned pseudo-inputs, mean-field over the input pixels
            params["pseudo_inputs"] = 0.1 * jax.random.normal(
                k_p, (self.vamp_number_components, *self.input_dim), jnp.float32
            )
        return {"params": params}

    # -- small pieces ------------------------------------------------------------

    def _sample_gauss(self, key: Array, mu: Array, std: Array) -> Tuple[Array, Array]:
        eps = jax.random.normal(key, std.shape)
        return mu + eps * std, eps

    def _apply_posterior_flow(self, params, z: Array,
                              h: Optional[Array] = None) -> Tuple[Array, Array]:
        """Sampling-direction pass of the posterior IAF (`inverse` in the
        reference, lldm_model.py:455-462)."""
        return iaf_inverse(params["posterior_flow"], self.flow_masks, z, h)

    def _log_p_z(self, params, z: Array) -> Array:
        """Standard-normal or VAMP mixture prior (lldm_model.py:331-367)."""
        if self.prior == "standard":
            return jnp.sum(-0.5 * z**2, axis=1)
        c = self.vamp_number_components
        x = jnp.clip(params["pseudo_inputs"], 0.0, 1.0)
        enc = self.encoder.apply({"params": params["encoder"]}, x)
        p_mu, p_lv = enc.embedding, enc.log_covariance
        log_p = jnp.sum(
            -0.5 * (p_lv[None] + (z[:, None, :] - p_mu[None]) ** 2 / jnp.exp(p_lv[None])),
            axis=2,
        ) - math.log(c)
        return jax.scipy.special.logsumexp(log_p, axis=1)

    def log_p_j_hat(self, params, j: int, z: Array) -> Array:
        """Prior on z_j: N(0,I) at the fully-noised end, metric volume
        log_pi elsewhere (lldm_model.py:369-409)."""
        assert 0 <= j < self.n_obs
        if j == 0:
            return jnp.sum(-0.5 * z**2, axis=1)
        if self.pretrained_metric is None:
            # no metric attached: fall back to the tractable prior (the
            # reference requires retrieveG to have been called beforehand,
            # lldm_model.py:32)
            return jnp.sum(-0.5 * z**2, axis=1)
        return self.pretrained_metric.log_pi(z)

    # -- sequence propagation (the shared core the reference repeats at
    # lldm_model.py:469-501, 560-597, 655-688, 911-941) ------------------------

    def _propagate(
        self,
        key: Array,
        z_vi: Array,
        vi_index: int,
        sampler: Optional[DDIMSampler] = None,
        t_line: Optional[np.ndarray] = None,
        future_only: bool = False,
    ) -> Array:
        """Build the latent sequence from the visit latent: forward-diffusion
        noising into the past, DDIM denoising into the future.  Returns
        [B, T, D] (T = len(t_line)).  All loop bounds are static."""
        sampler = sampler or self.ddim_sampler
        t_line = self.diff_t_steps if t_line is None else t_line
        n = len(t_line)
        b = z_vi.shape[0]
        zs: Dict[int, Array] = {vi_index: z_vi}

        # past: sequential noising (lldm_model.py:469-482)
        z_rev = z_vi
        if not future_only:
            for i in range(vi_index - 1, -1, -1):
                key, k = jax.random.split(key)
                t1 = np.full((b,), t_line[i + 1], np.int32)
                t2 = np.full((b,), t_line[i], np.int32)
                z_rev = self.ldm.sequential_diffusion(k, z_rev, t1, t2)
                zs[i] = z_rev

        # future: DDIM denoising (lldm_model.py:484-500)
        z_for = z_vi
        for i in range(vi_index, n - 1):
            key, k = jax.random.split(key)
            e_t = self.ldm(z_for, jnp.float32(t_line[i]))
            z_for, _ = sampler.get_x_prev_and_pred_x0(
                k, e_t, index=n - 1 - i, x=z_for, temperature=self.temperature
            )
            zs[i + 1] = z_for

        lo = vi_index if future_only else 0
        return jnp.stack([zs[i] for i in range(lo, n)], axis=1)

    # -- reference forward (lldm_model.py:107-143) --------------------------------

    def forward_simple(self, variables: Dict[str, Any], x: Array,
                       key: Array) -> ModelOutput:
        """Per-observation VAE forward: encode all frames, reparameterize,
        decode (the reference's ``forward``)."""
        params = variables["params"]
        # squeeze a redundant leading dim ([1, B, T, C, H, W] -> [B, T, C, H, W])
        if x.ndim == 6 and x.shape[0] == 1:
            x = x[0]
        b, t = x.shape[0], x.shape[1]
        enc = self.encoder.apply({"params": params["encoder"]},
                                 x.reshape(b * t, *x.shape[2:]))
        mu = enc.embedding.reshape(b, t, -1)
        log_var = enc.log_covariance.reshape(b, t, -1)
        std = jnp.exp(0.5 * log_var)
        z, _ = self._sample_gauss(key, mu, std)
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z.reshape(b * t, -1)
        ).reconstruction.reshape(b, t, *x.shape[2:])
        return ModelOutput(reconstruction=recon, z=z, mu=mu, log_var=log_var)

    # -- losses -------------------------------------------------------------------

    def _recon_term(self, recon_flat: Array, x_flat: Array, pix_flat: Array,
                    half: bool = True) -> Array:
        """Masked per-sample reconstruction.  ``half`` applies the 0.5 MSE
        factor of the warmup losses (lldm_model.py:164-166); the
        sequence-level loss_function uses PLAIN mse (lldm_model.py:271-279),
        so it passes half=False.  BCE carries no factor in either."""
        if self.reconstruction_loss == "mse":
            scale = 0.5 if half else 1.0
            return jnp.sum(scale * (recon_flat - x_flat) ** 2 * pix_flat, axis=-1)
        # fp32 before the clip: bf16 rounds 1-1e-7 to exactly 1.0 -> log(0)
        r = jnp.clip(recon_flat.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
        bce = -(x_flat * jnp.log(r) + (1.0 - x_flat) * jnp.log(1.0 - r))
        return jnp.sum(bce * pix_flat, axis=-1)

    def vae_loss_function(self, params, recon_x, x, mu, log_var, z0, epoch,
                          zk=None, log_abs_det_jac_posterior=None,
                          seq_mask=None, pix_mask=None, train=True):
        """Warmup-objective dispatch (lldm_model.py:145-158)."""
        if self.prior == "standard" and self.posterior == "gaussian":
            return self._vae_loss_function(recon_x, x, mu, log_var, z0,
                                           seq_mask, pix_mask)
        if self.prior == "vamp" and self.posterior == "gaussian":
            return self._vamp_loss_function(params, recon_x, x, mu, log_var,
                                            z0, epoch, seq_mask, pix_mask, train)
        return self._vae_iaf_loss_function(params, recon_x, x, mu, log_var, z0,
                                           zk, log_abs_det_jac_posterior,
                                           epoch, seq_mask, pix_mask)

    def _flat_masks(self, x, seq_mask, pix_mask):
        n = x.shape[0]
        seq_mask = jnp.ones((n,), x.dtype) if seq_mask is None else seq_mask.reshape(n)
        pix_mask = (jnp.ones((n, int(np.prod(self.input_dim))), x.dtype)
                    if pix_mask is None else pix_mask.reshape(n, -1))
        return seq_mask, pix_mask

    def _vae_loss_function(self, recon_x, x, mu, log_var, z,
                           seq_mask=None, pix_mask=None):
        """(lldm_model.py:160-184)"""
        n = x.shape[0]
        seq_mask, pix_mask = self._flat_masks(x, seq_mask, pix_mask)
        recon = self._recon_term(recon_x.reshape(n, -1), x.reshape(n, -1), pix_mask)
        kld = -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)
        return (jnp.mean((recon + kld) * seq_mask), jnp.mean(recon), jnp.mean(kld))

    def _vae_iaf_loss_function(self, params, recon_x, x, mu, log_var, z0, zk,
                               log_abs_det_jac, epoch, seq_mask=None,
                               pix_mask=None):
        """(lldm_model.py:186-217)"""
        n = x.shape[0]
        seq_mask, pix_mask = self._flat_masks(x, seq_mask, pix_mask)
        recon = self._recon_term(recon_x.reshape(n, -1), x.reshape(n, -1), pix_mask)
        log_prob_z0 = jnp.sum(
            -0.5 * (log_var + (z0 - mu) ** 2 / jnp.exp(log_var)), axis=1
        )
        log_prob_zk = self._log_p_z(params, zk)
        kld = log_prob_z0 - log_prob_zk - log_abs_det_jac
        return (jnp.mean((recon + kld) * seq_mask), jnp.mean(recon), jnp.mean(kld))

    def _vamp_loss_function(self, params, recon_x, x, mu, log_var, z, epoch,
                            seq_mask=None, pix_mask=None, train=True):
        """(lldm_model.py:220-263)"""
        n = x.shape[0]
        seq_mask, pix_mask = self._flat_masks(x, seq_mask, pix_mask)
        recon = self._recon_term(recon_x.reshape(n, -1), x.reshape(n, -1), pix_mask)
        log_p_z = self._log_p_z(params, z)
        log_q_z = jnp.sum(-0.5 * (log_var + (z - mu) ** 2 / jnp.exp(log_var)), axis=1)
        kld = -(log_p_z - log_q_z)
        if self.linear_scheduling > 0 and train:
            beta = min(1.0 * epoch / self.linear_scheduling, 1.0)
        else:
            beta = 1.0
        return (jnp.mean((recon + beta * kld) * seq_mask),
                jnp.mean(recon), jnp.mean(kld))

    def _beta(self, epoch: int, train: bool) -> float:
        """Linear beta warmup (lldm_model.py:321-327)."""
        if self.linear_scheduling > 0 and train:
            return min(self.beta * epoch / self.linear_scheduling, self.beta)
        return self.beta

    def loss_function(self, params, recon_x, x, mu, log_var, z_0_vi_index,
                      z_seq, vi_index, z_vi_index, log_abs_det_jac_posterior,
                      epoch, seq_mask=None, pix_mask=None, train=True):
        """The sequence-level per-visit loss (lldm_model.py:266-329): masked
        per-frame reconstruction averaged over the sequence, KL only at the
        boundary visits against log_p_j_hat, clamped to [-2, 500]."""
        b, t = x.shape[0], self.n_obs
        seq_mask = jnp.ones((b, t), x.dtype) if seq_mask is None else seq_mask
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        recon = self._recon_term(
            recon_x.reshape(b * t, -1), x.reshape(b * t, -1),
            pix_mask.reshape(b * t, -1), half=False,
        ).reshape(b, t)
        recon_loss = jnp.mean(recon * seq_mask, axis=-1)

        log_prob_z_vi = jnp.sum(
            -0.5 * (log_var + (z_0_vi_index - mu) ** 2 / (jnp.exp(log_var) + 1e-7)),
            axis=1,
        ) - log_abs_det_jac_posterior

        if vi_index == 0 or vi_index == self.n_obs - 1:
            kld = log_prob_z_vi - self.log_p_j_hat(params, vi_index, z_vi_index)
            kld = jnp.clip(kld, -2.0, 500.0)
        else:
            kld = jnp.zeros_like(log_prob_z_vi)

        beta = self._beta(epoch, train)
        return (jnp.mean(recon_loss + beta * kld), jnp.mean(recon_loss),
                jnp.mean(kld))

    # -- training forward ----------------------------------------------------------

    def forward(
        self,
        variables: Dict[str, Any],
        x: Array,
        key: Array,
        vi_index: Optional[int] = None,
        epoch: int = 100,
        train: bool = False,
        seq_mask: Optional[Array] = None,
        pix_mask: Optional[Array] = None,
    ) -> ModelOutput:
        """Training objective: encode the visit of interest, refine with the
        posterior IAF, propagate through the diffusion bridge, decode every
        frame, and apply ``loss_function`` — the scheme the reference's
        training scripts drive through reconstruct+loss_function.  During
        warmup epochs the plain per-frame VAE objective applies
        (``vae_loss_function``).  ``vi_index`` is static; draw it host-side
        per step (the reference samples it uniformly)."""
        params = variables["params"]
        b, t = x.shape[0], x.shape[1]
        seq_mask = jnp.ones((b, t), x.dtype) if seq_mask is None else seq_mask
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        x = x * pix_mask * seq_mask[:, :, None, None, None]

        if epoch < self.warmup:
            return self._forward_warmup(params, x, key, epoch, train,
                                        seq_mask, pix_mask)

        vi_index = int(np.random.randint(0, self.n_obs)) if vi_index is None else vi_index
        k_s, k_f, k_p = jax.random.split(key, 3)
        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        mu, log_var = enc.embedding, enc.log_covariance
        z, _ = self._sample_gauss(k_s, mu, jnp.exp(0.5 * log_var))
        z_0_vi = z
        log_det = jnp.zeros(b, jnp.float32)
        if self.posterior == "iaf":
            h = getattr(enc, "context", None) if self.context_dim else None
            z, log_det = self._apply_posterior_flow(params, z, h)
        z_vi = z

        z_seq = self._propagate(k_p, z_vi, vi_index)  # [B, T, D]
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z_seq.reshape(b * t, self.latent_dim)
        ).reconstruction.reshape(x.shape)

        loss, recon_loss, kld = self.loss_function(
            params, recon, x, mu, log_var, z_0_vi, z_seq, vi_index, z_vi,
            log_det, epoch, seq_mask, pix_mask, train,
        )
        if not isinstance(loss, jax.core.Tracer):
            # per-visit running tallies (lldm_model.py:99-103); eager calls
            # only — inside jit the values are tracers
            tally = self.res_dict[vi_index]
            # one batched fetch (per-scalar float() is ~ms each on the tunnel)
            vals = jax.device_get({"rec": recon_loss, "reg": kld})
            tally["rec_loss"] += float(vals["rec"])
            tally["reg_loss"] += float(vals["reg"])
            tally["count"] += 1
        return ModelOutput(
            loss=loss, reconstruction_loss=recon_loss, reg_loss=kld,
            recon_x=recon, z=z_vi, z_seq=z_seq, vi_index=vi_index,
        )

    __call__ = forward

    def _forward_warmup(self, params, x, key, epoch, train, seq_mask, pix_mask):
        """Warmup epochs: plain per-frame VAE objective through
        ``vae_loss_function`` (lldm_model.py:145-158)."""
        b, t = x.shape[0], x.shape[1]
        x_flat = x.reshape(b * t, *self.input_dim)
        k_s, k_f = jax.random.split(key)
        enc = self.encoder.apply({"params": params["encoder"]}, x_flat)
        mu, log_var = enc.embedding, enc.log_covariance
        z, _ = self._sample_gauss(k_s, mu, jnp.exp(0.5 * log_var))
        z0 = z
        log_det = jnp.zeros(b * t, jnp.float32)
        if self.posterior == "iaf":
            h = getattr(enc, "context", None) if self.context_dim else None
            z, log_det = self._apply_posterior_flow(params, z, h)
        recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction
        loss, recon_loss, kld = self.vae_loss_function(
            params, recon, x_flat, mu, log_var, z0, epoch, zk=z,
            log_abs_det_jac_posterior=log_det,
            seq_mask=seq_mask.reshape(b * t),
            pix_mask=pix_mask.reshape(b * t, -1), train=train,
        )
        return ModelOutput(
            loss=loss, reconstruction_loss=recon_loss, reg_loss=kld,
            recon_x=recon.reshape(x.shape), z=z,
            z_seq=z.reshape(b, t, self.latent_dim), vi_index=-1,
        )

    # -- reconstruct / oversample (lldm_model.py:411-505, 507-597) -----------------

    def _encode_vi(self, params, key, x, vi_index):
        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        mu, log_var = enc.embedding, enc.log_covariance
        z, _ = self._sample_gauss(key, mu, jnp.exp(0.5 * log_var))
        log_det = jnp.zeros(x.shape[0], jnp.float32)
        if self.posterior == "iaf":
            h = getattr(enc, "context", None) if self.context_dim else None
            z, log_det = self._apply_posterior_flow(params, z, h)
        return z, mu, log_var, log_det

    def reconstruct(
        self,
        variables: Dict[str, Any],
        x: Array,
        vi_index: int,
        key: Array,
        z_vi_index: Optional[Array] = None,
        seq_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Encode the visit of interest, bridge to the full sequence, decode
        (lldm_model.py:411-505).  Returns (z_seq [B*T, D], recon [B*T, ...])."""
        params = variables["params"]
        x = x[None] if x.ndim == 4 else x
        if seq_mask is not None:
            x = x * seq_mask[:, :, None, None, None]
        k_e, k_p = jax.random.split(key)
        z, _, _, _ = self._encode_vi(params, k_e, x, vi_index)
        z = z if z_vi_index is None else z_vi_index
        z_seq = self._propagate(k_p, z, vi_index)
        flat = z_seq.reshape(-1, self.latent_dim)
        recon = self.decoder.apply({"params": params["decoder"]}, flat).reconstruction
        return flat, recon

    def oversample(
        self,
        variables: Dict[str, Any],
        x: Array,
        vi_index: int,
        key: Array,
        sampler: Optional[DDIMSampler] = None,
        num_supp_steps: Optional[int] = None,
        z_vi_index: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Re-time the bridge onto a denser DDIM timeline and generate the
        oversampled sequence (lldm_model.py:507-597).  Returns
        (z_seq [B*T', D], recon [B*T', ...]) with T' = n_obs-1+num_supp_steps."""
        params = variables["params"]
        x = x[None] if x.ndim == 4 else x
        if sampler is None:
            assert num_supp_steps is not None
            sampler = DDIMSampler(self.ldm, n_steps=self.n_obs - 1 + num_supp_steps,
                                  ddim_eta=1.0)
        t_line = np.flip(np.sort(np.asarray(sampler.time_steps))).copy()
        matching_index = int(np.argmin(np.abs(t_line - self.diff_t_steps[vi_index])))

        k_e, k_p = jax.random.split(key)
        z, _, _, _ = self._encode_vi(params, k_e, x, vi_index)
        z = z if z_vi_index is None else z_vi_index
        z_seq = self._propagate(k_p, z, matching_index, sampler=sampler,
                                t_line=t_line)
        flat = z_seq.reshape(-1, self.latent_dim)
        recon = self.decoder.apply({"params": params["decoder"]}, flat).reconstruction
        return flat, recon

    # -- retrieveG on own encoder (lldm_model.py:610-616) ---------------------------

    def retrieve_g(
        self,
        variables: Dict[str, Any],
        obs_data: Array,
        num_centroids: int = 200,
        t_multiplier: float = 1.0,
        add_std_norm: bool = False,
    ) -> Tuple[SampledMetric, Array, Array]:
        """Encode ``obs_data`` [N, C, H, W] and build the sampled observation
        metric — the ``final_vae.retrieveG`` step of ``generate``
        (lldm_model.py:613-616, vae_model.py:288-341)."""
        params = variables["params"]
        enc = self.encoder.apply({"params": params["encoder"]}, obs_data)
        mu, log_var = np.asarray(enc.embedding), np.asarray(enc.log_covariance)
        metric = retrieve_g(mu, log_var, num_centroids, t_multiplier, add_std_norm)
        return metric, jnp.asarray(mu), jnp.asarray(log_var)

    # -- generate (lldm_model.py:610-763) -------------------------------------------

    def generate(
        self,
        variables: Dict[str, Any],
        train_data: Array,
        key: Array,
        num_gen_seq: int = 1,
        vi_index: int = 0,
        t_multiplier: float = 0.5,
        batch_size: int = 128,
        freeze: bool = False,
        num_centroids: int = 200,
        mcmc_steps_nbr: int = 100,
    ) -> Tuple[Array, Array]:
        """Sample sequence anchors by HMC on the observation manifold of the
        ``vi_index``-th visit, bridge each to the full timeline, decode
        (lldm_model.py:610-763).  Returns (recon [N, T, ...], z_seq [N, T, D])."""
        params = variables["params"]
        metric, mu, _ = self.retrieve_g(
            variables, train_data[:, vi_index], num_centroids, t_multiplier
        )
        batch_size = min(num_gen_seq, batch_size)

        k_h, key = jax.random.split(key)
        if freeze:
            z_one, _ = hmc_sampling(metric, mu, k_h, 1, mcmc_steps_nbr)
            all_z = jnp.tile(z_one, (num_gen_seq, 1))
        else:
            all_z, _ = hmc_sampling(metric, mu, k_h, num_gen_seq, mcmc_steps_nbr)

        recs, seqs = [], []
        for lo in range(0, num_gen_seq, batch_size):
            z_vi = all_z[lo: lo + batch_size]
            key, k_p = jax.random.split(key)
            z_seq = self._propagate(k_p, z_vi, vi_index)
            flat = z_seq.reshape(-1, self.latent_dim)
            recon = self.decoder.apply(
                {"params": params["decoder"]}, flat
            ).reconstruction
            recs.append(recon.reshape(-1, self.n_obs, *self.input_dim))
            seqs.append(z_seq)
        return jnp.concatenate(recs, axis=0), jnp.concatenate(seqs, axis=0)

    # -- predict (lldm_model.py:765-844) --------------------------------------------

    def predict(
        self,
        variables: Dict[str, Any],
        x: Array,
        vi_index: int,
        key: Array,
        num_gen_seq: int = 1,
        batch_size: int = 100,
    ) -> Array:
        """Stochastic future prediction: encode the ``vi_index``-th visit
        (posterior mean), replicate ``num_gen_seq`` times, denoise each copy
        forward with fresh DDIM noise, decode.  Returns
        [n_seq, num_gen_seq, n_obs - vi_index - 1, *input_dim]."""
        params = variables["params"]
        x = x[None] if x.ndim == 4 else x
        n_seq = x.shape[0]
        batch_size = min(num_gen_seq, batch_size)
        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        z_vi = enc.embedding  # [n_seq, D]

        outs = []
        for lo in range(0, num_gen_seq, batch_size):
            m = min(batch_size, num_gen_seq - lo)
            z = jnp.repeat(z_vi, m, axis=0)  # [n_seq*m, D]
            key, k_p = jax.random.split(key)
            z_seq = self._propagate(k_p, z, vi_index, future_only=True)
            # drop the anchor frame: keep vi_index+1 .. n_obs-1
            z_fut = z_seq[:, 1:, :]
            t_fut = self.n_obs - vi_index - 1
            recon = self.decoder.apply(
                {"params": params["decoder"]},
                z_fut.reshape(-1, self.latent_dim),
            ).reconstruction
            outs.append(recon.reshape(n_seq, m, t_fut, *self.input_dim))
        return jnp.concatenate(outs, axis=1)

    # -- NLL (lldm_model.py:849-999) ------------------------------------------------

    def get_nll(
        self,
        variables: Dict[str, Any],
        data: Array,
        vi_index: int,
        key: Array,
        n_samples: int = 1,
        batch_size: int = 100,
    ) -> float:
        """Importance-sampled log-likelihood estimate: for each sequence,
        replicate, encode the visit of interest, bridge, decode, and
        logsumexp the per-frame decoder likelihoods (the reference's final
        estimator keeps only log p(x|z), lldm_model.py:985-994)."""
        params = variables["params"]
        # remainder importance samples are dropped exactly as the reference
        # does (lldm_model.py:861-865: n_samples > batch_size keeps only
        # n_samples // batch_size full batches)
        n_full_batch = max(1, n_samples // batch_size) if n_samples > batch_size else 1
        bs = min(n_samples, batch_size)
        dim_prod = float(np.prod(self.input_dim))
        log_p = []
        for i in range(data.shape[0]):
            x = data[i][None]
            log_p_x = []
            for _ in range(n_full_batch):
                x_rep = jnp.repeat(x, bs, axis=0)
                key, k_e, k_p = jax.random.split(key, 3)
                z, _, _, _ = self._encode_vi(params, k_e, x_rep, vi_index)
                z_seq = self._propagate(k_p, z, vi_index)
                recon = self.decoder.apply(
                    {"params": params["decoder"]},
                    z_seq.reshape(-1, self.latent_dim),
                ).reconstruction
                r_flat = recon.reshape(bs * self.n_obs, -1)
                x_flat = x_rep.reshape(bs * self.n_obs, -1)
                if self.reconstruction_loss == "mse":
                    lp = (-0.5 * jnp.sum((r_flat - x_flat) ** 2, axis=-1)
                          - dim_prod / 2 * math.log(2 * math.pi))
                else:
                    r = jnp.clip(r_flat.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
                    lp = jnp.sum(x_flat * jnp.log(r)
                                 + (1 - x_flat) * jnp.log(1 - r), axis=-1)
                log_p_x.append(lp.reshape(bs, self.n_obs).mean(axis=-1))
            log_p_x = jnp.concatenate(log_p_x)
            # keep on device; one batched fetch after the loop (tunnel cost)
            log_p.append(
                jax.scipy.special.logsumexp(log_p_x) - math.log(log_p_x.shape[0])
            )
        return float(np.mean(jax.device_get(log_p)))

    # -- encode (lldm_model.py:1001-1022) --------------------------------------------

    def encode(self, variables: Dict[str, Any], x: Array, key: Array) -> Array:
        """Posterior samples for each frame: [B, n_obs, D]."""
        params = variables["params"]
        x = x[:, None] if x.ndim == 4 else x
        b, t = x.shape[0], x.shape[1]
        enc = self.encoder.apply({"params": params["encoder"]},
                                 x.reshape(b * t, *x.shape[2:]))
        mu = enc.embedding.reshape(b, t, -1)
        log_var = enc.log_covariance.reshape(b, t, -1)
        z, _ = self._sample_gauss(key, mu, jnp.exp(0.5 * log_var))
        return z
