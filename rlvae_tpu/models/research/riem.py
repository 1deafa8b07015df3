"""RIEM — Riemannian longitudinal VAE with latent temporal dynamics.

TPU-native reimplementation of the vendored pythae RIEM research model
(reference: src/lib/src/pythae/models/riem/riem_model.py:26-1166).  NB: the
reference file is UNIMPORTABLE in its own tree — it imports
``diffusion.stable_diffusion`` and ``geometric_perspective_on_vaes``, neither
of which is vendored (riem_model.py:19-21; the sibling LLDM is commented out
of pythae's __init__ for the same reason).  This module therefore
reimplements the importable math faithfully and replaces the external frozen
latent-diffusion/DDIM pair with a pluggable ``LatentDynamics`` protocol
(a self-contained DDIM-style linear-schedule implementation ships as the
default), keeping the training scheme intact:

- metric-adjusted sampling ``z + chol(G(z)) gamma / sqrt(beta0)``
  (riem_model.py:55-71 sample_with_metric) on our CentroidMetric,
- uniform-on-manifold z0 via rejection against the volume element
  (riem_model.py:75-110 _sample_uniform_riemann), jit-safe fixed-trials form,
- per-visit-index training: encode ONE visit, evolve its latent backward and
  forward through the dynamics to all other timesteps, decode everything
  (riem_model.py:209-340),
- the per-visit loss: per-frame masked reconstruction + a KL term active
  only at the boundary visits, whose prior carries the Riemannian volume
  0.5 log det G(z) (riem_model.py:494-620 loss_function / log_p_j_hat),
  clamped to [-2, 500] with beta scheduling,
- warmup epochs fall back to the plain VAE objective with optional IAF
  posterior (riem_model.py:241-280, _vae_loss_function /
  _vae_iaf_loss_function).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.geometry.metric import CentroidMetric
from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array


def sample_with_metric(
    metric: CentroidMetric, key: Array, z: Array, beta_zero_sqrt: float = 1.0
) -> Array:
    """z + chol(G(z)) gamma / sqrt(beta0) (riem_model.py:55-71)."""
    gamma = jax.random.normal(key, z.shape)
    l = gm.chol_g(metric, z)
    return z + jnp.einsum("bij,bj->bi", l, gamma / beta_zero_sqrt)


def sample_uniform_riemann(
    metric: CentroidMetric,
    key: Array,
    n_samples: int,
    latent_dim: int,
    domain_low: float = -1.0,
    domain_high: float = 1.0,
    m_bound: float = 10.0,
    n_trials: int = 64,
) -> Array:
    """Uniform w.r.t. the Riemannian volume on a box, by rejection against
    sqrt(det G)/M (riem_model.py:75-110).  The reference's unbounded while
    loop becomes a fixed-trials accept-first selection (static shapes under
    jit); if no trial is accepted the highest-volume candidate is used."""
    k_c, k_u = jax.random.split(key)
    cand = jax.random.uniform(
        k_c, (n_samples, n_trials, latent_dim), minval=domain_low, maxval=domain_high
    )
    flat = cand.reshape(n_samples * n_trials, latent_dim)
    vol = jnp.exp(0.5 * gm.logdet_g(metric, flat)).reshape(n_samples, n_trials)
    u = jax.random.uniform(k_u, (n_samples, n_trials))
    accept = u < vol / m_bound
    # first accepted trial, else the max-volume one
    first = jnp.argmax(accept, axis=1)
    fallback = jnp.argmax(vol, axis=1)
    idx = jnp.where(accept.any(axis=1), first, fallback)
    return cand[jnp.arange(n_samples), idx]


class LatentDynamics:
    """DDIM-style deterministic latent dynamics over the sequence axis —
    the self-contained stand-in for the reference's frozen MyLatentDiffusion
    + DDIMSampler pair (riem_model.py:124-129, 318-340).

    A linear beta schedule assigns each timestep t a noise level; ``forward``
    (t -> t+1) renoises toward the terminal prior, ``backward`` (t -> t-1)
    denoises using a noise predictor ``eps_fn(params, z, t)`` (default: the
    identity-free analytic form, or a trainable MLP passed in pretrained &
    frozen, as the reference expects)."""

    def __init__(self, latent_dim: int, n_obs: int, beta_start: float = 1e-3,
                 beta_end: float = 0.25, eps_fn=None):
        self.latent_dim = latent_dim
        self.n_obs = n_obs
        betas = np.linspace(beta_start, beta_end, n_obs, dtype=np.float64)
        alphas = np.cumprod(1.0 - betas)
        self.alpha_bar = jnp.asarray(alphas, jnp.float32)  # [T]
        self.eps_fn = eps_fn or (lambda params, z, t: z / jnp.sqrt(1.0 + t))

    def forward_step(self, params, key: Array, z: Array, t: int) -> Array:
        """z_t -> z_{t+1}: deterministic DDIM renoising step."""
        a_t, a_n = self.alpha_bar[t], self.alpha_bar[t + 1]
        eps = self.eps_fn(params, z, jnp.float32(t))
        x0 = (z - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_n) * x0 + jnp.sqrt(1.0 - a_n) * eps

    def backward_step(self, params, key: Array, z: Array, t: int) -> Array:
        """z_t -> z_{t-1}: deterministic DDIM denoising step."""
        a_t, a_p = self.alpha_bar[t], self.alpha_bar[t - 1]
        eps = self.eps_fn(params, z, jnp.float32(t))
        x0 = (z - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps


class RIEM:
    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 16,
        n_obs: int = 8,
        warmup: int = 50,  # lvae_iaf_config.py:28 default
        beta: float = 1.0,
        linear_scheduling_steps: int = 0,
        prior: str = "standard",  # standard | vamp (riem_model.py:590-604)
        posterior: str = "gaussian",  # gaussian | iaf
        flow_hidden_size: int = 64,
        metric: Optional[CentroidMetric] = None,
        dynamics: Optional[LatentDynamics] = None,
        use_uniform_sample: bool = True,
        temperature: float = 1.0,
        encoder_config: Optional[Mapping[str, Any]] = None,
        decoder_config: Optional[Mapping[str, Any]] = None,
    ):
        if prior not in ("standard", "vamp"):
            raise ValueError("prior must be 'standard' or 'vamp'")
        if posterior not in ("gaussian", "iaf"):
            raise ValueError("posterior must be 'gaussian' or 'iaf'")
        self.input_dim = tuple(input_dim)
        self.latent_dim = latent_dim
        self.n_obs = n_obs
        self.warmup = warmup
        self.beta = float(beta)
        self.linear_scheduling = linear_scheduling_steps
        self.prior = prior
        self.posterior = posterior
        self.metric = metric
        self.use_uniform_sample = use_uniform_sample
        self.temperature = temperature
        self.beta_zero_sqrt = math.sqrt(beta) if beta else 1.0
        self.dynamics = dynamics or LatentDynamics(latent_dim, n_obs)
        self.encoder = create_encoder(self.input_dim, latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)
        if posterior == "iaf":
            from rlvae_tpu.flows.iaf import iaf_masks

            self.flow_hidden = flow_hidden_size
            # reference posterior IAF: n_blocks=3, n_hidden_in_made=2
            # (riem_model.py:161-169)
            self.flow_blocks, self.flow_hidden_layers = 3, 2
            self.flow_masks = iaf_masks(latent_dim, flow_hidden_size, 2)

    def init(self, key: Array) -> Dict[str, Any]:
        k_e, k_d, k_f = jax.random.split(key, 3)
        x0 = jnp.zeros((2, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((2, self.latent_dim), jnp.float32)
        params = {
            "encoder": dict(self.encoder.init(k_e, x0))["params"],
            "decoder": dict(self.decoder.init(k_d, z0))["params"],
            "dynamics": {},  # the default analytic eps_fn is parameter-free
        }
        if self.posterior == "iaf":
            from rlvae_tpu.flows.iaf import init_iaf

            params["posterior_flow"] = init_iaf(
                k_f, self.latent_dim, self.flow_hidden,
                self.flow_blocks, self.flow_hidden_layers,
            )
        return {"params": params}

    # -- pieces -----------------------------------------------------------------

    def _apply_posterior_flow(self, params, z: Array) -> Tuple[Array, Array]:
        from rlvae_tpu.flows.iaf import iaf_inverse

        return iaf_inverse(params["posterior_flow"], self.flow_masks, z)

    def log_p_j_hat(self, z: Array, j: int) -> Array:
        """Boundary-visit prior: N(0,I) at j=0; metric-volume-corrected
        Gaussian elsewhere (riem_model.py:606-620)."""
        base = jnp.sum(-0.5 * z**2, axis=1)
        if j == 0 or self.metric is None:
            return base
        return base + 0.5 * gm.logdet_g(self.metric, z)

    def _evolve(self, params, key: Array, z: Array, vi_index: int):
        """Latent sequence from the visit latent via the dynamics
        (riem_model.py:296-340: backward to 0, forward to n_obs-1)."""
        zs = {vi_index: z}
        z_b = z
        for i in range(vi_index - 1, -1, -1):
            key, k = jax.random.split(key)
            z_b = self.dynamics.backward_step(params["dynamics"], k, z_b, i + 1)
            zs[i] = z_b
        z_f = z
        for i in range(vi_index, self.n_obs - 1):
            key, k = jax.random.split(key)
            z_f = self.dynamics.forward_step(params["dynamics"], k, z_f, i)
            zs[i + 1] = z_f
        return jnp.stack([zs[i] for i in range(self.n_obs)], axis=1)  # [B,T,D]

    def _recon_per_frame(self, recon_flat, x_flat, pix_flat):
        return jnp.sum(0.5 * (recon_flat - x_flat) ** 2 * pix_flat, axis=-1)

    # -- forward ------------------------------------------------------------------

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
        """x: [B, n_obs, C, H, W].  ``vi_index`` (static) selects the encoded
        visit for the non-warmup branch; pick it host-side per step (the
        reference draws it uniformly, riem_model.py:283-291)."""
        params = variables["params"]
        b, t = x.shape[0], x.shape[1]
        seq_mask = jnp.ones((b, t), x.dtype) if seq_mask is None else seq_mask
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        x = x * pix_mask * seq_mask[:, :, None, None, None]

        if epoch < self.warmup:
            return self._forward_warmup(params, x, key, epoch, train, seq_mask, pix_mask)

        vi_index = int(np.random.randint(0, self.n_obs)) if vi_index is None else vi_index
        k_s, k_m, k_f, k_e = jax.random.split(key, 4)
        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        mu, log_var = enc.embedding, enc.log_covariance

        if self.use_uniform_sample and self.metric is not None:
            z = sample_uniform_riemann(self.metric, k_s, b, self.latent_dim)
        else:
            z = mu + jax.random.normal(k_s, mu.shape) * jnp.exp(0.5 * log_var)
        if self.metric is not None:
            z = sample_with_metric(self.metric, k_m, z, self.beta_zero_sqrt)
        z0 = z
        log_det = jnp.zeros(b, jnp.float32)
        if self.posterior == "iaf":
            z, log_det = self._apply_posterior_flow(params, z)

        z_seq = self._evolve(params, k_e, z, vi_index)  # [B,T,D]
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z_seq.reshape(b * t, self.latent_dim)
        ).reconstruction

        loss, recon_mean, kl_mean = self.loss_function(
            recon, x, mu, log_var, z0, z_seq, vi_index, z, log_det, epoch,
            seq_mask, pix_mask, train,
        )
        return ModelOutput(
            loss=loss,
            reconstruction_loss=recon_mean,
            reg_loss=kl_mean,
            recon_x=recon.reshape(x.shape),
            z=z,
            z_seq=z_seq,
            vi_index=vi_index,
        )

    def loss_function(
        self, recon_x, x, mu, log_var, z_0_vi_index, z_seq, vi_index,
        z_vi_index, log_abs_det_jac_posterior, epoch,
        seq_mask=None, pix_mask=None, train: bool = False,
    ):
        """The per-visit sequence loss (riem_model.py:494-589): 0.5*MSE
        per-frame reconstruction averaged over the sequence + the
        boundary-gated, [-2, 500]-clamped KL against log_p_j_hat, with beta
        scheduling.  Returns (loss, mean recon, mean KL)."""
        b, t = x.shape[0], x.shape[1]
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        recon_pf = self._recon_per_frame(
            recon_x.reshape(b * t, -1),
            x.reshape(b * t, -1),
            pix_mask.reshape(b * t, -1),
        )
        recon_per_sample = recon_pf.reshape(b, t).mean(axis=1)
        # KL active only at boundary visits (riem_model.py:566-576)
        log_prob_z = (
            jnp.sum(
                -0.5 * (log_var + (z_0_vi_index - mu) ** 2 / (jnp.exp(log_var) + 1e-7)),
                axis=1,
            )
            - log_abs_det_jac_posterior
        )
        if vi_index in (0, self.n_obs - 1):
            kl = jnp.clip(
                log_prob_z - self.log_p_j_hat(z_vi_index, vi_index), -2.0, 500.0
            )
        else:
            kl = jnp.zeros_like(log_prob_z)
        beta = self._beta(epoch, train)
        loss = jnp.mean(recon_per_sample + beta * kl)
        return loss, jnp.mean(recon_pf), jnp.mean(kl)

    __call__ = forward

    def _beta(self, epoch: int, train: bool) -> float:
        if self.linear_scheduling > 0 and train:
            return min(self.beta * epoch / self.linear_scheduling, self.beta)
        return self.beta

    def _forward_warmup(self, params, x, key, epoch, train, seq_mask, pix_mask):
        """Plain per-frame VAE objective during warmup (riem_model.py:241-280,
        _vae_loss_function / _vae_iaf_loss_function)."""
        b, t = x.shape[0], x.shape[1]
        x_flat = x.reshape(b * t, *self.input_dim)
        k_s, k_m = jax.random.split(key)
        enc = self.encoder.apply({"params": params["encoder"]}, x_flat)
        mu, log_var = enc.embedding, enc.log_covariance
        z = mu + jax.random.normal(k_s, mu.shape) * jnp.exp(0.5 * log_var)
        if self.metric is not None:
            z = sample_with_metric(self.metric, k_m, z, self.beta_zero_sqrt)
        z0 = z
        log_det = jnp.zeros(b * t, jnp.float32)
        if self.posterior == "iaf":
            z, log_det = self._apply_posterior_flow(params, z)
        recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction
        recon_pf = self._recon_per_frame(
            recon.reshape(b * t, -1), x_flat.reshape(b * t, -1),
            pix_mask.reshape(b * t, -1),
        )
        if self.posterior == "iaf":
            log_q = jnp.sum(
                -0.5 * (log_var + (z0 - mu) ** 2 / jnp.exp(log_var)), axis=1
            )
            kld = log_q - jnp.sum(-0.5 * z**2, axis=1) - log_det
        else:
            kld = -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)
        mask_flat = seq_mask.reshape(b * t)
        loss = jnp.mean((recon_pf + kld) * mask_flat)
        return ModelOutput(
            loss=loss,
            reconstruction_loss=jnp.mean(recon_pf),
            reg_loss=jnp.mean(kld),
            recon_x=recon.reshape(x.shape),
            z=z,
            z_seq=z.reshape(b, t, self.latent_dim),
            vi_index=-1,
        )

    # -- generation / prediction -----------------------------------------------

    def generate(self, variables: Dict[str, Any], key: Array, n: int) -> Array:
        """Sample terminal latents and run the dynamics backward through the
        whole sequence, decoding every visit (riem_model.py:793-954)."""
        params = variables["params"]
        k_z, k_m, k_e = jax.random.split(key, 3)
        z = jax.random.normal(k_z, (n, self.latent_dim))
        if self.metric is not None:
            z = sample_with_metric(self.metric, k_m, z, self.beta_zero_sqrt)
        z_seq = self._evolve(params, k_e, z, self.n_obs - 1)
        recon = self.decoder.apply(
            {"params": params["decoder"]},
            z_seq.reshape(n * self.n_obs, self.latent_dim),
        ).reconstruction
        return recon.reshape(n, self.n_obs, *self.input_dim)

    def predict(
        self, variables: Dict[str, Any], x_vi: Array, vi_index: int, key: Array
    ) -> Array:
        """Encode one visit, evolve to all timesteps, decode — the
        sequence-completion path (riem_model.py:955-1033)."""
        params = variables["params"]
        enc = self.encoder.apply({"params": params["encoder"]}, x_vi)
        z = enc.embedding
        if self.posterior == "iaf":
            z, _ = self._apply_posterior_flow(params, z)
        z_seq = self._evolve(params, key, z, vi_index)
        n = x_vi.shape[0]
        recon = self.decoder.apply(
            {"params": params["decoder"]},
            z_seq.reshape(n * self.n_obs, self.latent_dim),
        ).reconstruction
        return recon.reshape(n, self.n_obs, *self.input_dim)


# NB: LLDM is no longer an alias of RIEM — it has its own full
# reimplementation in rlvae_tpu/models/research/lldm.py (frozen latent
# diffusion bridge, DDIM sampler, sampled observation metric, HMC
# generation; reference lldm_model.py:23-1029).
