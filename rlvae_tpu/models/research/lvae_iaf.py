"""LVAE_IAF — Longitudinal VAE with per-transition IAF flows.

TPU-native reimplementation of the vendored pythae LVAE_IAF (reference:
src/lib/src/pythae/models/lvae_iaf/lvae_iaf_model.py:24-1055; its diffusion
imports at :19-21 are vestigial — the forward/loss use only the IAF chain).
This is the direct research ancestor of the main RiemannianFlowVAE: n_obs-1
IAF flows connect consecutive visits; training encodes ONE random visit and
propagates its latent backward through the flows' density direction
(z_{i+1} -> z_i, accumulating log|det J|) and forward through the sampling
direction (lvae_iaf_model.py:247-268), decoding every visit.

Loss (lvae_iaf_model.py:426-477): masked per-visit reconstruction (mean over
visits) + KL between the visit posterior (optionally IAF-transformed, with
its log-det) and the prior at z_0 pushed through the backward chain
(standard normal or VAMP mixture prior, :477-516), with linear beta warmup.
``infer_missing`` scores full-sequence candidates propagated from every
observed visit and keeps the best (:773-892)."""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.flows.iaf import iaf_forward, iaf_inverse, iaf_masks, init_iaf
from rlvae_tpu.nets import create_decoder, create_encoder
from rlvae_tpu.utils.output import ModelOutput

Array = jax.Array


class LVAE_IAF:
    def __init__(
        self,
        input_dim: Tuple[int, ...] = (3, 64, 64),
        latent_dim: int = 16,
        n_obs: int = 8,
        warmup: int = 50,  # lvae_iaf_config.py:28 default
        beta: float = 1.0,
        linear_scheduling_steps: int = 0,
        n_made_blocks: int = 2,
        n_hidden_in_made: int = 3,
        hidden_size: int = 128,
        prior: str = "standard",  # standard | vamp
        posterior: str = "gaussian",  # gaussian | iaf
        vamp_number_components: int = 50,
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
        self.vamp_number_components = vamp_number_components
        self.hidden_size = hidden_size
        self.n_made_blocks = n_made_blocks
        self.n_hidden_in_made = n_hidden_in_made
        self.masks = iaf_masks(latent_dim, hidden_size, n_hidden_in_made)
        # reference posterior IAF: n_blocks=3, n_hidden_in_made=2 (:94-104)
        self.posterior_masks = iaf_masks(latent_dim, hidden_size, 2)
        self.encoder = create_encoder(self.input_dim, latent_dim, encoder_config)
        self.decoder = create_decoder(self.input_dim, latent_dim, decoder_config)

    def init(self, key: Array) -> Dict[str, Any]:
        keys = jax.random.split(key, 5)
        x0 = jnp.zeros((2, *self.input_dim), jnp.float32)
        z0 = jnp.zeros((2, self.latent_dim), jnp.float32)
        params: Dict[str, Any] = {
            "encoder": dict(self.encoder.init(keys[0], x0))["params"],
            "decoder": dict(self.decoder.init(keys[1], z0))["params"],
            "flows": [
                init_iaf(k, self.latent_dim, self.hidden_size,
                         self.n_made_blocks, self.n_hidden_in_made)
                for k in jax.random.split(keys[2], self.n_obs - 1)
            ],
        }
        if self.posterior == "iaf":
            params["posterior_flow"] = init_iaf(
                keys[3], self.latent_dim, self.hidden_size, 3, 2
            )
        if self.prior == "vamp":
            c, d_in = self.vamp_number_components, int(np.prod(self.input_dim))
            bound = 1.0 / math.sqrt(c)
            params["pseudo"] = {
                "kernel": jax.random.uniform(keys[4], (c, d_in), jnp.float32, -bound, bound),
                "bias": jnp.zeros((d_in,), jnp.float32),
            }
        return {"params": params}

    # -- pieces -----------------------------------------------------------------

    def log_p_z(self, params, z: Array) -> Array:
        """Prior log-density: standard normal or VAMP mixture
        (lvae_iaf_model.py:477-516)."""
        if self.prior == "standard":
            return jnp.sum(-0.5 * z**2, axis=1)
        c = self.vamp_number_components
        pseudo = jnp.clip(
            params["pseudo"]["kernel"] + params["pseudo"]["bias"][None, :], 0.0, 1.0
        ).reshape(c, *self.input_dim)
        enc = self.encoder.apply({"params": params["encoder"]}, pseudo)
        mu_k, lv_k = enc.embedding, enc.log_covariance
        comp = jnp.sum(
            -0.5 * (lv_k[None] + (z[:, None, :] - mu_k[None]) ** 2 / jnp.exp(lv_k[None])),
            axis=2,
        ) - jnp.log(float(c))
        return jax.scipy.special.logsumexp(comp, axis=1)

    def sample_visit_latent(
        self, params, key: Array, mu: Array, log_var: Array, vi_index: int
    ) -> Array:
        """Visit-posterior sample; overridable (LVAE_GUGUS's lvaegA variant
        replaces the visit-0 draw with manifold HMC)."""
        return mu + jax.random.normal(key, mu.shape) * jnp.exp(0.5 * log_var)

    def propagate(self, params, z_vi: Array, vi_index: int):
        """Latent sequence from the visit latent: density-direction flows to
        the past (accumulating log|det J|), sampling direction to the future
        (lvae_iaf_model.py:247-268)."""
        past, log_det = [], jnp.zeros(z_vi.shape[0], jnp.float32)
        z_rev = z_vi
        for i in range(vi_index - 1, -1, -1):
            z_rev, ld = iaf_forward(params["flows"][i], self.masks, z_rev)
            log_det = log_det + ld
            past.append(z_rev)
        past.reverse()
        seq = past + [z_vi]
        z_for = z_vi
        for i in range(vi_index, self.n_obs - 1):
            z_for, _ = iaf_inverse(params["flows"][i], self.masks, z_for)
            seq.append(z_for)
        return jnp.stack(seq, axis=1), log_det  # [B, T, D], [B]

    # MSE scale of the reconstruction term: LVAE_IAF uses 0.5*MSE
    # throughout (lvae_iaf_model.py:325,350,385,428); LVAE_GUGUS overrides
    # to 1.0 (its _compute_recon_loss applies PLAIN mse, lvaeg2_model.py:406)
    recon_scale = 0.5

    def _recon_loss(self, recon, x, seq_mask, pix_mask):
        b, t = x.shape[0], x.shape[1]
        per_frame = jnp.sum(
            self.recon_scale * (recon.reshape(b * t, -1) - x.reshape(b * t, -1)) ** 2
            * pix_mask.reshape(b * t, -1),
            axis=-1,
        )
        return (per_frame.reshape(b, t) * seq_mask).mean(axis=-1)  # [B]

    def _beta(self, epoch: int, train: bool) -> float:
        if self.linear_scheduling > 0 and train:
            return min(self.beta * epoch / self.linear_scheduling, self.beta)
        return self.beta

    # -- forward -----------------------------------------------------------------

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
        params = variables["params"]
        b, t = x.shape[0], x.shape[1]
        seq_mask = jnp.ones((b, t), x.dtype) if seq_mask is None else seq_mask
        pix_mask = jnp.ones_like(x) if pix_mask is None else pix_mask
        x = x * pix_mask * seq_mask[:, :, None, None, None]

        if epoch < self.warmup:
            return self._forward_warmup(params, x, key, epoch, train, seq_mask, pix_mask)

        vi_index = int(np.random.randint(0, self.n_obs)) if vi_index is None else vi_index
        k_s, _ = jax.random.split(key)
        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        mu, log_var = enc.embedding, enc.log_covariance
        z = self.sample_visit_latent(params, k_s, mu, log_var, vi_index)
        z0_vi = z
        log_det_post = jnp.zeros(b, jnp.float32)
        if self.posterior == "iaf":
            z, log_det_post = iaf_inverse(
                params["posterior_flow"], self.posterior_masks, z
            )

        z_seq, log_det = self.propagate(params, z, vi_index)
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z_seq.reshape(b * t, self.latent_dim)
        ).reconstruction

        recon_loss = self._recon_loss(recon.reshape(x.shape), x, seq_mask, pix_mask)
        # KL: visit posterior (with posterior-flow log-det) vs the prior at
        # z_0 pushed through the backward chain (lvae_iaf_model.py:453-467)
        log_q = (
            jnp.sum(-0.5 * (log_var + (z0_vi - mu) ** 2 / (jnp.exp(log_var) + 1e-7)), axis=1)
            - log_det_post
        )
        log_prior = self.log_p_z(params, z_seq[:, 0]) + log_det
        kld = log_q - log_prior
        beta = self._beta(epoch, train)
        loss = jnp.mean(recon_loss + beta * kld)
        return ModelOutput(
            loss=loss,
            reconstruction_loss=jnp.mean(recon_loss),
            reg_loss=jnp.mean(kld),
            recon_x=recon.reshape(x.shape),
            z=z,
            z_seq=z_seq,
            vi_index=vi_index,
        )

    __call__ = forward

    def estimate_nll(
        self,
        variables: Dict[str, Any],
        x: Array,
        key: Array,
        n_samples: int = 50,
        vi_index: Optional[int] = None,
        batch_size: int = 100,
    ) -> Array:
        """Importance-sampled NLL per sequence, [B] (reference:
        lvae_iaf_model.py:900-1040 get_nll): sample the visit posterior at a
        (host-drawn, static) vi_index, propagate past/future through the
        per-transition flows, and weight by decoder likelihood x prior over
        posterior density; the 2*pi terms of q and the prior cancel.
        Importance samples are processed in chunks of ``batch_size`` (the
        reference's memory guard, :912-916), logsumexp'd across chunks."""
        if vi_index is None:
            vi_index = int(np.random.randint(0, self.n_obs))
        chunks = []
        remaining = int(n_samples)
        while remaining > 0:
            s = min(remaining, int(batch_size))
            key, k_chunk = jax.random.split(key)
            chunks.append(self._nll_chunk(variables, x, k_chunk, s, vi_index))
            remaining -= s
        log_w = jnp.concatenate(chunks, axis=0)  # [S_total, B]
        return -(
            jax.scipy.special.logsumexp(log_w, axis=0)
            - math.log(float(log_w.shape[0]))
        )

    def _nll_chunk(
        self, variables: Dict[str, Any], x: Array, key: Array, s: int, vi_index: int
    ) -> Array:
        """[s, B] importance log-weights for one chunk of samples."""
        params = variables["params"]
        b, t = x.shape[0], x.shape[1]
        k_eps, _ = jax.random.split(key)

        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        mu, log_var = enc.embedding, enc.log_covariance  # [B, D]
        eps = jax.random.normal(k_eps, (s, b, self.latent_dim), jnp.float32)
        z0_vi = (mu[None] + eps * jnp.exp(0.5 * log_var)[None]).reshape(
            s * b, self.latent_dim
        )
        z = z0_vi
        log_det_post = jnp.zeros(s * b, jnp.float32)
        if self.posterior == "iaf":
            z, log_det_post = iaf_inverse(
                params["posterior_flow"], self.posterior_masks, z
            )

        z_seq, log_det = self.propagate(params, z, vi_index)  # [SB, T, D], [SB]
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z_seq.reshape(s * b * t, self.latent_dim)
        ).reconstruction

        d_x = float(np.prod(self.input_dim))
        x_rep = jnp.broadcast_to(x[None], (s, *x.shape)).reshape(s * b * t, -1)
        per_frame = (
            -0.5 * jnp.sum((recon.reshape(s * b * t, -1) - x_rep) ** 2, axis=-1)
            - d_x / 2.0 * math.log(2.0 * math.pi)
        )
        log_p_x_given_z = per_frame.reshape(s * b, t).sum(axis=-1)

        log_q = (
            jnp.sum(
                -0.5
                * (
                    log_var[None].repeat(s, 0).reshape(s * b, -1)
                    + eps.reshape(s * b, -1) ** 2
                ),
                axis=1,
            )
            - log_det_post
        )
        log_prior = self.log_p_z(params, z_seq[:, 0]) + log_det
        return (log_p_x_given_z + log_prior - log_q).reshape(s, b)

    def _forward_warmup(self, params, x, key, epoch, train, seq_mask, pix_mask):
        """Per-frame VAE objective during warmup (lvae_iaf_model.py:148-198)."""
        b, t = x.shape[0], x.shape[1]
        x_flat = x.reshape(b * t, *self.input_dim)
        enc = self.encoder.apply({"params": params["encoder"]}, x_flat)
        mu, log_var = enc.embedding, enc.log_covariance
        z = mu + jax.random.normal(key, mu.shape) * jnp.exp(0.5 * log_var)
        z0 = z
        log_det_post = jnp.zeros(b * t, jnp.float32)
        if self.posterior == "iaf":
            z, log_det_post = iaf_inverse(
                params["posterior_flow"], self.posterior_masks, z
            )
        recon = self.decoder.apply({"params": params["decoder"]}, z).reconstruction
        per_frame = jnp.sum(
            self.recon_scale
            * (recon.reshape(b * t, -1) - x_flat.reshape(b * t, -1)) ** 2
            * pix_mask.reshape(b * t, -1),
            axis=-1,
        )
        if self.posterior == "iaf":
            log_q = jnp.sum(
                -0.5 * (log_var + (z0 - mu) ** 2 / jnp.exp(log_var)), axis=1
            ) - log_det_post
            kld = log_q - self.log_p_z(params, z)
        else:
            kld = -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)
        loss = jnp.mean((per_frame + kld) * seq_mask.reshape(b * t))
        return ModelOutput(
            loss=loss,
            reconstruction_loss=jnp.mean(per_frame),
            reg_loss=jnp.mean(kld),
            recon_x=recon.reshape(x.shape),
            z=z,
            z_seq=z.reshape(b, t, self.latent_dim),
            vi_index=-1,
        )

    # -- inference ---------------------------------------------------------------

    def reconstruct(
        self, variables: Dict[str, Any], x: Array, vi_index: int, key: Array
    ) -> Array:
        """Encode visit vi, propagate, decode the full sequence
        (lvae_iaf_model.py:516-588)."""
        params = variables["params"]
        enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi_index])
        z = enc.embedding
        if self.posterior == "iaf":
            z, _ = iaf_inverse(params["posterior_flow"], self.posterior_masks, z)
        z_seq, _ = self.propagate(params, z, vi_index)
        b = x.shape[0]
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z_seq.reshape(b * self.n_obs, self.latent_dim)
        ).reconstruction
        return recon.reshape(b, self.n_obs, *self.input_dim)

    def generate(self, variables: Dict[str, Any], key: Array, n: int,
                 vi_index: int = 0) -> Array:
        """Prior-sample the visit latent, propagate, decode
        (lvae_iaf_model.py:589-718, random_normal path)."""
        params = variables["params"]
        z = jax.random.normal(key, (n, self.latent_dim))
        z_seq, _ = self.propagate(params, z, vi_index)
        recon = self.decoder.apply(
            {"params": params["decoder"]}, z_seq.reshape(n * self.n_obs, self.latent_dim)
        ).reconstruction
        return recon.reshape(n, self.n_obs, *self.input_dim)

    def infer_missing(
        self, variables: Dict[str, Any], x: Array, seq_mask: Array, pix_mask: Array,
        key: Array,
    ) -> Array:
        """Fill missing visits: propagate full candidates from EVERY observed
        visit, keep the per-sample best by masked recon loss
        (lvae_iaf_model.py:773-892)."""
        params = variables["params"]
        b = x.shape[0]
        x = x * pix_mask * seq_mask[:, :, None, None, None]
        candidates, scores = [], []
        observed = [int(i) for i in range(self.n_obs) if float(seq_mask[0, i]) != 0.0]
        for vi in observed:
            key, k = jax.random.split(key)
            enc = self.encoder.apply({"params": params["encoder"]}, x[:, vi])
            z = enc.embedding + jax.random.normal(k, enc.embedding.shape) * jnp.exp(
                0.5 * enc.log_covariance
            )
            if self.posterior == "iaf":
                z, _ = iaf_inverse(params["posterior_flow"], self.posterior_masks, z)
            z_seq, _ = self.propagate(params, z, vi)
            recon = self.decoder.apply(
                {"params": params["decoder"]},
                z_seq.reshape(b * self.n_obs, self.latent_dim),
            ).reconstruction.reshape(x.shape)
            candidates.append(recon)
            scores.append(self._recon_loss(recon, x, seq_mask, pix_mask))
        cands = jnp.stack(candidates)  # [V, B, T, ...]
        best = jnp.argmin(jnp.stack(scores), axis=0)  # [B]
        return cands[best, jnp.arange(b)]
