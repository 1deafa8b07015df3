"""Generation-time sampler zoo — the pythae sampler surface.

Reimplements the vendored pythae generation samplers (reference:
src/lib/src/pythae/samplers/) as jitted latent samplers + batched decode:

- ``BaseGenerationSampler`` — fit/sample/save surface
  (base/base_sampler.py:13-95: batched generation, optional saving,
  sampler-config sidecar),
- ``NormalSampler`` — z ~ N(0, I) -> decode
  (normal_sampling/normal_sampler.py:37-85),
- ``VampSampler`` — encode the model's pseudo-inputs, pick a random mixture
  component per sample, reparameterize, decode
  (vamp_sampler/vamp_sampler.py:40-112),
- ``RHVAESampler`` — HMC on the metric manifold starting at centroids
  (manifold_sampler/rhvae_sampler.py:98-148), delegating to this framework's
  compiled nested-scan chain (:mod:`rlvae_tpu.samplers.hmc`).

TPU-first: latents are drawn in one jitted call per batch and decoded as a
single ``[B, D] -> [B, C, H, W]`` MXU pass; saving is host-side .npz.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlvae_tpu.samplers.hmc import HMCConfig, sample_prior_hmc


class BaseGenerationSampler:
    """fit() -> sample() surface matching pythae's BaseSampler.

    Subclasses implement :meth:`sample_latents`; decode comes from the
    wrapped model (any object with ``decode(variables, z)`` or a bound
    ``decode(z)``).
    """

    name = "BaseGenerationSampler"

    def __init__(self, model, variables: Optional[Dict[str, Any]] = None):
        self.model = model
        self.variables = variables

    # -- hooks -----------------------------------------------------------------

    def fit(self, train_data=None, eval_data=None, training_config=None) -> None:
        """Most samplers need no fitting (reference base_sampler.py:49)."""

    def sample_latents(self, key: jax.Array, n: int) -> jax.Array:
        raise NotImplementedError

    # -- generation ------------------------------------------------------------

    def _decode(self, z: jax.Array) -> np.ndarray:
        if self.variables is not None:
            out = self.model.decode(self.variables, z)
        else:
            out = self.model.decode(z)
        if isinstance(out, tuple):  # RlVAE.decode -> (output, state_updates)
            out = out[0]
        return np.asarray(getattr(out, "reconstruction", out))

    def sample(
        self,
        num_samples: int = 1,
        batch_size: int = 500,
        output_dir: Optional[str | Path] = None,
        return_gen: bool = True,
        save_sampler_config: bool = False,
        seed: int = 0,
    ):
        """Generate ``num_samples`` images in device-sized batches
        (reference base_sampler.py:51-95)."""
        key = jax.random.PRNGKey(seed)
        out = []
        remaining = int(num_samples)
        while remaining > 0:
            b = min(batch_size, remaining)
            key, k = jax.random.split(key)
            z = self.sample_latents(k, b)
            out.append(self._decode(z))
            remaining -= b
        gen = np.concatenate(out, axis=0)[:num_samples]
        if output_dir is not None:
            outp = Path(output_dir)
            outp.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(outp / "generated.npz", images=gen)
            if save_sampler_config:
                (outp / "sampler_config.json").write_text(
                    json.dumps({"name": self.name, "num_samples": int(num_samples)})
                )
        return gen if return_gen else None


class NormalSampler(BaseGenerationSampler):
    """Standard-normal prior sampling (reference normal_sampler.py:37-85)."""

    name = "NormalSampler"

    def __init__(self, model, variables=None, latent_dim: Optional[int] = None):
        super().__init__(model, variables)
        self.latent_dim = int(latent_dim or model.latent_dim)

    def sample_latents(self, key, n):
        return jax.random.normal(key, (n, self.latent_dim), jnp.float32)


class VampSampler(BaseGenerationSampler):
    """VampPrior mixture sampling (reference vamp_sampler.py:40-112): encode
    the learned pseudo-inputs, draw a component index per sample, and
    reparameterize from that component's posterior."""

    name = "VampSampler"

    def __init__(self, model, variables):
        super().__init__(model, variables)

    def sample_latents(self, key, n):
        params = self.variables["params"]
        x_pseudo = self.model.pseudo_inputs(params)
        enc = self.model.encoder.apply({"params": params["encoder"]}, x_pseudo)
        mu_k, lv_k = enc.embedding, enc.log_covariance  # [C, D]
        k_idx, k_eps = jax.random.split(key)
        idx = jax.random.randint(k_idx, (n,), 0, self.model.number_components)
        mu = jnp.take(mu_k, idx, axis=0)
        # pythae clamps the component log-covariance with tanh
        # (vamp_sampler.py:66,90) — without it sharp components sample with
        # exponentially wrong variance
        lv = jnp.tanh(jnp.take(lv_k, idx, axis=0))
        eps = jax.random.normal(k_eps, mu.shape, jnp.float32)
        return mu + jnp.exp(0.5 * lv) * eps

    def _decode(self, z):
        params = self.variables["params"]
        dec = self.model.decoder.apply({"params": params["decoder"]}, z)
        return np.asarray(dec.reconstruction)


class RHVAEGenerationSampler(BaseGenerationSampler):
    """Manifold HMC prior sampling (reference rhvae_sampler.py:98-148) via
    the compiled centroid-start chain."""

    name = "RHVAESampler"

    def __init__(self, model, variables, metric=None, hmc_config: Optional[HMCConfig] = None):
        super().__init__(model, variables)
        self.metric = metric if metric is not None else model.metric
        if self.metric is None:
            raise ValueError("RHVAE sampling requires a metric (load_pretrained_metric)")
        self.hmc = hmc_config or HMCConfig(init="centroids")

    def sample_latents(self, key, n):
        return sample_prior_hmc(self.metric, key, n, self.hmc)


class AdaptiveRHVAEGenerationSampler(BaseGenerationSampler):
    """Beyond-reference manifold sampler: dual-averaging calibration + warm
    start pool (samplers/hmc.py:calibrate_adaptive_plan) paid once in
    :meth:`fit`, then every :meth:`sample_latents` is one compiled
    fixed-eps chain — 13.4x the official chain's effective-samples/sec at
    equal dispatch (1.45x the wall per run; the one-time calibration
    amortizes after ~101 cached-plan requests) with Fréchet-vs-gold better
    than the official chain (outputs/adaptive_hmc/summary.json incl.
    `calibration_breakeven`).  The parity-exact ``rhvae`` sampler is
    untouched."""

    name = "AdaptiveRHVAESampler"

    def __init__(self, model, variables, metric=None,
                 hmc_config: Optional[HMCConfig] = None,
                 pool_size: int = 4096, gen_steps: int = 12,
                 persistent: bool = True,
                 calibration_key: Optional[jax.Array] = None):
        super().__init__(model, variables)
        self.metric = metric if metric is not None else model.metric
        if self.metric is None:
            raise ValueError("RHVAE sampling requires a metric (load_pretrained_metric)")
        self.hmc = hmc_config or HMCConfig(init="centroids")
        self.pool_size = pool_size
        self.gen_steps = gen_steps
        # persistent-chain mode: each call's final states are scattered back
        # into the pool, so the stored chains only ever get MORE converged
        # with use (quality is monotone in total steps; reproducibility of a
        # single call given the same key still holds for a fresh sampler)
        self.persistent = persistent
        self._cal_key = (calibration_key if calibration_key is not None
                         else jax.random.PRNGKey(12))
        self.plan: Optional[dict] = None

    def fit(self, train_data=None, eval_data=None, training_config=None) -> None:
        """Calibration IS this sampler's fit step (the pythae RHVAE sampler
        uses fit() to train its HMC hyper-nets; here it tunes eps/n_lf and
        spreads the warm pool — one-time, reused by every sample call)."""
        from rlvae_tpu.samplers.hmc import calibrate_adaptive_plan

        self.plan = calibrate_adaptive_plan(
            self.metric, self._cal_key, self.hmc, pool_size=self.pool_size)

    def sample_latents(self, key, n):
        from rlvae_tpu.samplers.hmc import sample_prior_hmc_planned

        if self.plan is None:
            self.fit()
        if not self.persistent:
            return sample_prior_hmc_planned(
                self.metric, key, n, self.plan, steps=self.gen_steps,
                config=self.hmc)
        # persistent mode: select the start subset here and run the fixed
        # chain directly so each final state scatters back into ITS OWN
        # pool slot (slot eps and state must stay paired — each slot's eps
        # was tuned for the well its chain lives in)
        from rlvae_tpu.samplers.hmc import (
            ADAPTIVE_EPS_JITTER,
            _terms_fn,
            draw_chain_noise,
            run_hmc_chain_fixed,
        )

        pool = jnp.asarray(self.plan["pool"], jnp.float32)
        pool_eps = jnp.asarray(self.plan["pool_eps"], jnp.float32)
        k_init, k_s, k_j = jax.random.split(key, 3)
        if n <= pool.shape[0]:
            idx = jax.random.permutation(k_init, pool.shape[0])[:n]
        else:
            idx = jax.random.randint(k_init, (n,), 0, pool.shape[0])
        terms = _terms_fn(self.metric, self.hmc.backend)
        g_s, u_s = draw_chain_noise(k_s, self.gen_steps, n,
                                    self.metric.latent_dim)
        jitters = 1.0 + ADAPTIVE_EPS_JITTER * (
            2.0 * jax.random.uniform(k_j, (self.gen_steps, n)) - 1.0)
        zs, _, _ = run_hmc_chain_fixed(
            terms, pool[idx], g_s, u_s, pool_eps[idx],
            int(self.plan["n_lf"]), jitters)
        z = zs[-1]
        self.plan["pool"] = pool.at[idx].set(z)
        return z


SAMPLER_REGISTRY = {
    "normal": NormalSampler,
    "vamp": VampSampler,
    "rhvae": RHVAEGenerationSampler,
    "rhvae_adaptive": AdaptiveRHVAEGenerationSampler,
}
