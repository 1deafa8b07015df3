"""Manifold Hamiltonian Monte Carlo — the generation-path workhorse.

Reimplements the reference's two HMC surfaces as fully jit'd nested scans:

- the official pythae prior chain (reference: pythae samplers/manifold_sampler/
  rhvae_sampler.py:98-148): start at random centroids, 100 MCMC steps x 15
  leapfrog steps at eps=0.03, tempering beta_k = ((1-1/sqrt(b0))(k/K)^2)
  + 1/sqrt(b0) carried ACROSS MCMC steps, Metropolis accept with masked mixing;
- the custom sampler variants (reference: src/models/samplers/hmc_sampler.py):
  random-normal starts (:117), posterior-tempered HMC (:167-214, including its
  ``z - eps * rho`` position-update quirk), and the 3-step gradient
  refinement used during training (:216-257).

The whole chain is ONE compiled program: the per-step log-density and
analytic gradient come from the fused Pallas kernel on TPU
(rlvae_tpu.ops.metric_kernels.hmc_terms_pallas) or the XLA path elsewhere,
and Metropolis acceptance is a ``jnp.where`` mask — there is no host round
trip anywhere in the 1500-step chain.
"""

from __future__ import annotations



from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.geometry.metric import CentroidMetric

Array = jax.Array


@struct.dataclass
class HMCConfig:
    mcmc_steps: int = struct.field(pytree_node=False, default=100)
    n_lf: int = struct.field(pytree_node=False, default=15)
    eps_lf: float = struct.field(pytree_node=False, default=0.03)
    beta_zero: float = struct.field(pytree_node=False, default=1.0)
    init: str = struct.field(pytree_node=False, default="centroids")  # or "randn"
    backend: str = struct.field(pytree_node=False, default="auto")  # auto|pallas|xla


def _terms_fn(metric: CentroidMetric, backend: str):
    """(log pi, grad log pi) evaluator for the chain."""
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from rlvae_tpu.ops.metric_kernels import hmc_terms_pallas

        return lambda z: hmc_terms_pallas(metric, z)

    def xla_terms(z):
        return gm.log_sqrt_det_g_inv(metric, z), gm.grad_log_sqrt_det_g_inv(metric, z)

    return xla_terms


def tempering(k: Array, big_k: int, beta_zero_sqrt: Array) -> Array:
    """1/beta_k with beta_k = ((1 - 1/sqrt(b0)) (k/K)^2) + 1/sqrt(b0)
    (reference: pythae rhvae_sampler.py:152-155)."""
    beta_k = (1.0 - 1.0 / beta_zero_sqrt) * (k / big_k) ** 2 + 1.0 / beta_zero_sqrt
    return 1.0 / beta_k


def draw_chain_noise(k_chain: Array, steps: int, num_samples: int, d: int):
    """All of the chain's randomness, pre-drawn: per-step momenta
    ``gammas [S, B, D]`` and acceptance uniforms ``unifs [S, B]``.

    The key derivation (split the chain key into S step keys, then each step
    key into momentum/accept keys) is EXACTLY the in-scan derivation the
    chain previously used, so values are bit-identical — factoring the draws
    out lets the same integrator run inside ``shard_map`` with the noise
    batch-sharded (parallel/metric_parallel.sample_prior_hmc_sharded)."""
    keys = jax.random.split(k_chain, steps)

    def one(k):
        k_mom, k_acc = jax.random.split(k)
        return (
            jax.random.normal(k_mom, (num_samples, d)),
            jax.random.uniform(k_acc, (num_samples,)),
        )

    return jax.vmap(one)(keys)


def run_prior_chain(
    terms,
    z0: Array,
    gammas: Array,
    unifs: Array,
    config: HMCConfig,
    mean_fn=jnp.mean,
    collect_states: bool = False,
):
    """The prior-chain integrator on pre-drawn noise: returns
    ``(z, accept_rate, log_pi_final)``.

    ``terms(z) -> (log pi, grad log pi)`` is pluggable (dense, fused Pallas,
    or the centroid-sharded psum evaluator); ``mean_fn`` reduces the per-step
    accept mask to a rate (the sharded runner passes a pmean-composed
    reduction so the diagnostic is the global rate).  ``collect_states``
    additionally returns the post-step state at every MCMC step
    (``zs [S, B, D]``, for ESS measurement — scripts/bench_adaptive_hmc.py);
    the chain itself is bit-identical either way."""
    beta_zero_sqrt = jnp.sqrt(jnp.asarray(config.beta_zero, jnp.float32))
    eps_lf = jnp.asarray(config.eps_lf, jnp.float32)

    # The gradient at the end of one leapfrog step equals the gradient at the
    # start of the next (same z), so it is carried instead of recomputed —
    # numerically identical to the reference's double evaluation
    # (pythae rhvae_sampler.py:113-128) at half the kernel invocations.
    def leapfrog_step(carry, k):
        z, rho, g, beta_sqrt_old = carry
        rho_half = rho - (eps_lf / 2.0) * g
        z = z + eps_lf * rho_half
        _, grad = terms(z)
        g = -grad
        rho_full = rho_half - (eps_lf / 2.0) * g
        beta_sqrt = tempering(k + 1.0, config.n_lf, beta_zero_sqrt)
        rho = (beta_sqrt_old / beta_sqrt) * rho_full
        return (z, rho, g, beta_sqrt), None

    def mcmc_step(carry, noise):
        z0_s, logpi0_s, g0_s, beta_sqrt_old = carry
        gamma, accept_u = noise
        rho = gamma / beta_zero_sqrt
        h0 = -logpi0_s + 0.5 * jnp.sum(rho**2, axis=1)

        (z, rho, g, beta_sqrt_old), _ = jax.lax.scan(
            leapfrog_step,
            (z0_s, rho, g0_s, beta_sqrt_old),
            jnp.arange(config.n_lf, dtype=jnp.float32),
        )

        logpi, _ = terms(z)
        h = -logpi + 0.5 * jnp.sum(rho**2, axis=1)
        if config.init == "centroids":
            # official pythae form, unguarded (rhvae_sampler.py:140-141)
            alpha = jnp.exp(-h) / jnp.exp(-h0)
        else:
            # custom-sampler form (hmc_sampler.py:155-158): the +1e-10 guard
            # matters when exp(-h0) underflows (h0 > ~88): the reference
            # then accepts (alpha clamps to 1) where the unguarded form
            # gives nan -> permanent rejection
            alpha = jnp.clip(jnp.exp(-h) / (jnp.exp(-h0) + 1e-10), 0.0, 1.0)
        accept = accept_u < alpha
        mask = accept[:, None]
        z_new = jnp.where(mask, z, z0_s)
        logpi_new = jnp.where(accept, logpi, logpi0_s)
        g_new = jnp.where(mask, g, g0_s)
        rate = mean_fn(accept.astype(jnp.float32))
        out = (rate, z_new) if collect_states else rate
        return (z_new, logpi_new, g_new, beta_sqrt_old), out

    logpi0, grad0 = terms(z0)
    (z, logpi_final, _, _), ys = jax.lax.scan(
        mcmc_step, (z0, logpi0, -grad0, beta_zero_sqrt), (gammas, unifs)
    )
    if collect_states:
        accept_rates, zs = ys
        return z, jnp.mean(accept_rates), logpi_final, zs
    return z, jnp.mean(ys), logpi_final


def sample_prior_hmc(
    metric: CentroidMetric,
    key: Array,
    num_samples: int,
    config: HMCConfig = HMCConfig(),
    return_diagnostics: bool = False,
    z0: Optional[Array] = None,
) -> Array:
    """HMC chain targeting pi(z) ~ sqrt(det G^{-1}(z)).

    ``z0`` gives explicit per-chain starting positions [num_samples, D]
    (overriding ``config.init``) — e.g. posterior means, the
    geometric-perspective ``hmc_sampling(model, mu, ...)`` convention the
    GUGUS family uses.  With ``return_diagnostics`` also returns
    {"accept_rate": mean accept prob over the run, "log_pi": final
    per-chain log sqrt det G^{-1}} — the chain statistics the
    generation-parity artifact compares against the torch sampler (pythae
    rhvae_sampler.py:98-148)."""
    terms = _terms_fn(metric, config.backend)
    d = metric.latent_dim

    k_init, k_chain = jax.random.split(key)
    if z0 is not None:
        z0 = jnp.asarray(z0, jnp.float32)
    elif config.init == "centroids":
        idx = jax.random.randint(k_init, (num_samples,), 0, metric.n_centroids)
        z0 = metric.centroids[idx]
    else:
        z0 = jax.random.normal(k_init, (num_samples, d))

    gammas, unifs = draw_chain_noise(k_chain, config.mcmc_steps, num_samples, d)
    z, accept_rate, logpi_final = run_prior_chain(terms, z0, gammas, unifs, config)
    if return_diagnostics:
        return z, {"accept_rate": accept_rate, "log_pi": logpi_final}
    return z


def run_adaptive_prior_chain(
    terms,
    z0: Array,
    gammas: Array,
    unifs: Array,
    config: HMCConfig,
    target_accept: float = 0.65,
    warmup: int = 50,
    per_chain: bool = True,
):
    """Prior chain with dual-averaging step-size adaptation (beyond-reference:
    the pythae chain runs a FIXED eps=0.03 and accepts ~4.7% of proposals on
    the real metric — 95% of its leapfrog work is wasted; reference:
    pythae rhvae_sampler_config.py:24-27, outputs/generation_parity/).

    Nesterov dual averaging on log(eps) targeting ``target_accept`` (the
    NUTS adaptation scheme, Hoffman & Gelman 2014 §3.2: gamma=0.05, t0=10,
    kappa=0.75): the first ``warmup`` MCMC steps adapt, the remainder run at
    the averaged frozen step size.  ``per_chain=True`` adapts an independent
    eps per chain from that chain's own acceptance statistic — chains
    started in differently-conditioned metric regions equilibrate to
    different step sizes (a capability batched samplers usually forgo; free
    here, the carry is just [B] instead of scalar).

    No tempering: adaptation replaces it (the chain is a plain HMC kernel,
    exactly the ``beta_zero=1`` degenerate case of the reference's scheme
    where tempering is the identity).

    Returns ``(zs [S, B, D] — the post-step state at every MCMC step,
    diagnostics)``; slice ``zs[warmup:]`` for post-warmup draws (ESS,
    generation)."""
    eps0 = jnp.asarray(config.eps_lf, jnp.float32)
    n_chains = z0.shape[0]
    stat_shape = (n_chains,) if per_chain else ()
    mu_da = jnp.log(10.0 * eps0)
    gamma_da, t0_da, kappa_da = 0.05, 10.0, 0.75

    def leapfrog_step(carry, _):
        z, rho, g, eps = carry
        rho_half = rho - (eps / 2.0) * g
        z = z + eps * rho_half
        _, grad = terms(z)
        g = -grad
        rho = rho_half - (eps / 2.0) * g
        return (z, rho, g, eps), None

    def mcmc_step(carry, noise):
        z0_s, logpi0_s, g0_s, x, x_bar, h_bar = carry
        gamma, accept_u, t = noise
        eps = jnp.exp(jnp.where(t < warmup, x, x_bar))
        eps_col = eps[:, None] if per_chain else eps
        rho = gamma
        h0 = -logpi0_s + 0.5 * jnp.sum(rho**2, axis=1)

        (z, rho, g, _), _ = jax.lax.scan(
            leapfrog_step, (z0_s, rho, g0_s, eps_col), None, length=config.n_lf
        )

        logpi, _ = terms(z)
        h = -logpi + 0.5 * jnp.sum(rho**2, axis=1)
        # acceptance PROBABILITY (not just the binary outcome) drives the
        # adaptation; nan energies (diverged trajectories) count as 0
        alpha = jnp.exp(jnp.minimum(h0 - h, 0.0))
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
        accept = accept_u < alpha
        mask = accept[:, None]
        z_new = jnp.where(mask, z, z0_s)
        logpi_new = jnp.where(accept, logpi, logpi0_s)
        g_new = jnp.where(mask, g, g0_s)

        # dual averaging (frozen after warmup)
        stat = alpha if per_chain else jnp.mean(alpha)
        t1 = t + 1.0
        h_bar_new = (1.0 - 1.0 / (t1 + t0_da)) * h_bar + (
            target_accept - stat
        ) / (t1 + t0_da)
        x_new = mu_da - jnp.sqrt(t1) / gamma_da * h_bar_new
        eta = t1**-kappa_da
        x_bar_new = eta * x_new + (1.0 - eta) * x_bar
        adapting = t < warmup
        x = jnp.where(adapting, x_new, x)
        x_bar = jnp.where(adapting, x_bar_new, x_bar)
        h_bar = jnp.where(adapting, h_bar_new, h_bar)
        return (z_new, logpi_new, g_new, x, x_bar, h_bar), (
            z_new,
            jnp.mean(accept.astype(jnp.float32)),
            jnp.mean(alpha),
        )

    logpi0, grad0 = terms(z0)
    steps = jnp.arange(gammas.shape[0], dtype=jnp.float32)
    init = (
        z0,
        logpi0,
        -grad0,
        jnp.full(stat_shape, jnp.log(eps0)),
        jnp.full(stat_shape, jnp.log(eps0)),
        jnp.zeros(stat_shape),
    )
    (z, logpi_final, _, _, x_bar, _), (zs, accept_rates, alphas) = jax.lax.scan(
        mcmc_step, init, (gammas, unifs, steps)
    )
    diagnostics = {
        "accept_rate": jnp.mean(accept_rates[warmup:]),
        "accept_prob_mean": jnp.mean(alphas[warmup:]),
        "eps_final": jnp.exp(x_bar),
        "log_pi": logpi_final,
    }
    return zs, diagnostics


def sample_prior_hmc_adaptive(
    metric: CentroidMetric,
    key: Array,
    num_samples: int,
    config: HMCConfig = HMCConfig(),
    target_accept: float = 0.65,
    warmup: Optional[int] = None,
    per_chain: bool = True,
    return_chain: bool = False,
    z0: Optional[Array] = None,
):
    """Adaptive-HMC prior sampling (``method="adaptive"``) — same target
    pi(z) ~ sqrt(det G^{-1}(z)) as :func:`sample_prior_hmc`, with the step
    size tuned by dual averaging instead of the reference's fixed eps=0.03.
    The parity-exact official chain is untouched.

    Returns final samples [num_samples, D]; with ``return_chain`` returns
    ``(zs [S, B, D], diagnostics)`` for ESS measurement
    (scripts/bench_adaptive_hmc.py)."""
    terms = _terms_fn(metric, config.backend)
    d = metric.latent_dim
    if warmup is None:
        warmup = config.mcmc_steps // 2

    k_init, k_chain = jax.random.split(key)
    if z0 is not None:
        z0 = jnp.asarray(z0, jnp.float32)
    elif config.init == "centroids":
        idx = jax.random.randint(k_init, (num_samples,), 0, metric.n_centroids)
        z0 = metric.centroids[idx]
    else:
        z0 = jax.random.normal(k_init, (num_samples, d))

    gammas, unifs = draw_chain_noise(k_chain, config.mcmc_steps, num_samples, d)
    zs, diagnostics = run_adaptive_prior_chain(
        terms, z0, gammas, unifs, config,
        target_accept=target_accept, warmup=warmup, per_chain=per_chain,
    )
    if return_chain:
        return zs, diagnostics
    return zs[-1]


def sample_posterior_hmc(
    metric: CentroidMetric,
    key: Array,
    mu: Array,
    log_var: Array,
    n_steps: int = 20,
    n_lf: int = 5,
    eps_lf: float = 0.01,
    backend: str = "auto",
) -> Array:
    """Posterior-tempered HMC (reference: hmc_sampler.py:167-214).

    Energy = -log pi(z) + 0.5 sum((z-mu)^2 exp(-log_var)); the gradient is
    assembled analytically (the fused kernel's grad log pi plus the
    closed-form Gaussian term — identical to autodiffing the energy, but
    valid on the Pallas backend, which has no VJP); the reference's
    position update subtracts eps*rho — kept verbatim for parity.
    """
    terms = _terms_fn(metric, backend)

    def grad_e(z):
        # analytic energy gradient: terms() already returns grad log pi (the
        # Pallas kernel has no VJP, so autodiff through it would fail at
        # trace time on TPU); the Gaussian posterior term is closed-form
        _, grad_logpi = terms(z)
        return -grad_logpi + (z - mu) * jnp.exp(-log_var)

    k_init, k_chain = jax.random.split(key)
    eps0 = jax.random.normal(k_init, mu.shape)
    z = mu + eps0 * jnp.exp(0.5 * log_var)

    def lf(z_rho, _):
        z, rho = z_rho
        g = grad_e(z)
        rho = rho - (eps_lf / 2.0) * g
        z = z - eps_lf * rho  # reference quirk: minus
        g = grad_e(z)
        rho = rho - (eps_lf / 2.0) * g
        return (z, rho), None

    def step(z, k):
        gamma = jax.random.normal(k, z.shape)
        rho = gamma * 0.1
        (z, _), _ = jax.lax.scan(lf, (z, rho), None, length=n_lf)
        return z, None

    z, _ = jax.lax.scan(step, z, jax.random.split(k_chain, n_steps))
    return z


def refine_for_training(
    metric: CentroidMetric,
    key: Array,
    mu: Array,
    log_var: Array,
    n_steps: int = 3,
    step_size: float = 0.01,
    backend: str = "auto",
) -> Array:
    """HMC-style training refinement (reference: hmc_sampler.py:216-257):
    z = mu + eps*sigma, then n small steps z += step * (-grad log pi)."""
    terms = _terms_fn(metric, backend)
    eps = jax.random.normal(key, mu.shape)
    z = mu + eps * jnp.exp(0.5 * log_var)

    def body(_, z):
        _, grad = terms(z)
        return z + step_size * (-grad)

    return jax.lax.fori_loop(0, n_steps, body, z)
