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
import numpy as np
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
    from rlvae_tpu.ops.metric_kernels import fused_supported, hmc_terms_pallas

    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
        and fused_supported(metric)  # large-K/D metrics -> XLA (VMEM budget)
    )
    if use_pallas:
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
    eps_init=None,
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
    # eps_init: optional warm-start step size(s) — scalar or per-chain [B]
    # (a re-tuning stage at a new trajectory length starts from the previous
    # stage's tuned eps; the dual-averaging shrinkage anchor mu follows it)
    eps0 = jnp.asarray(config.eps_lf if eps_init is None else eps_init,
                       jnp.float32)
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
        jnp.broadcast_to(jnp.log(eps0), stat_shape),
        jnp.broadcast_to(jnp.log(eps0), stat_shape),
        jnp.zeros(stat_shape),
    )
    (z, logpi_final, _, _, x_bar, _), (zs, accept_rates, alphas) = jax.lax.scan(
        mcmc_step, init, (gammas, unifs, steps)
    )
    # an all-warmup run (warmup == mcmc_steps, how the calibration phases
    # use this) has no post-warmup slice — report the tail half instead of
    # a NaN mean-of-empty
    cut = warmup if warmup < gammas.shape[0] else gammas.shape[0] // 2
    diagnostics = {
        "accept_rate": jnp.mean(accept_rates[cut:]),
        "accept_prob_mean": jnp.mean(alphas[cut:]),
        "eps_final": jnp.exp(x_bar),
        "log_pi": logpi_final,
    }
    return zs, diagnostics


def run_hmc_chain_fixed(
    terms,
    z0: Array,
    gammas: Array,
    unifs: Array,
    eps: Array,
    n_lf: int,
    jitters: Optional[Array] = None,
):
    """Plain (untempered) HMC at FIXED per-chain step sizes — the sampling
    phase of the budgeted adaptive sampler (:func:`
    sample_prior_hmc_adaptive_budget`).  ``eps`` is [B] (one tuned step size
    per chain, from the dual-averaging warmup); ``jitters`` [S, B] optionally
    scales each step's eps (Neal 2011 §4.2: jittering the step size breaks
    the periodic orbits an exactly-constant trajectory length can lock into).

    Returns ``(zs [S, B, D], accept_rate, log_pi_final)``."""
    eps = jnp.asarray(eps, jnp.float32)

    def leapfrog_step(carry, _):
        z, rho, g, e = carry
        rho_half = rho - (e / 2.0) * g
        z = z + e * rho_half
        _, grad = terms(z)
        g = -grad
        rho = rho_half - (e / 2.0) * g
        return (z, rho, g, e), None

    def mcmc_step(carry, noise):
        z0_s, logpi0_s, g0_s = carry
        gamma, accept_u, jit_s = noise
        e_col = (eps * jit_s)[:, None]
        rho = gamma
        h0 = -logpi0_s + 0.5 * jnp.sum(rho**2, axis=1)
        (z, rho, g, _), _ = jax.lax.scan(
            leapfrog_step, (z0_s, rho, g0_s, e_col), None, length=n_lf
        )
        logpi, _ = terms(z)
        h = -logpi + 0.5 * jnp.sum(rho**2, axis=1)
        alpha = jnp.exp(jnp.minimum(h0 - h, 0.0))
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
        accept = accept_u < alpha
        mask = accept[:, None]
        z_new = jnp.where(mask, z, z0_s)
        logpi_new = jnp.where(accept, logpi, logpi0_s)
        g_new = jnp.where(mask, g, g0_s)
        return (z_new, logpi_new, g_new), (
            z_new, jnp.mean(accept.astype(jnp.float32))
        )

    if jitters is None:
        jitters = jnp.ones(gammas.shape[:2], jnp.float32)
    logpi0, grad0 = terms(z0)
    (z, logpi_final, _), (zs, rates) = jax.lax.scan(
        mcmc_step, (z0, logpi0, -grad0), (gammas, unifs, jitters)
    )
    return zs, jnp.mean(rates), logpi_final


# The budgeted adaptive sampler's plan constants — shared with the artifact
# benchmark (scripts/bench_adaptive_hmc.py), which re-orchestrates the same
# three phases under script-level jit for honest wall-clock measurement.
ADAPTIVE_WARMUP_A = 40        # phase-A steps (rough eps, short trajectories)
ADAPTIVE_NLF_A = 5            # phase-A trajectory length
ADAPTIVE_TARGET_A = 0.75      # phase-A dual-averaging target
ADAPTIVE_TARGET = 0.65        # phase-B/C acceptance target
ADAPTIVE_EPS_JITTER = 0.2     # phase-C step-size jitter (Neal 2011 4.2)


def adaptive_warmup_b_steps(warmup_a: int) -> int:
    """Phase-B (re-tune at the sampling n_lf) step count."""
    return max(8, warmup_a // 3)


def sample_prior_hmc_adaptive_budget(
    metric: CentroidMetric,
    key: Array,
    num_samples: int,
    config: HMCConfig = HMCConfig(),
    budget_lf: Optional[int] = None,
    path_length: Optional[float] = None,
    warmup: int = ADAPTIVE_WARMUP_A,
    n_lf_warmup: int = ADAPTIVE_NLF_A,
    warmup_target_accept: float = ADAPTIVE_TARGET_A,
    n_lf_max: int = 128,
    eps_jitter: float = ADAPTIVE_EPS_JITTER,
    z0: Optional[Array] = None,
    return_chain: bool = False,
):
    """Budgeted two-phase adaptive prior sampler: dual-averaging warmup at
    SHORT trajectories, then a path-length-preserving sampling phase at the
    tuned step size — all within a fixed total leapfrog budget.

    The single-phase :func:`sample_prior_hmc_adaptive` keeps the reference's
    n_lf=15 while eps tunes down ~4-8x on the real metric, silently
    shrinking the trajectory length lambda = n_lf * eps from 0.45 to ~0.1 —
    each step then explores far less than the official chain's (rare but
    long) accepted moves, and measured ESS/budget LOSES to the mis-tuned
    reference chain (the first outputs/adaptive_hmc/ run: ratio 0.28).  The
    fix is the standard one (Hoffman & Gelman 2014 §3.2 end: "eps*L = lambda
    fixed"): after warmup picks eps, the sampling phase runs
    ``n_lf = round(lambda / median(eps))`` so trajectories keep the
    reference's path length lambda = 15 * 0.03 = 0.45 while accepting ~65%
    instead of ~4.7%.

    Budget accounting (``budget_lf``, default ``config.mcmc_steps *
    config.n_lf`` = the official chain's per-chain leapfrog count): warmup
    spends ``warmup * n_lf_warmup`` integrations (short trajectories — eps
    adaptation only needs the acceptance statistic, not exploration), the
    sampling phase gets the remainder.  The n_lf choice is a host-side
    decision between two jitted scans (one scalar median fetch) — n_lf must
    be static under jit.

    Returns final draws [num_samples, D]; with ``return_chain``, returns
    ``(zs [steps_sampling, B, D] — ALL post-warmup, diagnostics)``."""
    terms = _terms_fn(metric, config.backend)
    d = metric.latent_dim
    budget = int(budget_lf if budget_lf is not None
                 else config.mcmc_steps * config.n_lf)
    lam = float(path_length if path_length is not None
                else config.n_lf * config.eps_lf)

    k_init, k_w, k_s, k_j = jax.random.split(key, 4)
    if z0 is not None:
        z0 = jnp.asarray(z0, jnp.float32)
    elif config.init == "centroids":
        idx = jax.random.randint(k_init, (num_samples,), 0, metric.n_centroids)
        z0 = metric.centroids[idx]
    else:
        z0 = jax.random.normal(k_init, (num_samples, d))

    k_w2 = jax.random.fold_in(k_w, 1)

    # phase A: rough per-chain eps at short trajectories (cheap statistics;
    # only exists to pick the sampling n_lf — the eps it finds is NOT usable
    # directly: on this density the tolerable eps SHRINKS with trajectory
    # length, so an eps tuned at n_lf=5 accepts <10% at n_lf~35)
    wcfg = config.replace(mcmc_steps=warmup, n_lf=n_lf_warmup)
    g_w, u_w = draw_chain_noise(k_w, warmup, num_samples, d)
    zs_w, diag_w = run_adaptive_prior_chain(
        terms, z0, g_w, u_w, wcfg,
        target_accept=warmup_target_accept, warmup=warmup, per_chain=True,
    )
    eps_a = diag_w["eps_final"]

    # host-side static-shape decision: n_lf for the sampling phase
    eps_med = float(jnp.median(eps_a))
    n_lf_s = int(np.clip(round(lam / max(eps_med, 1e-6)), 2, n_lf_max))

    # phase B: re-tune eps AT the sampling trajectory length (target 0.65),
    # warm-started from phase A's per-chain eps
    warm_b = adaptive_warmup_b_steps(warmup)
    bcfg = config.replace(mcmc_steps=warm_b, n_lf=n_lf_s)
    g_b, u_b = draw_chain_noise(k_w2, warm_b, num_samples, d)
    zs_b, diag_b = run_adaptive_prior_chain(
        terms, zs_w[-1], g_b, u_b, bcfg,
        target_accept=ADAPTIVE_TARGET, warmup=warm_b, per_chain=True,
        eps_init=eps_a,
    )
    eps = diag_b["eps_final"]

    spent_warm = warmup * n_lf_warmup + warm_b * n_lf_s
    steps_s = max(1, (budget - spent_warm) // n_lf_s)

    # phase C: fixed tuned eps, reference path length, jittered
    g_s, u_s = draw_chain_noise(k_s, steps_s, num_samples, d)
    jitters = 1.0 + eps_jitter * (
        2.0 * jax.random.uniform(k_j, (steps_s, num_samples)) - 1.0
    )
    zs, rate, logpi_final = run_hmc_chain_fixed(
        terms, zs_b[-1], g_s, u_s, eps, n_lf_s, jitters
    )
    if return_chain:
        diagnostics = {
            "accept_rate": rate,
            "eps_tuned": eps,
            "warmup_accept_rate": diag_b["accept_rate"],
            "n_lf_sampling": n_lf_s,
            "steps_sampling": steps_s,
            "leapfrog_spent": spent_warm + steps_s * n_lf_s,
            "log_pi": logpi_final,
        }
        return zs, diagnostics
    return zs[-1]


def calibrate_adaptive_plan(
    metric: CentroidMetric,
    key: Array,
    config: HMCConfig = HMCConfig(),
    path_length: Optional[float] = None,
    warmup: int = ADAPTIVE_WARMUP_A,
    n_lf_warmup: int = ADAPTIVE_NLF_A,
    n_lf_max: int = 128,
    pool_size: Optional[int] = None,
    spread_steps: int = 128,
    eps_jitter: float = ADAPTIVE_EPS_JITTER,
) -> dict:
    """One-time per-metric calibration of the adaptive prior sampler: tunes
    a PER-CENTROID step size (one warmup chain started at each of the K
    centroids — the official sampler's own start set, pythae
    rhvae_sampler.py:98) and the path-length-preserving trajectory length.

    The returned plan makes generation a single compiled program with no
    adaptation state (:func:`sample_prior_hmc_planned`): a chain started at
    centroid i runs at ``plan["eps"][i]``.  Calibration cost (two short
    adaptive scans over K chains) amortizes across every subsequent
    generation call, exactly like a compile cache.

    ``pool_size`` additionally builds a WARM START POOL: ``pool_size``
    tuned chains run ``spread_steps`` one-time steps from uniform centroid
    starts, and their final states are stored in the plan.  Tuned
    trajectories are short (the well-conditioned eps is ~25x below the
    official 0.03), so a cold chain needs ~100+ diffusive steps to reach
    the quasi-equilibrium the long gold chain defines; the pool pays that
    ONCE, making every later generation call a short continuation that
    already matches gold-chain quality (measured: pixel/encoder Fréchet
    0.71/0.50 vs the official chain's 0.62/0.49 and the gold seed-to-seed
    floor 0.42/0.21 — outputs/adaptive_hmc/).  This is a persistent-chain
    sampler state, the MCMC analogue of a compile cache.

    Returns {"eps": [K], "n_lf": int, "accept_rate": float (phase-B
    post-tune), "path_length": float, and with pool_size: "pool" [P, D],
    "pool_eps" [P]}."""
    terms = _terms_fn(metric, config.backend)
    d = metric.latent_dim
    lam = float(path_length if path_length is not None
                else config.n_lf * config.eps_lf)
    K = metric.n_centroids
    k_a, k_b = jax.random.split(key)
    z0 = metric.centroids

    acfg = config.replace(mcmc_steps=warmup, n_lf=n_lf_warmup)
    g_a, u_a = draw_chain_noise(k_a, warmup, K, d)
    zs_a, diag_a = run_adaptive_prior_chain(
        terms, z0, g_a, u_a, acfg,
        target_accept=ADAPTIVE_TARGET_A, warmup=warmup, per_chain=True,
    )
    eps_a = diag_a["eps_final"]
    eps_med = float(jnp.median(eps_a))
    n_lf = int(np.clip(round(lam / max(eps_med, 1e-6)), 2, n_lf_max))

    warm_b = adaptive_warmup_b_steps(warmup)
    bcfg = config.replace(mcmc_steps=warm_b, n_lf=n_lf)
    g_b, u_b = draw_chain_noise(k_b, warm_b, K, d)
    _, diag_b = run_adaptive_prior_chain(
        terms, zs_a[-1], g_b, u_b, bcfg,
        target_accept=ADAPTIVE_TARGET, warmup=warm_b, per_chain=True,
        eps_init=eps_a,
    )
    plan = {
        "eps": diag_b["eps_final"],
        "n_lf": n_lf,
        "accept_rate": float(diag_b["accept_rate"]),
        "path_length": lam,
        "calibration_lf": K * (warmup * n_lf_warmup + warm_b * n_lf),
        "chains": K,
    }
    if pool_size:
        k_i, k_s, k_j = jax.random.split(jax.random.fold_in(key, 2), 3)
        cidx = jax.random.randint(k_i, (pool_size,), 0, K)
        eps_p = plan["eps"][cidx]
        g_p, u_p = draw_chain_noise(k_s, spread_steps, pool_size, d)
        jit_p = 1.0 + eps_jitter * (
            2.0 * jax.random.uniform(k_j, (spread_steps, pool_size)) - 1.0)
        zs_p, _, _ = run_hmc_chain_fixed(
            terms, metric.centroids[cidx], g_p, u_p, eps_p, n_lf, jit_p)
        plan["pool"] = zs_p[-1]
        plan["pool_eps"] = eps_p
        plan["calibration_lf"] += pool_size * spread_steps * n_lf
    return plan


def sample_prior_hmc_planned(
    metric: CentroidMetric,
    key: Array,
    num_samples: int,
    plan: dict,
    steps: int = 12,
    config: HMCConfig = HMCConfig(),
    eps_jitter: float = ADAPTIVE_EPS_JITTER,
    return_chain: bool = False,
):
    """Prior sampling from a calibrated plan (:func:`calibrate_adaptive_plan`)
    — ONE compiled program, no adaptation state, no host syncs: start each
    chain at a random centroid, run ``steps`` fixed-eps HMC steps at that
    centroid's tuned step size and the plan's path-length-preserving n_lf.

    With a warm start pool in the plan (``calibrate_adaptive_plan(...,
    pool_size=...)``) chains continue from stored quasi-equilibrium states
    instead of cold centroid starts — gold-chain sample quality at ~12
    steps.  ``num_samples`` beyond the pool size reuses pool entries (with
    replacement); heavily oversubscribed pools degrade cross-chain
    independence, so size the pool to the expected generation batch.

    This is the TPU operating point: ``num_samples`` is a free axis (the
    fused terms kernel scales ~linearly to tens of thousands of chains), so
    effective-samples/sec is set by how many tuned chains fit in the wall
    budget rather than by one chain-set's mixing (the artifact benchmark
    scripts/bench_adaptive_hmc.py publishes the measured curve)."""
    terms = _terms_fn(metric, config.backend)
    d = metric.latent_dim
    k_init, k_s, k_j = jax.random.split(key, 3)
    if "pool" in plan:
        pool = jnp.asarray(plan["pool"], jnp.float32)
        if num_samples <= pool.shape[0]:
            idx = jax.random.permutation(k_init, pool.shape[0])[:num_samples]
        else:
            idx = jax.random.randint(k_init, (num_samples,), 0, pool.shape[0])
        z0 = pool[idx]
        eps = jnp.asarray(plan["pool_eps"], jnp.float32)[idx]
    else:
        idx = jax.random.randint(k_init, (num_samples,), 0, metric.n_centroids)
        z0 = metric.centroids[idx]
        eps = jnp.asarray(plan["eps"], jnp.float32)[idx]
    g_s, u_s = draw_chain_noise(k_s, steps, num_samples, d)
    jitters = 1.0 + eps_jitter * (
        2.0 * jax.random.uniform(k_j, (steps, num_samples)) - 1.0
    )
    zs, rate, logpi_final = run_hmc_chain_fixed(
        terms, z0, g_s, u_s, eps, int(plan["n_lf"]), jitters
    )
    if return_chain:
        return zs, {"accept_rate": rate, "log_pi": logpi_final}
    return zs[-1]


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
