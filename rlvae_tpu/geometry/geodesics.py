"""True Riemannian geodesics on the learned centroid metric.

The reference calls its latent space Riemannian but every "geodesic" it
draws or samples along is a straight line: the geodesic posterior/prior
samplers interpolate linearly between centroids and add metric noise
(reference: src/models/riemannian_flow_vae.py:154-230, :270-434) and the
interactive visualizations decode ``linspace`` paths (reference:
src/visualizations/interactive.py:135-175).  This module provides the real
objects those names promise — beyond-reference capability, flagged as such
in docs/COVERAGE.md:

- analytic metric derivatives (``dg_inv``) and Christoffel symbols of the
  centroid metric G(z) = [Sigma_k M_k exp(-|z-c_k|^2/T^2) + lambda I]^{-1};
- the exponential map via an RK4 integration of the geodesic ODE
  ``z'' = -Gamma(z)(z', z')`` (fixed step count: one ``lax.scan``);
- the logarithm map by damped Gauss-Newton shooting through the integrator;
- discrete geodesics between endpoint pairs by Riemannian-energy
  minimization (Adam on the interior points, fixed iteration count), the
  robust workhorse for interpolation;
- Riemannian path length, for comparing against the straight-line paths the
  reference uses.

Everything is jit-compatible (static iteration counts, no data-dependent
control flow) and built on the pure-XLA metric path (``gm._g_xla``) so it
is differentiable in both modes — the fused Pallas entry points define only
custom VJPs and sit on the training hot path instead (see
geometry/curvature.py for the same design decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.geometry.metric import CentroidMetric

Array = jax.Array

__all__ = [
    "dg_inv",
    "christoffel",
    "exp_map",
    "log_map",
    "energy_path",
    "geodesic_interpolate",
    "path_length",
]


def _g_point(metric: CentroidMetric, z: Array) -> Array:
    """G(z) at a single point z [D] -> [D, D] (XLA path: differentiable in
    forward and reverse mode)."""
    return gm._g_xla(metric, z[None, :])[0]


def _g_inv_point(metric: CentroidMetric, z: Array) -> Array:
    return gm.g_inv(metric, z[None, :])[0]


def dg_inv(metric: CentroidMetric, z: Array) -> Array:
    """Analytic derivative of the inverse metric at z [D]:
    ``out[l, i, j] = d G^{-1}_{ij} / d z_l``.

    G^{-1}(z) = Sigma_k M_k w_k(z) + lambda I with
    w_k = exp(-|z-c_k|^2/T^2), so
    d_l G^{-1} = Sigma_k M_k w_k * (-2 (z-c_k)_l / T^2) — one weighted
    contraction, no autodiff needed (and itself smoothly differentiable,
    which the Gauss-Newton shooting in :func:`log_map` relies on).
    """
    diff = z[None, :] - metric.centroids  # [K, D]
    w = gm.weights(metric, z[None, :])[0]  # [K]
    coef = (-2.0 / metric.temperature**2) * w[:, None] * diff  # [K, D] (l)
    return jnp.einsum("kl,kij->lij", coef, metric.matrices)


def christoffel(metric: CentroidMetric, z: Array) -> Array:
    """Christoffel symbols (second kind) of G at z [D] -> [D, D, D]:
    ``out[k, i, j] = Gamma^k_ij``, symmetric in (i, j).

    Uses d_l G = -G (d_l G^{-1}) G (exact, from the analytic
    :func:`dg_inv`) and Gamma^k_ij = 1/2 (G^{-1})^{kl} (d_i G_lj +
    d_j G_li - d_l G_ij).
    """
    g = _g_point(metric, z)  # [D, D]
    gi = _g_inv_point(metric, z)  # [D, D]
    dgi = dg_inv(metric, z)  # [l, i, j]
    dg = -jnp.einsum("ab,lbc,cd->lad", g, dgi, g)  # [l, i, j] = d_l G_ij
    # T1[l,i,j] = d_i G_lj ; T2[l,i,j] = d_j G_li ; T3 = d_l G_ij
    t1 = jnp.transpose(dg, (1, 0, 2))
    t2 = jnp.transpose(dg, (1, 2, 0))
    return 0.5 * jnp.einsum("kl,lij->kij", gi, t1 + t2 - dg)


def _acceleration(metric: CentroidMetric, z: Array, v: Array) -> Array:
    """Geodesic acceleration a^k = -Gamma^k_ij v^i v^j at a point."""
    gam = christoffel(metric, z)
    return -jnp.einsum("kij,i,j->k", gam, v, v)


def exp_map(
    metric: CentroidMetric,
    z0: Array,
    v: Array,
    t: float = 1.0,
    n_steps: int = 32,
    return_path: bool = False,
):
    """Riemannian exponential map: integrate the geodesic ODE from ``z0``
    with initial velocity ``v`` for time ``t`` (RK4, ``n_steps`` fixed
    steps).  Returns the endpoint [D], or (endpoint, path [n_steps+1, D])
    with ``return_path``.  Batched inputs [B, D] are vmapped."""
    z0 = jnp.asarray(z0, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    if z0.ndim == 2:
        f = lambda zz, vv: exp_map(metric, zz, vv, t, n_steps, return_path)
        return jax.vmap(f)(z0, v)

    h = jnp.float32(t / n_steps)

    def rhs(state):
        z, vel = state
        return vel, _acceleration(metric, z, vel)

    def rk4(state, _):
        z, vel = state
        k1z, k1v = rhs((z, vel))
        k2z, k2v = rhs((z + 0.5 * h * k1z, vel + 0.5 * h * k1v))
        k3z, k3v = rhs((z + 0.5 * h * k2z, vel + 0.5 * h * k2v))
        k4z, k4v = rhs((z + h * k3z, vel + h * k3v))
        z = z + (h / 6.0) * (k1z + 2 * k2z + 2 * k3z + k4z)
        vel = vel + (h / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v)
        return (z, vel), z

    (z_end, _), zs = jax.lax.scan(rk4, (z0, v), None, length=n_steps)
    if return_path:
        return z_end, jnp.concatenate([z0[None], zs], axis=0)
    return z_end


def log_map(
    metric: CentroidMetric,
    z0: Array,
    z1: Array,
    n_steps: int = 16,
    n_iters: int = 12,
    damping: float = 1e-3,
    init: str = "energy",
) -> Array:
    """Riemannian logarithm: the initial velocity v with
    ``exp_map(z0, v) = z1``, by damped Gauss-Newton shooting (fixed
    ``n_iters``; each iteration differentiates the integrator with
    ``jacfwd``, cheap at D=16).  Batched [B, D] inputs are vmapped.

    Shooting is a local method — ``init`` controls where it starts:
    ``"energy"`` (default) seeds the velocity from a discrete energy-
    minimized path's initial tangent, which keeps distant endpoint pairs
    in the convergence basin under strongly curved metrics; ``"linear"``
    is the flat-space displacement z1 - z0.  Between Gauss-Newton steps
    the candidate is kept only when it reduces the shooting residual, so
    a diverging step can never make the returned velocity worse than its
    init."""
    z0 = jnp.asarray(z0, jnp.float32)
    z1 = jnp.asarray(z1, jnp.float32)
    if z0.ndim == 2:
        f = lambda a, b: log_map(metric, a, b, n_steps, n_iters, damping, init)
        return jax.vmap(f)(z0, z1)

    d = z0.shape[-1]
    shoot = lambda v: exp_map(metric, z0, v, n_steps=n_steps)

    def gn_step(carry, _):
        v, err = carry
        resid = shoot(v) - z1
        jac = jax.jacfwd(shoot)(v)  # [D, D]
        a = jac.T @ jac + damping * jnp.eye(d, dtype=jnp.float32)
        dv = jnp.linalg.solve(a, jac.T @ resid)
        v_new = v - dv
        err_new = jnp.sum((shoot(v_new) - z1) ** 2)
        better = err_new < err
        return (jnp.where(better, v_new, v), jnp.where(better, err_new, err)), None

    if init == "energy":
        # the discrete geodesic's first segment, scaled to unit-time speed
        path = energy_path(metric, z0, z1, n_points=n_steps + 1, n_iters=120)
        v0 = (path[1] - path[0]) * jnp.float32(n_steps)
    else:
        v0 = z1 - z0  # exact for a flat metric
    (v, _), _ = jax.lax.scan(
        gn_step, (v0, jnp.sum((shoot(v0) - z1) ** 2)), None, length=n_iters
    )
    return v


def _segment_energy(metric: CentroidMetric, path: Array) -> Array:
    """Discrete Riemannian energy of a path [T, D]:
    E = (T-1) * Sigma_i  d_i^T G(mid_i) d_i  (midpoint rule — the same
    local quadratic form the reference's MetricTensor distance uses,
    reference: src/models/components/metric_tensor.py:184-207)."""
    deltas = path[1:] - path[:-1]  # [T-1, D]
    mids = 0.5 * (path[1:] + path[:-1])
    g_mid = gm._g_xla(metric, mids)  # [T-1, D, D]
    quad = jnp.einsum("ti,tij,tj->t", deltas, g_mid, deltas)
    return (path.shape[0] - 1) * jnp.sum(quad)


def path_length(metric: CentroidMetric, path: Array) -> Array:
    """Riemannian length of a discrete path [T, D] (batched [B, T, D] ok):
    Sigma_i sqrt(d_i^T G(mid_i) d_i)."""
    path = jnp.asarray(path, jnp.float32)
    if path.ndim == 3:
        return jax.vmap(lambda p: path_length(metric, p))(path)
    deltas = path[1:] - path[:-1]
    mids = 0.5 * (path[1:] + path[:-1])
    g_mid = gm._g_xla(metric, mids)
    quad = jnp.einsum("ti,tij,tj->t", deltas, g_mid, deltas)
    return jnp.sum(jnp.sqrt(jnp.maximum(quad, 0.0)))


def energy_path(
    metric: CentroidMetric,
    z0: Array,
    z1: Array,
    n_points: int = 16,
    n_iters: int = 200,
    lr: float = 0.05,
) -> Array:
    """Discrete geodesic between ``z0`` and ``z1`` [D] (batched [B, D] ok):
    minimize the discrete Riemannian energy over the interior points (Adam,
    fixed ``n_iters``, linear-path init).  Returns the path [n_points, D]
    including both endpoints.  Minimizing energy (not length) also yields
    the constant-speed parametrization."""
    import optax

    z0 = jnp.asarray(z0, jnp.float32)
    z1 = jnp.asarray(z1, jnp.float32)
    if z0.ndim == 2:
        f = lambda a, b: energy_path(metric, a, b, n_points, n_iters, lr)
        return jax.vmap(f)(z0, z1)

    ts = jnp.linspace(0.0, 1.0, n_points)[1:-1, None]
    interior0 = (1.0 - ts) * z0[None] + ts * z1[None]  # [n_points-2, D]

    def assemble(interior):
        return jnp.concatenate([z0[None], interior, z1[None]], axis=0)

    loss = lambda interior: _segment_energy(metric, assemble(interior))
    opt = optax.adam(lr)

    def step(carry, _):
        interior, opt_state = carry
        grads = jax.grad(loss)(interior)
        updates, opt_state = opt.update(grads, opt_state, interior)
        return (optax.apply_updates(interior, updates), opt_state), None

    (interior, _), _ = jax.lax.scan(
        step, (interior0, opt.init(interior0)), None, length=n_iters
    )
    return assemble(interior)


def geodesic_interpolate(
    metric: CentroidMetric,
    z0: Array,
    z1: Array,
    n_points: int = 10,
    method: str = "energy",
    **kwargs,
) -> Array:
    """Geodesic path between latents [n_points, D] (endpoints included).

    method: 'energy' (discrete energy minimization — robust default),
    'shooting' (log_map then exp_map — the smooth ODE solution), or
    'linear' (the reference's straight line, for comparison)."""
    z0 = jnp.asarray(z0, jnp.float32)
    z1 = jnp.asarray(z1, jnp.float32)
    if method == "linear":
        ts = jnp.linspace(0.0, 1.0, n_points)[:, None]
        return (1.0 - ts) * z0[None] + ts * z1[None]
    if method == "energy":
        return energy_path(metric, z0, z1, n_points=n_points, **kwargs)
    if method == "shooting":
        v = log_map(metric, z0, z1, **kwargs)
        # replay AT LEAST as finely as the discretization log_map fit the
        # velocity under (its n_steps default, 16) — a coarser replay would
        # drift from z1 by the integration-error gap — and at a multiple of
        # n_points-1 so exactly n_points samples (endpoints included) fall
        # on integrator knots
        fit_steps = int(kwargs.get("n_steps", 16))
        seg = max(1, n_points - 1)
        k = max(1, -(-fit_steps // seg))  # ceil(fit_steps / seg)
        _, path = exp_map(metric, z0, v, n_steps=k * seg, return_path=True)
        return path[::k]
    raise ValueError(f"unknown geodesic method {method!r}")
