"""Curvature analysis of the latent Riemannian manifold.

The reference approximates curvature with finite-difference metric
derivatives in its legacy visualization monolith (reference:
src/training/train_cyclic_loop_comparison.py:3416-3591, gated by the
``disable_curvature`` visualization flag).  Here the curvature is *exact*:
the induced 2-D metric on a PCA plane is differentiated with nested
``jax.jacfwd`` and the Gaussian curvature comes from the Brioschi formula.

For a plane z(u) = origin + basis @ u (basis [D, 2]), the induced metric is
g~(u) = basis^T G(z(u)) basis, and

    K = ( |E F; F G| -term combination of first/second derivatives ) / det^2

computed via the standard Brioschi expression with E, F, G = g~_11, g~_12,
g~_22.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlvae_tpu.geometry import metric as gm
from rlvae_tpu.geometry.metric import CentroidMetric

Array = jax.Array


def induced_metric_2d(metric: CentroidMetric, basis: Array, origin: Array):
    """g~(u) for u in R^2 on the plane origin + basis @ u."""

    def g_tilde(u):
        z = origin + basis @ u
        # the XLA path explicitly: this sits under jacfwd, and the fused
        # Pallas entry points define only a custom VJP (no jvp rule)
        g_full = gm._g_xla(metric, z[None, :])[0]
        return basis.T @ g_full @ basis  # [2, 2]

    return g_tilde


def gaussian_curvature_2d(
    metric: CentroidMetric, basis: Array, origin: Array, points2d: Array
) -> Array:
    """Exact Gaussian curvature of the induced 2-D metric at points2d [N, 2].

    Brioschi formula in terms of E, F, G and their first/second partials.
    """
    g_tilde = induced_metric_2d(metric, basis, origin)
    d_g = jax.jacfwd(g_tilde)  # [2,2,2]: d g~_ij / d u_k
    dd_g = jax.jacfwd(d_g)  # [2,2,2,2]

    def k_at(u):
        g = g_tilde(u)
        dg = d_g(u)
        ddg = dd_g(u)
        e, f, gg = g[0, 0], g[0, 1], g[1, 1]
        e_u, e_v = dg[0, 0, 0], dg[0, 0, 1]
        f_u, f_v = dg[0, 1, 0], dg[0, 1, 1]
        g_u, g_v = dg[1, 1, 0], dg[1, 1, 1]
        e_vv = ddg[0, 0, 1, 1]
        f_uv = ddg[0, 1, 0, 1]
        g_uu = ddg[1, 1, 0, 0]
        m1 = jnp.array(
            [
                [-0.5 * e_vv + f_uv - 0.5 * g_uu, 0.5 * e_u, f_u - 0.5 * e_v],
                [f_v - 0.5 * g_u, e, f],
                [0.5 * g_v, f, gg],
            ]
        )
        m2 = jnp.array(
            [
                [0.0, 0.5 * e_v, 0.5 * g_u],
                [0.5 * e_v, e, f],
                [0.5 * g_u, f, gg],
            ]
        )
        det_g = e * gg - f * f
        return (jnp.linalg.det(m1) - jnp.linalg.det(m2)) / (det_g**2 + 1e-12)

    return jax.vmap(k_at)(points2d.astype(jnp.float32))
