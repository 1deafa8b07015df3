"""Batched small-matrix linear algebra, unrolled for the TPU VPU.

The framework's hot loops factor, invert, and take log-determinants of
*small* SPD matrices (latent_dim x latent_dim, D=16 by default) across large
batches (reference: src/models/components/metric_tensor.py:139-182 uses
``torch.linalg.inv``/``slogdet``; the samplers use ``torch.linalg.cholesky``).

XLA lowers ``jnp.linalg.cholesky`` on TPU through a general blocked routine
tuned for large matrices; for D<=32 a fully unrolled Cholesky-Banachiewicz
over the batch dimension is much faster — every step is a [B]-vector VPU op
and the whole factorization fuses into one kernel.  These routines are plain
``jnp`` so they also compose into Pallas kernel bodies.

All functions treat the last two dims as the matrix and broadcast over any
leading batch dims.  D must be static (it always is: it's the latent dim).
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this size the unrolled code bloats the program; fall back to XLA.
_MAX_UNROLL_DIM = 64


def cholesky_small(a: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower-triangular L with L L^T = a (+ jitter*I), unrolled over columns.

    ``a`` must be SPD; only the lower triangle is read.
    """
    d = a.shape[-1]
    if d > _MAX_UNROLL_DIM:
        eye = jnp.eye(d, dtype=a.dtype)
        return jnp.linalg.cholesky(a + jitter * eye)

    # Work in column layout: cols[j] is the j-th column, shape [..., D].
    cols = [a[..., j] for j in range(d)]  # each [..., D]
    if jitter:
        onehot = jnp.eye(d, dtype=a.dtype)
        cols = [cols[j] + jitter * onehot[j] for j in range(d)]

    l_cols = []  # l_cols[j][..., i] = L[i, j]
    for j in range(d):
        # v = a[:, j] - sum_{k<j} L[:, k] * L[j, k]
        v = cols[j]
        for k in range(j):
            v = v - l_cols[k] * l_cols[k][..., j : j + 1]
        ljj = jnp.sqrt(v[..., j])
        # zero out the strict upper part of this column
        mask = jnp.arange(d) >= j
        col = jnp.where(mask, v / ljj[..., None], 0.0)
        l_cols.append(col)

    return jnp.stack(l_cols, axis=-1)


def tri_solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L x = b for lower-triangular L by unrolled forward substitution.

    ``b`` has shape [..., D] or [..., D, M].
    """
    d = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    if d > _MAX_UNROLL_DIM:
        import jax

        x = jax.scipy.linalg.solve_triangular(l, b, lower=True)
        return x[..., 0] if vec else x

    rows = []
    for i in range(d):
        v = b[..., i, :]
        for k in range(i):
            v = v - l[..., i, k, None] * rows[k]
        rows.append(v / l[..., i, i, None])
    x = jnp.stack(rows, axis=-2)
    return x[..., 0] if vec else x


def tri_solve_upper_t(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b (L lower-triangular) by unrolled back substitution."""
    d = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    if d > _MAX_UNROLL_DIM:
        import jax

        x = jax.scipy.linalg.solve_triangular(l, b, lower=True, trans=1)
        return x[..., 0] if vec else x

    rows: list = [None] * d
    for i in reversed(range(d)):
        v = b[..., i, :]
        for k in range(i + 1, d):
            # (L^T)[i, k] = L[k, i]
            v = v - l[..., k, i, None] * rows[k]
        rows[i] = v / l[..., i, i, None]
    x = jnp.stack(rows, axis=-2)
    return x[..., 0] if vec else x


def solve_psd_small(a: jnp.ndarray, b: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Solve a x = b for SPD ``a`` via unrolled Cholesky."""
    l = cholesky_small(a, jitter=jitter)
    return tri_solve_upper_t(l, tri_solve_lower(l, b))


def inv_psd_small(a: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Inverse of an SPD matrix via unrolled Cholesky solves against I."""
    d = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype), a.shape)
    return solve_psd_small(a, eye, jitter=jitter)


def logdet_from_chol(l: jnp.ndarray) -> jnp.ndarray:
    """log det(A) given L = chol(A): 2 * sum(log diag L)."""
    diag = jnp.diagonal(l, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def logdet_psd_small(a: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """log det of an SPD matrix via unrolled Cholesky."""
    return logdet_from_chol(cholesky_small(a, jitter=jitter))
