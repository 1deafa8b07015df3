"""Tests for the unrolled small-matrix linear algebra (rlvae_tpu.ops.linalg)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.ops import linalg


def _random_spd(rng, b, d, jitter=0.1):
    a = rng.normal(size=(b, d, d))
    return (a @ np.swapaxes(a, -1, -2) + jitter * np.eye(d)).astype(np.float32)


@pytest.mark.parametrize("d", [2, 3, 16, 32])
def test_cholesky_small_matches_numpy(rng, d):
    a = _random_spd(rng, 8, d)
    l_ours = np.asarray(linalg.cholesky_small(jnp.asarray(a)))
    l_np = np.linalg.cholesky(a.astype(np.float64))
    np.testing.assert_allclose(l_ours, l_np, rtol=2e-4, atol=2e-4)
    # strictly lower-triangular output
    assert np.allclose(np.triu(l_ours, k=1), 0.0)


def test_cholesky_jitter():
    # singular matrix becomes factorizable with jitter
    a = jnp.zeros((1, 4, 4))
    l = linalg.cholesky_small(a, jitter=1e-2)
    assert np.all(np.isfinite(np.asarray(l)))
    np.testing.assert_allclose(np.asarray(l @ jnp.swapaxes(l, -1, -2)), 1e-2 * np.eye(4)[None], atol=5e-5)


def test_tri_solves(rng):
    d = 16
    a = _random_spd(rng, 4, d)
    l = np.linalg.cholesky(a)
    b = rng.normal(size=(4, d)).astype(np.float32)
    x = np.asarray(linalg.tri_solve_lower(jnp.asarray(l.astype(np.float32)), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", l, x), b, rtol=1e-4, atol=1e-4)
    y = np.asarray(linalg.tri_solve_upper_t(jnp.asarray(l.astype(np.float32)), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("bji,bj->bi", l, y), b, rtol=1e-3, atol=1e-3)


def test_inv_psd_small(rng):
    a = _random_spd(rng, 8, 16)
    inv = np.asarray(linalg.inv_psd_small(jnp.asarray(a)))
    ident = np.einsum("bij,bjk->bik", a, inv)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(16), ident.shape), atol=5e-3)


def test_logdet_psd_small(rng):
    a = _random_spd(rng, 8, 16)
    ld = np.asarray(linalg.logdet_psd_small(jnp.asarray(a)))
    _, ld_np = np.linalg.slogdet(a.astype(np.float64))
    np.testing.assert_allclose(ld, ld_np, rtol=1e-4, atol=1e-4)


def test_matrix_rhs_solve(rng):
    a = _random_spd(rng, 4, 8)
    b = rng.normal(size=(4, 8, 3)).astype(np.float32)
    x = np.asarray(linalg.solve_psd_small(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("bij,bjk->bik", a, x), b, rtol=1e-3, atol=1e-3)
