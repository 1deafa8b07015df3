"""Fused decode+MSE kernel (ops/recon_kernels.py) vs the XLA reference.

Interpret mode on CPU; the kernel's bf16-MXU numerics bound the tolerances
(h/w enter the matmul as bf16 with fp32 accumulation — same contract as the
metric/IAF kernels).  Reference semantics: per-frame MSE with the
closed-loop frame-0 double count, riemannian_flow_vae.py:1192-1197.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.ops.recon_kernels import decode_mse, decode_mse_xla


def _problem(m=40, h=64, n=300, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(m, h)), jnp.float32),
        jnp.asarray(rng.normal(size=(h, n)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32),
        jnp.asarray(rng.uniform(size=(m, n)), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, size=(m,)), jnp.float32),
    )


@pytest.mark.parametrize("m,n", [(40, 300), (16, 128), (33, 257)])
def test_forward_matches_xla(m, n):
    h, w, b, x, rw = _problem(m=m, n=n)
    ref = float(decode_mse_xla(h, w, b, x, rw))
    out = float(decode_mse(h, w, b, x, rw, 16, 128, True))
    assert abs(out - ref) / abs(ref) < 2e-3


def test_grads_match_xla_autodiff():
    h, w, b, x, rw = _problem()
    gref = jax.grad(decode_mse_xla, argnums=(0, 1, 2))(h, w, b, x, rw)
    gp = jax.grad(
        lambda h_, w_, b_: decode_mse(h_, w_, b_, x, rw, 16, 128, True),
        argnums=(0, 1, 2),
    )(h, w, b)
    for a, bb in zip(gref, gp):
        denom = float(jnp.max(jnp.abs(a))) + 1e-12
        assert float(jnp.max(jnp.abs(a - bb))) / denom < 1e-2


def test_zero_row_weights_drop_rows():
    """rw=0 rows (padding / masked frames) contribute nothing to loss or
    grads — the contract the model relies on for padded batch rows."""
    h, w, b, x, rw = _problem()
    rw0 = rw.at[7].set(0.0)
    keep = jnp.arange(h.shape[0]) != 7
    ref = float(decode_mse_xla(h[keep], w, b, x[keep], rw0[keep]))
    out = float(decode_mse(h, w, b, x, rw0, 16, 128, True))
    assert abs(out - ref) / abs(ref) < 2e-3
    dh = jax.grad(lambda h_: decode_mse(h_, w, b, x, rw0, 16, 128, True))(h)
    assert float(jnp.max(jnp.abs(dh[7]))) == 0.0


def test_value_and_grad_jit_composes():
    h, w, b, x, rw = _problem(m=24, n=160)
    f = jax.jit(
        jax.value_and_grad(
            lambda h_, w_, b_: decode_mse(h_, w_, b_, x, rw, 16, 128, True),
            argnums=(0, 1, 2),
        )
    )
    val, grads = f(h, w, b)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)
