"""Tests for the research model zoo (rlvae_tpu/models/research/).

VAMP gets direct torch parity (the vendored pythae VAMP imports cleanly).
GPVAE's KL is validated against an independent dense-matrix implementation
(the reference's own encoder-reshape arithmetic is inconsistent — see
gpvae.py docstring).  RIEM is UNIMPORTABLE in the reference tree (missing
external diffusion deps, riem_model.py:19-21), so it gets behavioral tests of
the reimplemented math: metric-adjusted sampling, uniform-Riemann rejection,
per-visit training branches, boundary-KL gating, generation/prediction."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.geometry import load_metric

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"
INPUT = (3, 8, 8)


def _batch(b=2, t=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(b, t, *INPUT)), jnp.float32)


# -- VAMP ---------------------------------------------------------------------


def test_vamp_forward_and_generate():
    from rlvae_tpu.models.research import VAMP

    m = VAMP(input_dim=INPUT, latent_dim=8, number_components=5)
    v = m.init(jax.random.PRNGKey(0))
    out = m.forward(v, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    assert out.recon_x.shape == (2, 4, *INPUT)
    gen = m.generate(v, jax.random.PRNGKey(2), 3)
    assert gen.shape == (3, *INPUT)
    nll = m.estimate_nll(v, _batch(), jax.random.PRNGKey(3), n_samples=4)
    assert nll.shape == (8,) and np.isfinite(np.asarray(nll)).all()


def test_vamp_torch_parity(reference_available):
    """Loss-component parity against the vendored pythae VAMP with
    transferred weights and pinned reparameterization noise."""
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace

    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models import VAMP as TorchVAMP
    from pythae.models import VAMPConfig

    from rlvae_tpu.models.research import VAMP

    torch.manual_seed(0)
    cfg = VAMPConfig(
        input_dim=INPUT, latent_dim=8, number_components=5,
        linear_scheduling_steps=0, reconstruction_loss="mse",
    )
    ref = TorchVAMP(cfg)
    ref.eval()
    # pin z = mu on both sides
    ref._sample_gauss = lambda mu, std: (mu, torch.zeros_like(mu))

    ours = VAMP(input_dim=INPUT, latent_dim=8, number_components=5)
    variables = ours.init(jax.random.PRNGKey(0))

    def wb(lin):
        return (
            jnp.array(lin.weight.detach().numpy().T),
            jnp.array(lin.bias.detach().numpy()),
        )

    params = variables["params"]
    k0, b0 = wb(ref.encoder.layers[0][0])
    ke, be = wb(ref.encoder.embedding)
    kv, bv = wb(ref.encoder.log_var)
    params["encoder"] = {
        "hidden_0": {"kernel": k0, "bias": b0},
        "embedding": {"kernel": ke, "bias": be},
        "log_var": {"kernel": kv, "bias": bv},
    }
    k0, b0 = wb(ref.decoder.layers[0][0])
    k1, b1 = wb(ref.decoder.layers[1][0])
    params["decoder"] = {
        "hidden_0": {"kernel": k0, "bias": b0},
        "out": {"kernel": k1, "bias": b1},
    }
    lin = ref.pseudo_inputs[0]
    params["pseudo"] = {
        "kernel": jnp.array(lin.weight.detach().numpy().T),
        "bias": jnp.array(lin.bias.detach().numpy()),
    }

    x = _batch(b=2, t=3, seed=1)
    xt = torch.as_tensor(np.asarray(x))
    inputs = {
        "data": xt,
        "seq_mask": torch.ones(2, 3),
        "pix_mask": torch.ones_like(xt),
    }
    with torch.no_grad():
        ref_out = ref(SimpleNamespaceDict(inputs))
    out = ours.forward(
        variables, x, jax.random.PRNGKey(0), eps=jnp.zeros((6, 8), jnp.float32)
    )
    for ours_key, ref_key in (
        ("loss", "loss"),
        ("reconstruction_loss", "reconstruction_loss"),
        ("reg_loss", "reg_loss"),
    ):
        a, b = float(out[ours_key]), float(getattr(ref_out, ref_key))
        assert abs(a - b) / (abs(b) + 1e-3) < 2e-2, f"{ours_key}: ours={a} ref={b}"


class SimpleNamespaceDict(dict):
    """dict with attribute access + hasattr, like pythae's DatasetOutput."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


# -- GPVAE ---------------------------------------------------------------------


def test_gpvae_forward_and_generate():
    from rlvae_tpu.models.research import GPVAE

    m = GPVAE(input_dim=INPUT, latent_dim=6, time_length=4, kernel_scales=2)
    v = m.init(jax.random.PRNGKey(0))
    out = m.forward(v, _batch(t=4), jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    assert out.recon_x.shape == (2, 4, *INPUT)
    gen = m.generate(v, jax.random.PRNGKey(2), 3)
    assert gen.shape == (3, 4, *INPUT)


def test_gpvae_kernels():
    from rlvae_tpu.models.research.gpvae import gp_kernel

    for kind, ls in (("cauchy", 1.0), ("rbf", 1.0), ("diffusion", 0.3), ("matern", 1.0)):
        k = gp_kernel(kind, 6, ls)
        assert k.shape == (6, 6)
        np.testing.assert_allclose(k, k.T, atol=1e-6)
        assert np.linalg.eigvalsh(k).min() > 0  # PD


def test_gpvae_kl_matches_dense_formula():
    """The precomputed-component KL must equal the dense MVN KL computed
    independently with jnp.linalg."""
    from rlvae_tpu.models.research import GPVAE

    m = GPVAE(input_dim=INPUT, latent_dim=4, time_length=4)
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(b=3, t=4, seed=2)
    b, t = 3, 4
    mu, inv_p = m.posterior(v["params"], x.reshape(b * t, *INPUT), b)
    kl_fast = np.asarray(m._kl_to_prior(mu, inv_p))

    cov_q = np.einsum(
        "bltu,blvu->bltv",
        np.swapaxes(np.asarray(inv_p), -1, -2),
        np.swapaxes(np.asarray(inv_p), -1, -2),
    )
    k_mat = np.asarray(m.prior_cov)
    kl_dense = np.zeros(b)
    for bi in range(b):
        for li in range(m.latent_dim):
            s, k = cov_q[bi, li], k_mat[li]
            k_inv = np.linalg.inv(k)
            mu_v = np.asarray(mu)[bi, li]
            kl_dense[bi] += 0.5 * (
                np.trace(k_inv @ s)
                + mu_v @ k_inv @ mu_v
                - t
                + np.linalg.slogdet(k)[1]
                - np.linalg.slogdet(s)[1]
            )
    np.testing.assert_allclose(kl_fast, kl_dense, rtol=1e-3, atol=1e-3)


def test_gpvae_posterior_sampling_consistency():
    """Sampling z = mu + A^T eps must realize the covariance the KL uses."""
    from rlvae_tpu.models.research import GPVAE

    m = GPVAE(input_dim=INPUT, latent_dim=2, time_length=3)
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(b=1, t=3, seed=3)
    mu, inv_p = m.posterior(v["params"], x.reshape(3, *INPUT), 1)
    a_t = np.swapaxes(np.asarray(inv_p), -1, -2)[0, 0]
    cov_expected = a_t @ a_t.T
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    eps = np.asarray(jax.vmap(lambda k: jax.random.normal(k, (3,)))(keys))
    zs = np.asarray(mu)[0, 0][None] + eps @ a_t.T
    cov_mc = np.cov(zs.T)
    np.testing.assert_allclose(cov_mc, cov_expected, atol=0.15)


# -- RIEM ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def riem_metric():
    return load_metric(DATA / "metric_T0.7_scaled.npz", temperature_override=3.0)


def test_riem_warmup_and_visit_branches(riem_metric):
    from rlvae_tpu.models.research import RIEM

    m = RIEM(input_dim=INPUT, latent_dim=16, n_obs=4, warmup=5, metric=riem_metric)
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(t=4)
    warm = m.forward(v, x, jax.random.PRNGKey(1), epoch=0)
    assert np.isfinite(float(warm.loss)) and warm.vi_index == -1

    for vi in (0, 2, 3):
        out = m.forward(v, x, jax.random.PRNGKey(2), vi_index=vi, epoch=50)
        assert np.isfinite(float(out.loss))
        assert out.z_seq.shape == (2, 4, 16)
        # KL gate: active only at boundary visits (riem_model.py:566-576)
        if vi in (0, 3):
            assert abs(float(out.reg_loss)) > 0
        else:
            assert float(out.reg_loss) == 0.0


def test_riem_iaf_posterior_runs(riem_metric):
    from rlvae_tpu.models.research import RIEM

    m = RIEM(input_dim=INPUT, latent_dim=16, n_obs=4, warmup=0,
             posterior="iaf", metric=riem_metric, flow_hidden_size=16)
    v = m.init(jax.random.PRNGKey(0))
    out = m.forward(v, _batch(t=4), jax.random.PRNGKey(1), vi_index=0, epoch=10)
    assert np.isfinite(float(out.loss))


def test_riem_uniform_riemann_sampling(riem_metric):
    from rlvae_tpu.models.research.riem import sample_uniform_riemann

    z = sample_uniform_riemann(riem_metric, jax.random.PRNGKey(0), 64, 16)
    z = np.asarray(z)
    assert z.shape == (64, 16)
    assert (z >= -1.0 - 1e-6).all() and (z <= 1.0 + 1e-6).all()


def test_riem_generate_predict(riem_metric):
    from rlvae_tpu.models.research import RIEM

    m = RIEM(input_dim=INPUT, latent_dim=16, n_obs=4, warmup=0, metric=riem_metric)
    v = m.init(jax.random.PRNGKey(0))
    gen = m.generate(v, jax.random.PRNGKey(1), 2)
    assert gen.shape == (2, 4, *INPUT)
    pred = m.predict(v, _batch(t=4)[:, 1], 1, jax.random.PRNGKey(2))
    assert pred.shape == (2, 4, *INPUT)
    assert np.isfinite(np.asarray(pred)).all()


# -- LVAE_IAF -------------------------------------------------------------------


def _import_torch_lvae_iaf():
    """The reference LVAE_IAF imports external diffusion packages it never
    uses on the forward/loss path (lvae_iaf_model.py:19-21) — stub them."""
    import sys
    import types

    from tests.reference_utils import import_pythae

    for name, attrs in (
        ("diffusion", ()),
        ("diffusion.stable_diffusion", ()),
        ("diffusion.stable_diffusion.latent_diffusion", ("MyLatentDiffusion",)),
        ("diffusion.stable_diffusion.sampler", ()),
        ("diffusion.stable_diffusion.sampler.ddim", ("DDIMSampler",)),
        ("geometric_perspective_on_vaes", ()),
        ("geometric_perspective_on_vaes.sampling", ("hmc_sampling",)),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for a in attrs:
                setattr(mod, a, object)
            sys.modules[name] = mod
    import_pythae()
    from pythae.models.lvae_iaf.lvae_iaf_config import LVAE_IAF_Config
    from pythae.models.lvae_iaf.lvae_iaf_model import LVAE_IAF as TorchLVAE

    return TorchLVAE, LVAE_IAF_Config


def test_lvae_iaf_forward_branches():
    from rlvae_tpu.models.research import LVAE_IAF

    m = LVAE_IAF(input_dim=INPUT, latent_dim=8, n_obs=4, warmup=5,
                 hidden_size=16, posterior="iaf", prior="vamp",
                 vamp_number_components=4)
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(t=4)
    warm = m.forward(v, x, jax.random.PRNGKey(1), epoch=0)
    assert np.isfinite(float(warm.loss))
    out = m.forward(v, x, jax.random.PRNGKey(2), vi_index=2, epoch=50)
    assert np.isfinite(float(out.loss)) and out.z_seq.shape == (2, 4, 8)
    rec = m.reconstruct(v, x, 1, jax.random.PRNGKey(3))
    gen = m.generate(v, jax.random.PRNGKey(4), 2)
    assert rec.shape == x.shape and gen.shape == (2, 4, *INPUT)
    seq_mask = jnp.asarray([[1, 0, 1, 0], [1, 0, 1, 0]], jnp.float32)
    filled = m.infer_missing(v, x, seq_mask, jnp.ones_like(x), jax.random.PRNGKey(5))
    assert filled.shape == x.shape and np.isfinite(np.asarray(filled)).all()


def test_lvae_iaf_torch_parity(reference_available):
    """Loss parity vs the reference LVAE_IAF (diffusion imports stubbed) with
    transferred weights, pinned z = mu, and a pinned visit index."""
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    import numpy as _np

    from tests.test_flows import _torch_iaf_to_params

    TorchLVAE, LVAE_IAF_Config = _import_torch_lvae_iaf()
    from rlvae_tpu.models.research import LVAE_IAF

    torch.manual_seed(0)
    cfg = LVAE_IAF_Config(
        input_dim=INPUT, latent_dim=8, n_obs_per_ind=4, warmup=0, beta=1.0,
        n_made_blocks=2, n_hidden_in_made=3, hidden_size=16,
        prior="standard", posterior="gaussian", reconstruction_loss="mse",
        linear_scheduling_steps=0,
    )
    ref = TorchLVAE(cfg)
    ref.eval()
    ref._sample_gauss = lambda mu, std: (mu, torch.zeros_like(mu))

    ours = LVAE_IAF(input_dim=INPUT, latent_dim=8, n_obs=4, warmup=0,
                    n_made_blocks=2, n_hidden_in_made=3, hidden_size=16)
    variables = ours.init(jax.random.PRNGKey(0))
    params = variables["params"]

    def wb(lin):
        return (jnp.array(lin.weight.detach().numpy().T),
                jnp.array(lin.bias.detach().numpy()))

    k0, b0 = wb(ref.encoder.layers[0][0])
    ke, be = wb(ref.encoder.embedding)
    kv, bv = wb(ref.encoder.log_var)
    params["encoder"] = {"hidden_0": {"kernel": k0, "bias": b0},
                         "embedding": {"kernel": ke, "bias": be},
                         "log_var": {"kernel": kv, "bias": bv}}
    k0, b0 = wb(ref.decoder.layers[0][0])
    k1, b1 = wb(ref.decoder.layers[1][0])
    params["decoder"] = {"hidden_0": {"kernel": k0, "bias": b0},
                         "out": {"kernel": k1, "bias": b1}}
    params["flows"] = [_torch_iaf_to_params(f) for f in ref.flows]

    x = _batch(b=2, t=4, seed=4)
    xt = torch.as_tensor(_np.array(x))
    inputs = SimpleNamespaceDict(
        {"data": xt, "seq_mask": torch.ones(2, 4), "pix_mask": torch.ones_like(xt)}
    )
    # pin the random visit index the torch side draws (lvae_iaf_model.py:210)
    _np.random.seed(123)
    vi = int(_np.random.randint(4))
    _np.random.seed(123)
    with torch.no_grad():
        ref_out = ref(inputs, epoch=50)
    out = ours.forward(
        variables, x, jax.random.PRNGKey(0), vi_index=vi, epoch=50
    )
    # ours samples z via key; pin by re-running with z = mu through the same
    # path: compare the deterministic pieces instead — z_seq given z=mu
    enc = ours.encoder.apply({"params": params["encoder"]}, x[:, vi])
    z_seq, log_det = ours.propagate(params, enc.embedding, vi)
    np.testing.assert_allclose(
        np.asarray(z_seq), ref_out.z_seq.numpy(), rtol=2e-2, atol=2e-2
    )
    # loss parity with pinned z on both sides
    recon = ours.decoder.apply(
        {"params": params["decoder"]}, z_seq.reshape(8, 8)
    ).reconstruction.reshape(x.shape)
    recon_loss = ours._recon_loss(recon, x, jnp.ones((2, 4)), jnp.ones_like(x))
    log_q = jnp.sum(
        -0.5 * (enc.log_covariance + 0.0 / (jnp.exp(enc.log_covariance) + 1e-7)),
        axis=1,
    )
    log_prior = ours.log_p_z(params, z_seq[:, 0]) + log_det
    loss = jnp.mean(recon_loss + (log_q - log_prior))
    a, b = float(loss), float(ref_out.loss)
    assert abs(a - b) / (abs(b) + 1e-3) < 2e-2, f"loss: ours={a} ref={b}"

    # the PRODUCTION forward's loss assembly must match too (the re-derived
    # loss above pins the subcomponents; this pins the shipped glue —
    # kld sign, beta weighting, log-det handling).  Pin z = mu through the
    # overridable sampling hook, mirroring the torch _sample_gauss pin.
    ours.sample_visit_latent = lambda p, k, mu, lv, vi: mu
    out = ours.forward(variables, x, jax.random.PRNGKey(0), vi_index=vi, epoch=50)
    a_fwd = float(out.loss)
    assert abs(a_fwd - b) / (abs(b) + 1e-3) < 2e-2, (
        f"forward loss: ours={a_fwd} ref={b}"
    )


# -- LVAE_GUGUS -------------------------------------------------------------------


def test_gugus_metric_field_and_riemann_prior():
    from rlvae_tpu.models.research import LVAE_GUGUS

    m = LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0,
                   hidden_size=16, use_riemann_prior=True)
    v = m.init(jax.random.PRNGKey(0))
    data = _batch(b=4, t=3, seed=5)
    gms, gs = m.retrieve_metric_all(v, data)
    assert len(gms) == 3 and gs[0].shape == (6, 6)
    # stored metric field
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6)), jnp.float32)
    g1 = m.metric_tensor_field(v, z, 1)
    assert g1.shape == (2, 6, 6)
    # pushforward path (beyond stored timesteps)
    m.g_list = m.g_list[:1]
    g_push = m.metric_tensor_field(v, z, 2)
    assert g_push.shape == (2, 6, 6)
    assert np.isfinite(np.asarray(g_push)).all()
    # pushforward invariant: volume transforms by |det J|^2 exactly
    params = v["params"]
    z2, g2 = m.push_metric(params, z, jnp.asarray(m.g_list[0]), 0)
    from rlvae_tpu.flows.iaf import iaf_inverse
    _, ld = iaf_inverse(params["flows"][0], m.masks, z)
    det0 = np.linalg.slogdet(np.asarray(jnp.broadcast_to(jnp.asarray(m.g_list[0]), g2.shape)))[1]
    det2 = np.linalg.slogdet(np.asarray(g2))[1]
    np.testing.assert_allclose(det2, det0 - 2 * np.asarray(ld), rtol=1e-3, atol=1e-3)

    # riemannian prior is active in the visit-0 loss
    out = m.forward(v, data[:2], jax.random.PRNGKey(1), vi_index=0, epoch=10)
    assert np.isfinite(float(out.loss))
    m2 = LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0,
                    hidden_size=16, use_riemann_prior=False)
    out2 = m2.forward(
        {"params": v["params"]}, data[:2], jax.random.PRNGKey(1), vi_index=0, epoch=10
    )
    assert float(out.loss) != float(out2.loss)


def test_gugus_hmc_generation():
    from rlvae_tpu.models.research import LVAE_GUGUS

    m = LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0, hidden_size=16)
    v = m.init(jax.random.PRNGKey(0))
    m.retrieve_metric_all(v, _batch(b=4, t=3, seed=6))
    gen = m.generate_hmc(v, jax.random.PRNGKey(1), 2)
    assert gen.shape == (2, 3, *INPUT)
    assert np.isfinite(np.asarray(gen)).all()


# -- LLDM (reference lldm_model.py:23-1029; unimportable upstream — missing
# external diffusion deps — so behavioral tests per branch, like RIEM) --------


def _lldm(latent_dim=6, n_obs=4, **kw):
    from rlvae_tpu.models.research import LLDM

    kw.setdefault("hidden_size", 16)
    return LLDM(input_dim=INPUT, latent_dim=latent_dim, n_obs=n_obs, **kw)


def test_lldm_sequential_diffusion_bridge():
    """q(z_t2|z_t1) matches the DDPM bridge: mean sqrt(abar2/abar1) x, var
    1 - abar2/abar1 (lldm_model.py:476 sequential_diffusion contract)."""
    from rlvae_tpu.models.research import LatentDiffusion

    ldm = LatentDiffusion(4)
    abar = np.asarray(ldm.alpha_bar)
    assert (np.diff(abar) < 0).all() and 0 < abar[-1] < abar[0] < 1
    x = jnp.ones((4096, 4))
    t1, t2 = 100, 700
    out = ldm.sequential_diffusion(
        jax.random.PRNGKey(0), x, np.full(4096, t1), np.full(4096, t2)
    )
    ratio = abar[t2] / abar[t1]
    assert np.isclose(float(out.mean()), np.sqrt(ratio), atol=0.02)
    assert np.isclose(float(out.std()), np.sqrt(1 - ratio), atol=0.02)


def test_lldm_ddim_step_recovers_x0():
    """With the exact noise as e_t, pred_x0 equals the clean latent and the
    eta=0 step is the deterministic DDIM update (lldm_model.py:493-497)."""
    from rlvae_tpu.models.research import DDIMSampler, LatentDiffusion

    ldm = LatentDiffusion(4)
    s = DDIMSampler(ldm, n_steps=5, ddim_eta=0.0)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4)), jnp.float32)
    idx = 3
    a = float(s.ddim_alpha[idx])
    x_t = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
    x_prev, pred_x0 = s.get_x_prev_and_pred_x0(jax.random.PRNGKey(2), eps, idx, x_t)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-5)
    a_prev = float(s.ddim_alpha_prev[idx])
    expect = np.sqrt(a_prev) * np.asarray(x0) + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x_prev), expect, atol=1e-5)
    assert float(s.ddim_sigma[idx]) == 0.0  # eta=0 -> deterministic


def test_lldm_sampled_metric_matches_reference_formula():
    """g_diag/log_pi reproduce the dense torch G_sampl formula: Mahalanobis
    weights, sum of diag(M_i), +lbd I, det clamped at 1e32
    (vae_model.py:266-279, 342-343)."""
    from rlvae_tpu.models.research import SampledMetric

    rng = np.random.default_rng(0)
    c = rng.normal(size=(5, 3)).astype(np.float32)
    m_flat = np.exp(rng.normal(size=(5, 3))).astype(np.float32)
    t, lbd = 0.7, 0.01
    metric = SampledMetric(c, m_flat, t, lbd)
    z = rng.normal(size=(4, 3)).astype(np.float32)

    # dense reference computation
    diff = c[None, :, :] - z[:, None, :]  # [B, K, D]
    omega = np.exp(-np.einsum("bkd,kd,bkd->bk", diff, m_flat, diff) / t**2)
    g_dense = np.einsum("bk,kde->bde", omega, np.stack([np.diag(m) for m in m_flat])
                        ) + lbd * np.eye(3)
    np.testing.assert_allclose(
        np.asarray(metric.g_diag(jnp.asarray(z))),
        np.einsum("bdd->bd", g_dense), rtol=1e-4,
    )
    det = np.clip(np.linalg.det(g_dense), 0, 1e32)
    np.testing.assert_allclose(
        np.asarray(metric.log_pi(jnp.asarray(z))), 0.5 * np.log(det), rtol=1e-4
    )


def test_lldm_retrieve_g_temperature_and_std_norm():
    """T = max over medoids of min inter-medoid distance, scaled; addStdNorm
    appends the N(0,I) component (vae_model.py:322-341, 256-262)."""
    from rlvae_tpu.models.research.lldm import retrieve_g

    mu = np.array([[0.0, 0.0], [1.0, 0.0], [5.0, 0.0]], np.float32)
    lv = np.zeros((3, 2), np.float32)
    metric = retrieve_g(mu, lv, num_centroids=3, t_multiplier=2.0)
    # medoids are the points themselves; min dists are (1, 1, 4) -> T = 4*2
    assert np.isclose(metric.temperature, 8.0)
    m2 = retrieve_g(mu, lv, num_centroids=3, add_std_norm=True)
    assert m2.centroids.shape == (4, 2) and np.allclose(np.asarray(m2.m_flat[-1]), 1.0)


def test_lldm_hmc_moves_up_volume():
    """Plain HMC on log_pi concentrates mass where sqrt(det G) is large
    (the hmc_sampling stand-in, lldm_model.py:636)."""
    from rlvae_tpu.models.research import SampledMetric
    from rlvae_tpu.models.research.lldm import hmc_sampling

    metric = SampledMetric(np.zeros((1, 2), np.float32),
                           50.0 * np.ones((1, 2), np.float32), 2.0, 0.01)
    mu = jnp.asarray(np.random.default_rng(0).normal(scale=3.0, size=(64, 2)),
                     jnp.float32)
    z, lp = hmc_sampling(metric, mu, jax.random.PRNGKey(0), 32,
                         mcmc_steps_nbr=40, eps_lf=0.05)
    lp0 = metric.log_pi(mu[:32])
    assert float(lp.mean()) > float(lp0.mean())
    assert np.isfinite(np.asarray(z)).all()


def test_lldm_warmup_and_visit_branches():
    """Warmup epochs use the plain VAE objective (vi_index=-1); the KL is
    active only at boundary visits and clamped to [-2, 500]
    (lldm_model.py:145-158, 304-319)."""
    m = _lldm(warmup=2)
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(t=4)
    out_w = m.forward(v, x, jax.random.PRNGKey(1), epoch=0, train=True)
    assert out_w.vi_index == -1 and np.isfinite(float(out_w.loss))
    out_b = m.forward(v, x, jax.random.PRNGKey(1), vi_index=0, epoch=5, train=True)
    # boundary visits must have a LIVE KL (non-zero, inside the clamp) — a
    # range containing 0 would also pass with the gate dead
    assert -2.0 <= float(out_b.reg_loss) <= 500.0 and float(out_b.reg_loss) != 0.0
    out_e = m.forward(v, x, jax.random.PRNGKey(1), vi_index=3, epoch=5, train=True)
    assert -2.0 <= float(out_e.reg_loss) <= 500.0 and float(out_e.reg_loss) != 0.0
    out_i = m.forward(v, x, jax.random.PRNGKey(1), vi_index=2, epoch=5, train=True)
    assert float(out_i.reg_loss) == 0.0  # interior visit: KL gated off
    assert out_i.z_seq.shape == (2, 4, 6)


def test_lldm_boundary_prior_uses_metric():
    """log_p_j_hat: N(0,I) at j=0; the sampled-metric volume log_pi at the
    data end when a pretrained metric is attached (lldm_model.py:369-409)."""
    from rlvae_tpu.models.research import SampledMetric

    metric = SampledMetric(np.zeros((1, 6), np.float32),
                           np.full((1, 6), 2.0, np.float32), 1.0, 0.01)
    m = _lldm(pretrained_metric=metric)
    v = m.init(jax.random.PRNGKey(0))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(3, 6)), jnp.float32)
    p0 = m.log_p_j_hat(v["params"], 0, z)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(-0.5 * (z**2).sum(1)),
                               rtol=1e-5)
    p_end = m.log_p_j_hat(v["params"], m.n_obs - 1, z)
    np.testing.assert_allclose(np.asarray(p_end), np.asarray(metric.log_pi(z)),
                               rtol=1e-5)


@pytest.mark.slow
def test_lldm_iaf_posterior_and_vamp_prior():
    """Posterior IAF (n_blocks=3, n_hidden=2, lldm_model.py:70-80) and the
    VAMP mixture prior branch both train with finite nonzero gradients."""
    m = _lldm(posterior="iaf", prior="vamp", vamp_number_components=4, warmup=1)
    v = m.init(jax.random.PRNGKey(0))
    assert "posterior_flow" in v["params"] and len(v["params"]["posterior_flow"]) == 3
    x = _batch(t=4)

    def loss(p, epoch, vi):
        return m.forward({"params": p}, x, jax.random.PRNGKey(1), vi_index=vi,
                         epoch=epoch, train=True).loss

    for epoch, vi in ((0, None), (5, 0)):  # warmup (vae_iaf path) + boundary
        val, g = jax.value_and_grad(loss)(v["params"], epoch, vi if vi is not None else 1)
        assert np.isfinite(float(val))
        flow_norm = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g["posterior_flow"], 0.0
        )
        assert np.isfinite(flow_norm)


def test_lldm_reconstruct_and_oversample():
    """reconstruct bridges vi_index to the full timeline; oversample re-times
    onto a denser DDIM ladder of length n_obs-1+num_supp_steps
    (lldm_model.py:411-505, 507-597)."""
    m = _lldm()
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(b=1, t=4)[0]
    z_seq, recon = m.reconstruct(v, x, 2, jax.random.PRNGKey(1))
    assert z_seq.shape == (4, 6) and recon.shape == (4, *INPUT)
    # explicit z_vi_index overrides the encoding deterministically
    z_fix = jnp.ones((1, 6))
    a1, _ = m.reconstruct(v, x, 2, jax.random.PRNGKey(2), z_vi_index=z_fix)
    a2, _ = m.reconstruct(v, x, 2, jax.random.PRNGKey(2), z_vi_index=z_fix)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(a1[2]), np.asarray(z_fix[0]))
    z_os, rec_os = m.oversample(v, x, 1, jax.random.PRNGKey(3), num_supp_steps=3)
    assert z_os.shape == (6, 6) and rec_os.shape == (6, *INPUT)
    assert np.isfinite(np.asarray(rec_os)).all()


@pytest.mark.slow
def test_lldm_generate_predict_nll():
    """generate: HMC anchors on the retrieved metric -> bridged sequences;
    freeze repeats one anchor.  predict returns the stochastic future block.
    get_nll is finite (lldm_model.py:610-763, 765-844, 849-999)."""
    m = _lldm(n_obs=3)
    v = m.init(jax.random.PRNGKey(0))
    x = _batch(b=4, t=3, seed=3)
    rec, z_seq = m.generate(v, x, jax.random.PRNGKey(1), num_gen_seq=3,
                            vi_index=2, num_centroids=3, mcmc_steps_nbr=5)
    assert rec.shape == (3, 3, *INPUT) and z_seq.shape == (3, 3, 6)
    assert np.isfinite(np.asarray(rec)).all()
    rec_f, z_f = m.generate(v, x, jax.random.PRNGKey(2), num_gen_seq=3,
                            vi_index=2, num_centroids=3, mcmc_steps_nbr=5,
                            freeze=True)
    # frozen: every sequence anchors at the same z_vi
    np.testing.assert_allclose(np.asarray(z_f[0, 2]), np.asarray(z_f[1, 2]))
    pred = m.predict(v, x, 1, jax.random.PRNGKey(3), num_gen_seq=2)
    assert pred.shape == (4, 2, 1, *INPUT)
    nll = m.get_nll(v, x[:2], 1, jax.random.PRNGKey(4), n_samples=4)
    assert np.isfinite(nll)


@pytest.mark.slow
def test_lldm_pretrain_latent_diffusion_learns():
    """The DSM pretraining loop reduces the eps-prediction error — the
    provenance chain for the frozen pretrained_ldm (lldm_model.py:88-89)."""
    from rlvae_tpu.models.research import LatentDiffusion, pretrain_latent_diffusion

    rng = np.random.default_rng(0)
    lat = (rng.normal(size=(512, 4)) * 0.1 + rng.integers(0, 2, (512, 1)) * 2.0
           ).astype(np.float32)

    def dsm_eval(ldm):
        k = jax.random.PRNGKey(9)
        z0 = jnp.asarray(lat[:256])
        t = jnp.full((256,), 500, jnp.int32)
        eps = jax.random.normal(k, z0.shape)
        a = ldm.alpha_bar[t][:, None]
        z_t = jnp.sqrt(a) * z0 + jnp.sqrt(1 - a) * eps
        return float(jnp.mean((ldm(z_t, t.astype(jnp.float32)) - eps) ** 2))

    before = dsm_eval(LatentDiffusion(4, hidden=32, key=jax.random.PRNGKey(1)))
    ldm = pretrain_latent_diffusion(jax.random.PRNGKey(1), lat, hidden=32,
                                    n_steps=60, batch_size=128)
    assert dsm_eval(ldm) < before


def test_gpvae_torch_parity(reference_available):
    """Math-level parity against the vendored pythae GPVAE: the four GP
    kernel constructors, the multi-scale tiled prior, and the full MVN KL
    for identical posterior statistics (reference: gpvae_model.py:154-297).
    (The fork's encoder reshape arithmetic only closes for a specific
    head layout, so parity is anchored at the math the encoders feed.)"""
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")

    from tests.reference_utils import import_pythae

    import_pythae()
    from pythae.models import GPVAE as TorchGPVAE
    from pythae.models import GPVAEConfig

    from rlvae_tpu.models.research import GPVAE
    from rlvae_tpu.models.research.gpvae import gp_kernel

    T, L, B = 8, 5, 3
    cfg = GPVAEConfig(
        input_dim=INPUT, latent_dim=L, time_length=T, kernel_choice="cauchy",
        kernel_scales=2, length_scale=1.0, sigma=1.05, beta=1.0,
    )
    ref = TorchGPVAE(cfg)
    ours = GPVAE(
        input_dim=INPUT, latent_dim=L, time_length=T, kernel_choice="cauchy",
        kernel_scales=2, length_scale=1.0, sigma=1.05, beta=1.0,
    )

    # -- kernel constructors (all four kinds) -------------------------------
    for kind, args in (
        ("cauchy", dict(sigma=1.05, length_scale=1.3)),
        ("rbf", dict(length_scale=1.3)),
        ("diffusion", dict(length_scale=0.3)),
        ("matern", dict(length_scale=1.3)),
    ):
        if kind == "cauchy":
            kt = ref._cauchy_kernel(T, args["sigma"], args["length_scale"])
        else:
            kt = getattr(ref, f"_{kind}_kernel")(T, args["length_scale"])
        ko = gp_kernel(kind, T, args["length_scale"], args.get("sigma", 1.0))
        np.testing.assert_allclose(
            np.asarray(ko), kt.numpy(), rtol=1e-6, atol=1e-6, err_msg=kind
        )

    # -- multi-scale tiled prior covariance ---------------------------------
    pz = ref._get_prior()
    np.testing.assert_allclose(
        np.asarray(ours.prior_cov), pz.covariance_matrix.numpy(), rtol=1e-5, atol=1e-6
    )

    # -- full MVN KL for identical posterior statistics ---------------------
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(B, T, L)).astype(np.float32)
    pre_diag = rng.normal(size=(B, T, L)).astype(np.float32)
    pre_off = rng.normal(size=(B, T, L)).astype(np.float32)

    # torch layout: log_covar[t, 2l] = diag, [t, 2l+1] = superdiag (the
    # transpose+reshape in posterior_dist interleaves latent rows in pairs)
    log_covar_t = np.zeros((B, T, 2 * L), np.float32)
    log_covar_t[..., 0::2] = pre_diag
    log_covar_t[..., 1::2] = pre_off
    qz_x = ref.posterior_dist(
        mean=torch.as_tensor(mu.copy()), log_covar=torch.as_tensor(log_covar_t)
    )
    kld_t = ref._kl_divergence(qz_x, pz).sum(dim=-1).detach().numpy()

    sp = lambda a: np.log1p(np.exp(a))
    inv_p = ours._posterior_from_stats(
        jnp.asarray(sp(pre_diag)), jnp.asarray(sp(pre_off))
    )
    mu_ours = jnp.asarray(mu).transpose(0, 2, 1)  # [B, L, T]
    kld_o = np.asarray(ours._kl_to_prior(mu_ours, inv_p))
    np.testing.assert_allclose(kld_o, kld_t, rtol=2e-4, atol=1e-4)


@pytest.mark.slow
def test_lvae_iaf_estimate_nll():
    """Importance NLL (reference lvae_iaf_model.py:900-1040): finite,
    per-sequence, and improving (in expectation) with more samples."""
    from rlvae_tpu.models.research import LVAE_IAF

    model = LVAE_IAF(input_dim=INPUT, latent_dim=4, n_obs=4, warmup=0)
    variables = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, 4, *INPUT)).astype(np.float32)
    )
    nll = model.estimate_nll(variables, x, jax.random.PRNGKey(1), n_samples=16, vi_index=1)
    assert nll.shape == (3,)
    assert np.all(np.isfinite(np.asarray(nll)))
    # logsumexp over more importance samples can only tighten the bound in
    # expectation; allow slack for sampling noise
    nll_1 = model.estimate_nll(variables, x, jax.random.PRNGKey(2), n_samples=1, vi_index=1)
    nll_64 = model.estimate_nll(variables, x, jax.random.PRNGKey(2), n_samples=64, vi_index=1)
    assert float(np.mean(np.asarray(nll_64))) <= float(np.mean(np.asarray(nll_1))) + 5.0
    # discriminating check (the +5.0 slack alone tolerates an estimator
    # that ignores n_samples): 64 samples must shrink the key-to-key
    # spread of the estimate
    nll_1b = model.estimate_nll(variables, x, jax.random.PRNGKey(7), n_samples=1, vi_index=1)
    nll_64b = model.estimate_nll(variables, x, jax.random.PRNGKey(7), n_samples=64, vi_index=1)
    s1 = np.abs(np.asarray(nll_1) - np.asarray(nll_1b)).mean()
    s64 = np.abs(np.asarray(nll_64) - np.asarray(nll_64b)).mean()
    assert s64 < s1, f"n_samples has no effect: spread(1)={s1} spread(64)={s64}"

    # posterior-IAF variant exercises the flow log-det path
    model2 = LVAE_IAF(input_dim=INPUT, latent_dim=4, n_obs=4, warmup=0, posterior="iaf")
    v2 = model2.init(jax.random.PRNGKey(0))
    nll2 = model2.estimate_nll(v2, x, jax.random.PRNGKey(3), n_samples=8, vi_index=2)
    assert np.all(np.isfinite(np.asarray(nll2)))


# -- GUGUS variant pinning (VERDICT r2 item 6: the five upstream variants'
# distinguishing knobs, one test each; reference
# src/lib/src/pythae/models/lvae_gugus/) -------------------------------------


def _gugus(variant, **kw):
    from rlvae_tpu.models.research import LVAE_GUGUS

    kw.setdefault("hidden_size", 16)
    # gaussian posterior keeps these variant tests fast; the faithful
    # defaults (beta=5.0, posterior='iaf', lvae_gugus_config.py:29,34) are
    # asserted in test_gugus_sequence_loss_torch_parity
    kw.setdefault("posterior", "gaussian")
    return LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0,
                      variant=variant, use_riemann_prior=True, **kw)


def test_gugus_variant_base_volume_prior():
    """base: volume-only Riemannian prior -0.5 log det G0 - 0.5|z-GM|^2
    (lvae_gugus_model.py _log_p_z Riemannian branch)."""
    m = _gugus("base")
    assert m.riemann_prior_form == "volume" and not m.use_hmc_visit0
    v = m.init(jax.random.PRNGKey(0))
    m.retrieve_metric_all(v, _batch(b=4, t=3, seed=1))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(5, 6)), jnp.float32)
    got = np.asarray(m.log_p_z(v["params"], z))
    _, logdet = np.linalg.slogdet(m.g_list[0])
    want = -0.5 * logdet - 0.5 * ((np.asarray(z) - m.gm_list[0]) ** 2).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gugus_variant_lvaeg_gaussian_prior():
    """lvaeg: FULL metric-Gaussian prior -0.5(logdet G + z G^-1 z + D log2pi)
    (lvaeg_model.py _log_p_z)."""
    m = _gugus("lvaeg")
    assert m.riemann_prior_form == "gaussian"
    v = m.init(jax.random.PRNGKey(0))
    m.retrieve_metric_all(v, _batch(b=4, t=3, seed=1))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(5, 6)), jnp.float32)
    got = np.asarray(m.log_p_z(v["params"], z))
    g0 = m.g_list[0]
    _, logdet = np.linalg.slogdet(g0)
    quad = np.einsum("bi,ij,bj->b", np.asarray(z), np.linalg.inv(g0), np.asarray(z))
    want = -0.5 * (logdet + quad + 6 * np.log(2 * np.pi))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gugus_variant_lvaeg2_per_timestep_metrics():
    """lvaeg2: retrieveG_all stores one (GM_t, G_t) per observation and the
    stored field serves them; beyond the list the pushforward takes over
    (lvaeg2_model.py:113-163, 946-965)."""
    m = _gugus("lvaeg2")
    assert m.metric_mode == "stored"
    v = m.init(jax.random.PRNGKey(0))
    gms, gs = m.retrieve_metric_all(v, _batch(b=4, t=3, seed=2))
    assert len(gms) == 3 and len(gs) == 3
    z = jnp.zeros((2, 6), jnp.float32)
    for t in range(3):
        np.testing.assert_allclose(
            np.asarray(m.metric_tensor_field(v, z, t))[0], gs[t], rtol=1e-5
        )
    assert not np.allclose(gs[0], gs[1])  # genuinely per-timestep


def test_gugus_variant_lvaegg_local_metrics():
    """lvaegg: k-medoids + kNN local covariance metrics; G0 is the local
    metric of the centroid nearest the global mean; a sampled Mahalanobis
    observation metric is built for HMC (lvaegg_model.py:803-918)."""
    from rlvae_tpu.models.research import SampledMetric

    m = _gugus("lvaegg")
    v = m.init(jax.random.PRNGKey(0))
    mu_avg, g0, temp = m.retrieve_metric_local(
        v, _batch(b=16, t=3, seed=3), num_centroids=4, knn_neighbors=8
    )
    assert mu_avg.shape == (1, 6) and g0.shape == (6, 6) and temp > 0
    ev = np.linalg.eigvalsh(g0)
    assert (ev > 0).all()  # SPD local covariance
    assert isinstance(m.sampled_metric, SampledMetric)
    assert m.sampled_metric.centroids.shape == (4, 6)
    # the local-cov G0 is NOT the diagonal posterior-std metric
    m2 = _gugus("lvaeg2")
    m2.retrieve_metric_all(v, _batch(b=16, t=3, seed=3))
    assert not np.allclose(g0, m2.g_list[0], atol=1e-3)


def test_gugus_variant_lvaega_hmc_visit0():
    """lvaega: the visit-0 training draw comes from manifold HMC on the
    estimated metric, not reparameterization (lvaegA_model.py forward)."""
    m = _gugus("lvaega", hmc_visit0_steps=3)
    assert m.use_hmc_visit0
    v = m.init(jax.random.PRNGKey(0))
    m.retrieve_metric_all(v, _batch(b=4, t=3, seed=4))
    mu = jnp.zeros((4, 6), jnp.float32)
    lv = jnp.full((4, 6), -2.0, jnp.float32)
    z_hmc = m.sample_visit_latent(v["params"], jax.random.PRNGKey(1), mu, lv, 0)
    z_rep = m.sample_visit_latent(v["params"], jax.random.PRNGKey(1), mu, lv, 1)
    assert np.isfinite(np.asarray(z_hmc)).all()
    # the HMC draw differs from reparameterization (mu + sigma*eps)
    assert not np.allclose(np.asarray(z_hmc), np.asarray(z_rep))
    # ...but stays CONDITIONED on mu: chains start at the posterior means
    # (reference: hmc_sampling(self, mu, ...) — second arg = start positions)
    mu2 = mu + 5.0
    z_hmc2 = m.sample_visit_latent(v["params"], jax.random.PRNGKey(1), mu2, lv, 0)
    assert not np.allclose(np.asarray(z_hmc), np.asarray(z_hmc2))
    # visit>0 falls back to reparameterization around mu
    assert np.abs(np.asarray(z_rep)).max() < 1.0
    out = m.forward(v, _batch(b=4, t=3, seed=4), jax.random.PRNGKey(2),
                    vi_index=0, epoch=5, train=True)
    assert np.isfinite(float(out.loss))


def test_gugus_variant_lvaega2_weight_norm_and_metric_mode():
    """lvaega2: weight-normalized flow storage (function-preserving at
    conversion), metric_mode='push' forces the pushforward field, and
    compare_metrics reports the push-vs-empirical drift
    (lvaegA2_model.py:60-75)."""
    from rlvae_tpu.models.research import LVAE_GUGUS
    from rlvae_tpu.models.research.gugus import _wn_materialize_block

    m = _gugus("lvaega2", use_hmc_visit0=False)
    assert m.weight_norm_flows and m.metric_mode == "push"
    v = m.init(jax.random.PRNGKey(0))
    # WN storage: blocks carry v/g pairs; materialization reproduces the
    # unconverted weights exactly at init
    blk = v["params"]["flows"][0][0]
    assert "w0_v" in blk and "w0_g" in blk and "w0" not in blk
    plain = LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0,
                       variant="lvaega2", weight_norm_flows=False,
                       use_hmc_visit0=False, hidden_size=16)
    v_plain = plain.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(_wn_materialize_block(blk)["w0"]),
        np.asarray(v_plain["params"]["flows"][0][0]["w0"]), rtol=1e-5,
    )
    # propagate works through the WN materialization
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6)), jnp.float32)
    z_seq, _ = m.propagate(v["params"], z, 0)
    z_seq_plain, _ = plain.propagate(v_plain["params"], z, 0)
    np.testing.assert_allclose(np.asarray(z_seq), np.asarray(z_seq_plain),
                               rtol=1e-4, atol=1e-4)
    # push mode: t=1 field differs from the stored per-t estimate
    data = _batch(b=8, t=3, seed=5)
    m.retrieve_metric_all(v, data)
    g_push = np.asarray(m.metric_tensor_field(v, z, 1))
    assert not np.allclose(g_push[0], m.g_list[1], atol=1e-4)
    diag = m.compare_metrics(v, data, t=1)
    assert np.isfinite(diag["frobenius_rel"]) and diag["frobenius_rel"] >= 0


# -- LLDM direct torch parity (round 3: the reference LLDM imports once its
# three unvendored externals are stubbed — tests/reference_utils.py
# import_reference_lldm; parity runs the loss/prior math, which touches no
# stubbed component) ---------------------------------------------------------


@pytest.fixture(scope="module")
def torch_lldm(reference_available):
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    import numpy as _np

    from tests.reference_utils import import_pythae, import_reference_lldm

    mod = import_reference_lldm()
    import_pythae()
    from pythae.models import VAE, VAEConfig
    from pythae.models.lvae_iaf.lvae_iaf_config import LVAE_IAF_Config

    class MockLDM(torch.nn.Module):
        device = torch.device("cpu")

    class MockDDIM:
        def __init__(self, n):
            self.time_steps = _np.arange(0, 1000, 1000 // n)[:n]

    torch.manual_seed(0)
    cfg = LVAE_IAF_Config(
        input_dim=INPUT, latent_dim=6, n_obs_per_ind=4, warmup=0, beta=1.5,
        linear_scheduling_steps=0, prior="standard", posterior="gaussian",
        context_dim=None, reconstruction_loss="mse",
    )
    pre_vae = VAE(VAEConfig(input_dim=INPUT, latent_dim=6))
    ref = mod.LLDM(
        model_config=cfg, encoder=None, decoder=None, pretrained_vae=pre_vae,
        pretrained_ldm=MockLDM(), ddim_sampler=MockDDIM(4),
    )
    ref.train()
    return ref, pre_vae


def _lldm_loss_inputs(seed=0, b=3, t=4, d=6):
    rng = np.random.default_rng(seed)
    return dict(
        recon_x=rng.uniform(size=(b, t, *INPUT)).astype(np.float32),
        x=rng.uniform(size=(b, t, *INPUT)).astype(np.float32),
        mu=rng.normal(size=(b, d)).astype(np.float32),
        log_var=rng.normal(scale=0.3, size=(b, d)).astype(np.float32),
        z0_vi=rng.normal(size=(b, d)).astype(np.float32),
        z_seq=rng.normal(size=(b, t, d)).astype(np.float32),
        z_vi=rng.normal(size=(b, d)).astype(np.float32),
        log_det=rng.normal(scale=0.1, size=(b,)).astype(np.float32),
    )


def test_lldm_sequence_loss_torch_parity(torch_lldm):
    """Direct numerical parity of the sequence-level per-visit loss
    (lldm_model.py:266-329) for a boundary visit with the metric prior, the
    j=0 boundary, and an interior visit, with identical inputs."""
    import torch

    ref, pre_vae = torch_lldm
    inp = _lldm_loss_inputs()
    b, t, d = 3, 4, 6

    # attach the SAME sampled observation metric on both sides
    rng = np.random.default_rng(5)
    c_mu = rng.normal(size=(8, d)).astype(np.float32)
    c_lv = rng.normal(scale=0.3, size=(8, d)).astype(np.float32)
    pre_vae.build_metrics(torch.as_tensor(c_mu), torch.as_tensor(c_lv),
                          T=0.9, lbd=0.01)
    from rlvae_tpu.models.research import SampledMetric

    ours = _lldm(latent_dim=d, n_obs=t, beta=1.5,
                 pretrained_metric=SampledMetric(c_mu, np.exp(-c_lv), 0.9, 0.01))
    v = ours.init(jax.random.PRNGKey(0))

    tt = {k: torch.as_tensor(val) for k, val in inp.items()}
    seq_mask = torch.ones(b, t)
    pix_mask = torch.ones(b * t, int(np.prod(INPUT)))
    for vi in (0, t - 1, 2):
        ref_loss, ref_rec, ref_kld = ref.loss_function(
            tt["recon_x"], tt["x"], tt["mu"], tt["log_var"], tt["z0_vi"],
            tt["z_seq"], vi, tt["z_vi"], tt["log_det"], epoch=7,
            seq_mask=seq_mask, pix_mask=pix_mask,
        )
        our_loss, our_rec, our_kld = ours.loss_function(
            v["params"], jnp.asarray(inp["recon_x"]), jnp.asarray(inp["x"]),
            jnp.asarray(inp["mu"]), jnp.asarray(inp["log_var"]),
            jnp.asarray(inp["z0_vi"]), jnp.asarray(inp["z_seq"]), vi,
            jnp.asarray(inp["z_vi"]), jnp.asarray(inp["log_det"]), epoch=7,
            train=True,
        )
        for name, a, r in (("loss", our_loss, ref_loss),
                           ("recon", our_rec, ref_rec),
                           ("kld", our_kld, ref_kld)):
            a, r = float(a), float(r.detach())
            assert abs(a - r) / (abs(r) + 1e-3) < 1e-4, (
                f"vi={vi} {name}: ours={a} ref={r}"
            )


def test_lldm_warmup_losses_torch_parity(torch_lldm):
    """_vae_loss_function and _vae_iaf_loss_function parity with identical
    inputs (lldm_model.py:160-217)."""
    import torch

    ref, _ = torch_lldm
    b, d = 12, 6
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(b, *INPUT)).astype(np.float32)
    recon = rng.uniform(size=(b, *INPUT)).astype(np.float32)
    mu = rng.normal(size=(b, d)).astype(np.float32)
    lv = rng.normal(scale=0.3, size=(b, d)).astype(np.float32)
    z0 = rng.normal(size=(b, d)).astype(np.float32)
    zk = rng.normal(size=(b, d)).astype(np.float32)
    ld = rng.normal(scale=0.1, size=(b,)).astype(np.float32)
    seq_mask = torch.ones(b)
    pix_mask = torch.ones(b, int(np.prod(INPUT)))

    ours = _lldm(latent_dim=d, n_obs=4)
    v = ours.init(jax.random.PRNGKey(0))

    r = ref._vae_loss_function(torch.as_tensor(recon), torch.as_tensor(x),
                               torch.as_tensor(mu), torch.as_tensor(lv),
                               torch.as_tensor(z0), seq_mask, pix_mask)
    o = ours._vae_loss_function(jnp.asarray(recon), jnp.asarray(x),
                                jnp.asarray(mu), jnp.asarray(lv),
                                jnp.asarray(z0))
    for a, b_ in zip(o, r):
        assert abs(float(a) - float(b_.detach())) / (abs(float(b_)) + 1e-3) < 1e-4

    r = ref._vae_iaf_loss_function(
        torch.as_tensor(recon), torch.as_tensor(x), torch.as_tensor(mu),
        torch.as_tensor(lv), torch.as_tensor(z0), torch.as_tensor(zk),
        torch.as_tensor(ld), 3, seq_mask, pix_mask,
    )
    o = ours._vae_iaf_loss_function(
        v["params"], jnp.asarray(recon), jnp.asarray(x), jnp.asarray(mu),
        jnp.asarray(lv), jnp.asarray(z0), jnp.asarray(zk), jnp.asarray(ld), 3,
    )
    for a, b_ in zip(o, r):
        assert abs(float(a) - float(b_.detach())) / (abs(float(b_)) + 1e-3) < 1e-4


def test_lldm_sampled_metric_matches_real_torch_closure(torch_lldm):
    """SampledMetric.log_pi vs the ACTUAL pythae VAE.build_metrics G_sampl /
    log_pi closures (vae_model.py:266-343) — the real code, not a dense
    re-derivation."""
    import torch

    _, pre_vae = torch_lldm
    d = 6
    rng = np.random.default_rng(2)
    c_mu = rng.normal(size=(10, d)).astype(np.float32)
    c_lv = rng.normal(scale=0.4, size=(10, d)).astype(np.float32)
    pre_vae.build_metrics(torch.as_tensor(c_mu), torch.as_tensor(c_lv),
                          T=0.7, lbd=0.01)
    from rlvae_tpu.models.research import SampledMetric

    metric = SampledMetric(c_mu, np.exp(-c_lv), 0.7, 0.01)
    z = rng.normal(size=(16, d)).astype(np.float32)
    with torch.no_grad():
        ref_logpi = pre_vae.log_pi(torch.as_tensor(z)).numpy()
        ref_g = pre_vae.G_sampl(torch.as_tensor(z)).numpy()
    np.testing.assert_allclose(np.asarray(metric.log_pi(jnp.asarray(z))),
                               ref_logpi, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(metric.g(jnp.asarray(z))), ref_g,
                               rtol=2e-4, atol=1e-6)


# -- RIEM / GUGUS direct torch parity (round 3: stubbed-import of the
# reference modules, tests/reference_utils.import_reference_research) --------


def test_riem_module_math_torch_parity(reference_available):
    """compute_metric/compute_G (riem_model.py:26-55) vs our CentroidMetric
    closures on shared parameters, plus the chol(G)-based sampling transform
    with a shared gamma."""
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")

    from tests.reference_utils import import_reference_research

    mod = import_reference_research("riem.riem_model")
    from rlvae_tpu.geometry import metric as gm
    from rlvae_tpu.geometry.metric import CentroidMetric

    rng = np.random.default_rng(0)
    d, k = 6, 5
    c = rng.normal(size=(k, d)).astype(np.float32)
    a = rng.normal(size=(k, d, d)).astype(np.float32)
    m_tens = (a @ a.transpose(0, 2, 1) + 0.5 * np.eye(d)).astype(np.float32)
    t_, lbd = 1.3, 0.01
    metric = CentroidMetric.create(c, m_tens, temperature=t_, regularization=lbd)
    z = rng.normal(size=(7, d)).astype(np.float32)

    with torch.no_grad():
        ref_gi = mod.compute_metric(torch.as_tensor(z), torch.as_tensor(c),
                                    torch.as_tensor(m_tens), lbd, t_).numpy()
        ref_g = mod.compute_G(torch.as_tensor(z), torch.as_tensor(c),
                              torch.as_tensor(m_tens), lbd, t_).numpy()
    np.testing.assert_allclose(np.asarray(gm.g_inv(metric, jnp.asarray(z))),
                               ref_gi, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm.g(metric, jnp.asarray(z))),
                               ref_g, rtol=2e-3, atol=1e-4)
    # sampling transform z + chol(G) @ (gamma / beta0) with SHARED gamma
    gamma = rng.normal(size=(7, d)).astype(np.float32)
    beta0 = 2.0
    with torch.no_grad():
        l_ref = torch.linalg.cholesky(torch.as_tensor(ref_g))
        ref_s = (torch.as_tensor(z) + (l_ref @ (torch.as_tensor(gamma) / beta0
                 ).unsqueeze(-1)).squeeze(-1)).numpy()
    l_ours = gm.chol_g(metric, jnp.asarray(z))
    ours_s = np.asarray(jnp.asarray(z) + jnp.einsum(
        "bij,bj->bi", l_ours, jnp.asarray(gamma) / beta0))
    np.testing.assert_allclose(ours_s, ref_s, rtol=2e-3, atol=2e-4)


def test_riem_loss_torch_parity(reference_available):
    """Direct parity of RIEM.loss_function (riem_model.py:494-589) incl. the
    metric-volume boundary prior log_p_j_hat, with identical inputs."""
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace

    import numpy as _np

    from tests.reference_utils import import_pythae, import_reference_research

    mod = import_reference_research("riem.riem_model")
    import_pythae()
    from pythae.models import VAE, VAEConfig
    from pythae.models.lvae_iaf.lvae_iaf_config import LVAE_IAF_Config

    from rlvae_tpu.geometry.metric import CentroidMetric
    from rlvae_tpu.models.research import RIEM

    class MockLDM(torch.nn.Module):
        device = torch.device("cpu")

    class MockDDIM:
        def __init__(self, n):
            self.time_steps = _np.arange(0, 1000, 1000 // n)[:n]

    d, t = 6, 4
    rng = np.random.default_rng(3)
    c = rng.normal(size=(5, d)).astype(np.float32)
    a = rng.normal(size=(5, d, d)).astype(np.float32)
    m_tens = (a @ a.transpose(0, 2, 1) + 0.5 * np.eye(d)).astype(np.float32)
    temp, lbd = 1.1, 0.01

    torch.manual_seed(0)
    cfg = LVAE_IAF_Config(
        input_dim=INPUT, latent_dim=d, n_obs_per_ind=t, warmup=0, beta=2.0,
        linear_scheduling_steps=0, prior="standard", posterior="gaussian",
        context_dim=None, reconstruction_loss="mse",
    )
    gm_mock = SimpleNamespace(centroids=torch.as_tensor(c),
                              M_tens=torch.as_tensor(m_tens), lbd=lbd)
    ref = mod.RIEM(
        model_config=cfg, encoder=None, decoder=None,
        pretrained_vae=VAE(VAEConfig(input_dim=INPUT, latent_dim=d)),
        pretrained_ldm=MockLDM(), ddim_sampler=MockDDIM(t),
        GM=gm_mock, temp=temp,
    )
    ref.train()

    ours = RIEM(
        input_dim=INPUT, latent_dim=d, n_obs=t, warmup=0, beta=2.0,
        metric=CentroidMetric.create(c, m_tens, temperature=temp,
                                     regularization=lbd),
    )

    b = 3
    inp = dict(
        recon_x=rng.uniform(size=(b * t, *INPUT)).astype(np.float32),
        x=rng.uniform(size=(b, t, *INPUT)).astype(np.float32),
        mu=rng.normal(size=(b, d)).astype(np.float32),
        log_var=rng.normal(scale=0.3, size=(b, d)).astype(np.float32),
        z0_vi=rng.normal(size=(b, d)).astype(np.float32),
        z_seq=rng.normal(size=(b, t, d)).astype(np.float32),
        z_vi=rng.normal(size=(b, d)).astype(np.float32),
        log_det=rng.normal(scale=0.1, size=(b,)).astype(np.float32),
    )
    tt = {k: torch.as_tensor(v) for k, v in inp.items()}
    for vi in (0, t - 1, 1):
        ref_out = ref.loss_function(
            tt["recon_x"], tt["x"], tt["mu"], tt["log_var"], tt["z0_vi"],
            tt["z_seq"], vi, tt["z_vi"], tt["log_det"], epoch=4,
        )
        our_out = ours.loss_function(
            jnp.asarray(inp["recon_x"]), jnp.asarray(inp["x"]),
            jnp.asarray(inp["mu"]), jnp.asarray(inp["log_var"]),
            jnp.asarray(inp["z0_vi"]), jnp.asarray(inp["z_seq"]), vi,
            jnp.asarray(inp["z_vi"]), jnp.asarray(inp["log_det"]), epoch=4,
            train=True,
        )
        for name, o, r in zip(("loss", "recon", "kl"), our_out, ref_out):
            o, r = float(o), float(r.detach())
            assert abs(o - r) / (abs(r) + 1e-3) < 2e-4, (
                f"vi={vi} {name}: ours={o} ref={r}"
            )


@pytest.fixture(scope="module")
def torch_gugus(reference_available):
    if not reference_available:
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")

    from tests.reference_utils import import_reference_research

    mod = import_reference_research("lvae_gugus.lvaeg2_model")
    from pythae.models.lvae_gugus.lvae_gugus_config import LVAE_GUGUS_Config

    torch.manual_seed(0)
    cfg = LVAE_GUGUS_Config(
        input_dim=INPUT, latent_dim=6, n_obs_per_ind=3, warmup=0,
        linear_scheduling_steps=0, prior="standard", posterior="gaussian",
        context_dim=None, reconstruction_loss="mse", hidden_size=16,
        n_made_blocks=2, n_hidden_in_made=3,
    )
    ref = mod.LVAE_GUGUS(model_config=cfg)
    ref.train()
    return ref


def test_gugus_push_metric_torch_parity(torch_gugus):
    """Metric pushforward through a flow: our vmap(jacfwd) push_metric vs
    the reference's per-sample autograd loop (lvaeg2_model.py:770-794), with
    transferred flow weights."""
    import torch

    from tests.test_flows import _torch_iaf_to_params

    from rlvae_tpu.models.research import LVAE_GUGUS

    ref = torch_gugus
    ours = LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0,
                      hidden_size=16, n_made_blocks=2, n_hidden_in_made=3)
    v = ours.init(jax.random.PRNGKey(0))
    params = dict(v["params"])
    params["flows"] = [_torch_iaf_to_params(f) for f in ref.flows]

    rng = np.random.default_rng(1)
    z = rng.normal(size=(4, 6)).astype(np.float32)
    g0 = np.eye(6, dtype=np.float32) * 1.5
    z_ref, g_ref = ref._push_metric(
        torch.as_tensor(z), torch.as_tensor(g0)[None].expand(4, -1, -1),
        ref.flows[0].inverse,
    )
    z_ours, g_ours = ours.push_metric(params, jnp.asarray(z),
                                      jnp.asarray(g0), 0, direction="inverse")
    np.testing.assert_allclose(np.asarray(z_ours), z_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref.numpy(),
                               rtol=5e-3, atol=1e-4)


def test_gugus_gaussian_metric_prior_torch_parity(torch_gugus):
    """The lvaeg/lvaeg2 full metric-Gaussian prior _log_p_z(z, t=0)
    (lvaeg_model.py _log_p_z) vs our variant='lvaeg' log_p_z on the same
    G0."""
    import torch

    ref = torch_gugus
    rng = np.random.default_rng(2)
    a = rng.normal(size=(6, 6)).astype(np.float32)
    g0 = (a @ a.T + 0.5 * np.eye(6)).astype(np.float32)
    ref.G0 = torch.as_tensor(g0)[None]

    from rlvae_tpu.models.research import LVAE_GUGUS

    ours = LVAE_GUGUS(input_dim=INPUT, latent_dim=6, n_obs=3, warmup=0,
                      hidden_size=16, variant="lvaeg", use_riemann_prior=True)
    v = ours.init(jax.random.PRNGKey(0))
    ours.gm_list, ours.g_list = [np.zeros((1, 6), np.float32)], [g0]

    z = rng.normal(size=(5, 6)).astype(np.float32)
    with torch.no_grad():
        ref_lp = ref._log_p_z(torch.as_tensor(z), t=0).numpy()
    our_lp = np.asarray(ours.log_p_z(v["params"], jnp.asarray(z)))
    np.testing.assert_allclose(our_lp, ref_lp, rtol=1e-4, atol=1e-4)


def test_gugus_sequence_loss_torch_parity(torch_gugus):
    """Direct parity of the GUGUS sequence loss (lvaeg2_model.py:330-342):
    PLAIN-mse reconstruction (no 0.5 — unlike LVAE_IAF), flow-chain log-det
    folded into the metric-Gaussian prior, with identical inputs."""
    import torch

    from rlvae_tpu.models.research import LVAE_GUGUS

    ref = torch_gugus
    rng = np.random.default_rng(4)
    b, t, d = 3, 3, 6
    a = rng.normal(size=(d, d)).astype(np.float32)
    g0 = (a @ a.T + 0.5 * np.eye(d)).astype(np.float32)
    ref.G_list = [torch.as_tensor(g0), None, None]

    ours = LVAE_GUGUS(input_dim=INPUT, latent_dim=d, n_obs=t, warmup=0,
                      hidden_size=16, variant="lvaeg2", use_riemann_prior=True,
                      posterior="gaussian")
    assert ours.recon_scale == 1.0  # GUGUS: plain mse
    assert ours.beta == 5.0 and ref.beta == 5.0  # faithful default
    v = ours.init(jax.random.PRNGKey(0))
    ours.gm_list, ours.g_list = [np.zeros((1, d), np.float32)], [g0]

    recon = rng.uniform(size=(b * t, *INPUT)).astype(np.float32)
    x = rng.uniform(size=(b, t, *INPUT)).astype(np.float32)
    mu = rng.normal(size=(b, d)).astype(np.float32)
    lv = rng.normal(scale=0.3, size=(b, d)).astype(np.float32)
    z0_vi = rng.normal(size=(b, d)).astype(np.float32)
    z_seq = rng.normal(size=(b, t, d)).astype(np.float32)
    z_vi = rng.normal(size=(b, d)).astype(np.float32)
    ld_chain = rng.normal(scale=0.1, size=(b,)).astype(np.float32)
    ld_post = rng.normal(scale=0.1, size=(b,)).astype(np.float32)

    ref_out = ref.loss_function(
        torch.as_tensor(recon), torch.as_tensor(x), torch.as_tensor(mu),
        torch.as_tensor(lv), torch.as_tensor(z0_vi), torch.as_tensor(z_seq),
        torch.as_tensor(z_vi), torch.as_tensor(ld_chain),
        torch.as_tensor(ld_post), epoch=4,
        seq_mask=torch.ones(b, t), pix_mask=torch.ones(b * t, int(np.prod(INPUT))),
    )

    # our forward's loss assembly with the same inputs (lvae_iaf.py:198-208)
    recon_loss = ours._recon_loss(
        jnp.asarray(recon).reshape(b, t, *INPUT), jnp.asarray(x),
        jnp.ones((b, t)), jnp.ones_like(jnp.asarray(x)),
    )
    log_q = jnp.sum(
        -0.5 * (jnp.asarray(lv) + (jnp.asarray(z0_vi) - jnp.asarray(mu)) ** 2
                / (jnp.exp(jnp.asarray(lv)) + 1e-7)), axis=1,
    ) - jnp.asarray(ld_post)
    log_prior = ours.log_p_z(v["params"], jnp.asarray(z_seq[:, 0])) + jnp.asarray(ld_chain)
    kld = log_q - log_prior
    loss = jnp.mean(recon_loss + ours._beta(4, True) * kld)
    for name, o, r in zip(("loss", "recon", "kld"),
                          (loss, jnp.mean(recon_loss), jnp.mean(kld)), ref_out):
        o, r = float(o), float(r.detach())
        assert abs(o - r) / (abs(r) + 1e-3) < 2e-4, f"{name}: ours={o} ref={r}"
