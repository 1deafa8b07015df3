"""Model integration tests (reference analogue: tests/test_hybrid_model.py,
test_setup.py — forward shapes, finite losses, vanilla degenerate config,
factory behavior)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.config import compose
from rlvae_tpu.models import RlVAE, apply_model_overrides, create_model

CONF = Path(__file__).resolve().parents[1] / "conf"
DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"

SMALL = dict(input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=32)


def _batch(b=2, t=4, dim=(3, 8, 8)):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(size=(b, t, *dim)), jnp.float32)


@pytest.fixture(scope="module")
def gaussian_model():
    model = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, riemannian_beta=0.0,
    )
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


@pytest.fixture(scope="module")
def riemannian_model():
    model = RlVAE(**SMALL, posterior_type="riemannian_metric", sampling_method="geodesic")
    model.load_pretrained_metric(DATA / "metric_T0.7_scaled.npz", temperature_override=3.0)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_forward_shapes_and_losses(gaussian_model):
    model, variables = gaussian_model
    x = _batch()
    out = model.forward(variables, x, jax.random.PRNGKey(1), compute_metrics=True)
    assert out.recon_x.shape == x.shape
    assert out.z.shape == (2, 4, 16)
    for k in ("loss", "recon_loss", "kld_loss", "flow_loss"):
        assert np.isfinite(float(out[k])), k
    assert "cyclicity_error" in out.metrics


def test_riemannian_forward(riemannian_model):
    model, variables = riemannian_model
    x = _batch()
    out = model.forward(variables, x, jax.random.PRNGKey(1), compute_metrics=True)
    assert np.isfinite(float(out.loss))
    assert "metric_conditioning" in out.metrics
    # riemannian KL is the quadratic-form KL, weighted by riemannian_beta
    assert float(out.kld_loss) >= 0.0


def test_forward_jit_and_grad(riemannian_model):
    model, variables = riemannian_model
    x = _batch()

    @jax.jit
    def loss_fn(vs, x, key):
        return model.forward(vs, x, key).loss

    g = jax.jit(jax.grad(lambda vs: loss_fn(vs, x, jax.random.PRNGKey(2))))(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(a)).all() for a in leaves)


def test_closed_loop():
    model = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, loop_mode="closed", loop_penalty=1.0,
    )
    variables = model.init(jax.random.PRNGKey(0))
    out = model.forward(variables, _batch(), jax.random.PRNGKey(1))
    # last latent overwritten by first
    np.testing.assert_array_equal(np.asarray(out.z[:, -1]), np.asarray(out.z[:, 0]))
    assert float(out.loop_penalty) > 0.0


def test_vanilla_no_flows():
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=0,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )
    variables = model.init(jax.random.PRNGKey(0))
    assert variables["params"]["flows"] == []
    out = model.forward(variables, _batch(), jax.random.PRNGKey(1))
    assert float(out.flow_loss) == 0.0
    # all frames decode the same latent
    np.testing.assert_allclose(
        np.asarray(out.recon_x[:, 0]), np.asarray(out.recon_x[:, -1]), atol=1e-6
    )


def test_sampling_methods_all_run(riemannian_model):
    model, variables = riemannian_model
    for method in ("standard", "basic", "enhanced", "geodesic", "official"):
        m2 = RlVAE(
            **SMALL, posterior_type="gaussian", sampling_method=method,
            use_riemannian=True, metric=model.metric,
        )
        out = m2.forward(variables, _batch(), jax.random.PRNGKey(3))
        assert np.isfinite(float(out.loss)), method


def test_prior_sampling_methods(riemannian_model):
    model, _ = riemannian_model
    for method in ("geodesic", "centroid_aware", "weighted_mixture", "basic"):
        z = model.sample_riemannian_prior(jax.random.PRNGKey(4), 6, method)
        assert z.shape == (6, 16)
        assert np.isfinite(np.asarray(z)).all(), method


def test_generate(riemannian_model):
    model, variables = riemannian_model
    x_gen = model.generate(variables, jax.random.PRNGKey(5), 3, n_obs=4)
    assert x_gen.shape == (3, 4, 3, 8, 8)


def test_factory_from_conf():
    cfg = compose(CONF, overrides=["model=vanilla_vae"])
    model = create_model(dict(cfg.model.to_dict()))
    assert model.n_flows == 0 and model.posterior_type == "gaussian"
    assert model.metric is None

    cfg = compose(CONF)
    model = create_model(cfg.model.to_dict())
    assert model.posterior_type == "riemannian_metric"
    # metric artifact exists in data/pretrained -> loaded with T override 3.0
    assert model.metric is not None
    assert float(model.metric.temperature) == 3.0


def test_vanilla_overrides():
    cfg = compose(CONF).model.to_dict()
    vcfg = apply_model_overrides(cfg, "vanilla_vae")
    assert vcfg["n_flows"] == 0
    assert vcfg["posterior"]["type"] == "gaussian"
    assert vcfg["pretrained"]["metric_path"] is None


def test_model_summary(riemannian_model):
    model, variables = riemannian_model
    s = model.get_model_summary(variables)
    assert s["architecture"]["latent_dim"] == 16
    assert s["metric"]["n_centroids"] == 50
    assert s["parameter_count"] > 0


def test_flow_direction_option():
    """TPU-first option: the IAF's parallel (sampling) pass as the temporal map."""
    m = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, flow_direction="sampling",
    )
    variables = m.init(jax.random.PRNGKey(0))
    out = m.forward(variables, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    # direction genuinely changes the temporal map vs density mode
    m2 = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, flow_direction="density",
    )
    out2 = m2.forward(variables, _batch(), jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out.z[:, 1]), np.asarray(out2.z[:, 1]))
    with pytest.raises(ValueError, match="direction"):
        RlVAE(**SMALL, flow_direction="bogus")


def test_cnn_dropout_batchnorm_training():
    """Dropout rngs + BatchNorm stats thread through a training forward."""
    m = RlVAE(
        input_dim=(3, 16, 16), latent_dim=8, n_flows=0,
        posterior_type="gaussian", use_riemannian=False,
        encoder_config={"architecture": "cnn", "layers": [8, 16], "dropout": 0.1},
        decoder_config={"architecture": "cnn", "layers": [16, 8], "dropout": 0.1},
    )
    variables = m.init(jax.random.PRNGKey(0))
    assert variables["stats"]["encoder"]  # batch_stats exist for CNN
    x = _batch(dim=(3, 16, 16))
    out = m.forward(variables, x, jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(out.loss))
    assert out["state_updates"]["encoder"]  # running stats advanced
    # dropout is active in training: different rng -> different loss
    out2 = m.forward(variables, x, jax.random.PRNGKey(2), train=True)
    assert float(out.loss) != float(out2.loss)
    # eval mode is deterministic
    e1 = m.forward(variables, x, jax.random.PRNGKey(1))
    e2 = m.forward(variables, x, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(e1.recon_x), np.asarray(e2.recon_x))


def test_riemannian_nll_metric_posterior_standard_prior():
    """estimate_nll for the riemannian_metric posterior importance-samples
    from the model's ACTUAL sampling distribution N(mu, G^{-1}(mu)) under
    the standard-normal prior — the reference's own Riemannian NLL
    convention (pythae rhvae_model.py:486-496, _log_z is N(0, I)).  The
    once-shipped volume-normalized uniform-on-manifold prior was removed:
    with the lbd*I floor, int sqrt(det G) dz diverges, making that
    estimator proposal-dependent."""
    from rlvae_tpu.geometry import load_metric

    metric = load_metric(DATA / "metric_T0.7_scaled.npz", temperature_override=3.0)
    m = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=32,
        posterior_type="riemannian_metric", metric=metric,
    )
    variables = m.init(jax.random.PRNGKey(0), n_obs=4)
    x = _batch(t=4, dim=(3, 8, 8))
    nll = m.estimate_nll(variables, x, jax.random.PRNGKey(1), n_samples=8)
    assert nll.shape == (x.shape[0],) and np.isfinite(np.asarray(nll)).all()

    # the metric-aware importance distribution genuinely differs from the
    # gaussian-posterior estimator (same prior, different q + samples)
    g = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=32,
        posterior_type="gaussian", use_riemannian=False,
    )
    nll_g = g.estimate_nll(variables, x, jax.random.PRNGKey(1), n_samples=8)
    assert not np.allclose(np.asarray(nll), np.asarray(nll_g))


def test_identity_flow_init_bounds_latents():
    """flow_log_var_bias_init=0.0 (framework option beyond the reference)
    yields near-identity flows at init: |z_t| stays O(|z_0|) instead of the
    reference init's exp(1.5*blocks*t) amplification."""
    kw = dict(input_dim=(3, 8, 8), latent_dim=16, n_flows=4, flow_hidden_size=32,
              posterior_type="gaussian", use_riemannian=False)
    ref_init = RlVAE(**kw)
    ident = RlVAE(**kw, flow_log_var_bias_init=0.0)
    x = _batch(t=5)
    v_r = ref_init.init(jax.random.PRNGKey(0), n_obs=5)
    v_i = ident.init(jax.random.PRNGKey(0), n_obs=5)
    z_r = np.abs(np.asarray(ref_init.forward(v_r, x, jax.random.PRNGKey(1)).z))
    z_i = np.abs(np.asarray(ident.forward(v_i, x, jax.random.PRNGKey(1)).z))
    # reference init amplifies ~e^{1.5*2}=20x per step; identity init doesn't
    assert z_r[:, -1].max() > 50 * z_r[:, 0].max()
    assert z_i[:, -1].max() < 10 * z_i[:, 0].max()


def test_flow_loss_modes_unit():
    """flow_loss 'reference' vs 'volume' semantics on hand-built log-dets."""
    from rlvae_tpu.models import losses

    ld = jnp.asarray([[2.0, -1.0], [0.5, 0.5]])
    ref = float(losses.flow_loss(ld, "reference"))
    vol = float(losses.flow_loss(ld, "volume"))
    assert abs(ref - (-(2.0 - 1.0 + 0.5 + 0.5) / 2.0)) < 1e-6
    assert abs(vol - ((2.0 + 1.0 + 0.5 + 0.5) / 2.0)) < 1e-6
    # empty transitions (vanilla config) -> zero in both modes
    empty = jnp.zeros((4, 0))
    assert float(losses.flow_loss(empty, "reference")) == 0.0
    assert float(losses.flow_loss(empty, "volume")) == 0.0
    with pytest.raises(ValueError):
        RlVAE(**SMALL, flow_loss_mode="nonsense")


def test_flow_loss_volume_mode_stabilizes_training():
    """The reference flow loss -sum logdet REWARDS expansion: training
    drives the MADE log-sigma terms toward the clamp and |z_t| grows
    (the proven source of the flagship's 1e10+ latent norms,
    outputs/curve_parity_flagship/).  flow_loss_mode='volume' penalizes
    |logdet| instead, keeping transitions near volume-preserving — the
    stabilized preset (conf/model/riemannian_flow_vae_stable.yaml)."""
    from rlvae_tpu.train.optim import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    kw = dict(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=32,
        posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, flow_log_var_bias_init=0.0,
    )
    x = _batch(b=8, t=4)

    def train(mode, steps=100):
        model = RlVAE(**kw, flow_loss_mode=mode)
        v = model.init(jax.random.PRNGKey(0), n_obs=4)
        opt = make_optimizer(5e-3, 0.0)
        os_ = opt.init(v["params"])
        step = make_train_step(model, opt)
        for i in range(steps):
            v, os_, _ = step(v, os_, x, jax.random.PRNGKey(i))
        out = model.forward(v, x, jax.random.PRNGKey(999))
        z = np.asarray(out.z)
        return float(out.flow_loss), np.linalg.norm(z[:, -1], axis=-1).mean()

    ref_flow, ref_norm = train("reference")
    vol_flow, vol_norm = train("volume")
    # reference objective exploits the unbounded expansion reward ...
    assert ref_flow < -5.0, ref_flow
    # ... volume mode keeps transitions near volume-preserving and bounded
    assert 0.0 <= vol_flow < 2.0, vol_flow
    assert ref_norm > 3.0 * vol_norm, (ref_norm, vol_norm)


def test_stable_preset_composes():
    """model=riemannian_flow_vae_stable builds through the factory with the
    stabilization knobs active and the rest of the surface identical."""
    cfg = compose(CONF, overrides=["model=riemannian_flow_vae_stable"])
    model = create_model(cfg.model.to_dict())
    assert model.flow_loss_mode == "volume"
    assert model.flow_config.log_var_bias_init == 0.0
    assert model.n_flows == 8 and model.riemannian_beta == 8.0
    assert model.metric is not None  # same pretrained metric wiring


def test_fast_preset_composes():
    """model=riemannian_flow_vae_fast layers the chip-measured HBM harvest
    (fused Pallas decode+MSE + bf16 recon, bench fused_step_ms_b4096) on the
    stable preset; everything else identical to the stable surface."""
    cfg = compose(CONF, overrides=["model=riemannian_flow_vae_fast"])
    model = create_model(cfg.model.to_dict())
    assert model.fused_decode_mse is True
    assert model.flow_loss_mode == "volume"  # stable-preset base
    assert model.flow_config.log_var_bias_init == 0.0
    assert model.n_flows == 8 and model.riemannian_beta == 8.0
    assert model.metric is not None
    # bf16 recon knob reached the decoder (forward-path coverage:
    # test_bf16_recon_dtype_option / test_fused_decode_mse_matches_plain)
    assert model.decoder.out_dtype == jnp.bfloat16


def test_bf16_recon_dtype_option():
    """HBM-traffic knob (nets `out_dtype: bfloat16`): the recon tensor — the
    largest array the train step touches, and the step is HBM-bound on TPU
    (scripts/profile_step_breakdown.py) — is emitted in bf16; the loss
    accumulates in fp32 and must match the fp32 path to bf16 rounding.
    Default (parity) stays fp32."""
    m32 = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False,
    )
    m16 = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, decoder_config={"out_dtype": "bfloat16"},
    )
    variables = m32.init(jax.random.PRNGKey(0))  # same params: out_dtype is
    x = _batch()                                 # compute-dtype only
    o32 = m32.forward(variables, x, jax.random.PRNGKey(1))
    o16 = m16.forward(variables, x, jax.random.PRNGKey(1))
    assert o32.recon_x.dtype == jnp.float32
    assert o16.recon_x.dtype == jnp.bfloat16
    l32, l16 = float(o32.recon_loss), float(o16.recon_loss)
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 2e-2  # bf16 residual rounding only
    # gradients flow and stay finite through the bf16 path
    g = jax.grad(
        lambda p: m16.forward(
            dict(variables, params=p), x, jax.random.PRNGKey(1)
        ).loss
    )(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t, np.float32))) for t in flat)
    # closed-loop weighting path also runs in bf16
    m16c = RlVAE(
        **SMALL, posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, loop_mode="closed",
        decoder_config={"out_dtype": "bfloat16"},
    )
    oc = m16c.forward(variables, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(oc.loss))


def test_remat_decode_exact_parity():
    """remat_decode (HBM-traffic knob: checkpointed decode+MSE, the backward
    recomputes the decode instead of saving recon-sized residuals —
    outputs/step_breakdown/ shows the step is byte-bound): loss, grads AND
    recon_x must be bit-identical to the plain path; it composes with
    out_dtype=bfloat16."""
    common = dict(
        posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False,
    )
    x = _batch()
    key = jax.random.PRNGKey(1)
    for extra in ({}, {"decoder_config": {"out_dtype": "bfloat16"}}):
        m0 = RlVAE(**SMALL, **common, **extra)
        m1 = RlVAE(**SMALL, **common, remat_decode=True, **extra)
        variables = m0.init(jax.random.PRNGKey(0))

        def loss(model, p):
            return model.forward(
                dict(variables, params=p), x, key, train=True).loss

        l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(variables["params"])
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(variables["params"])
        assert float(l0) == float(l1)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
        o0 = m0.forward(variables, x, key, train=True)
        o1 = m1.forward(variables, x, key, train=True)
        assert bool(jnp.all(o0.recon_x == o1.recon_x))
    # factory plumbing
    from rlvae_tpu.models.factory import create_model as _cm

    cfg = compose(CONF, overrides=["model=riemannian_flow_vae_stable"])
    d = cfg.model.to_dict()
    d["remat_decode"] = True
    assert _cm(d).remat_decode is True


def test_fused_decode_mse_matches_plain():
    """fused_decode_mse (the stronger HBM knob: Pallas final-Dense + sigmoid
    + MSE with exact custom VJP, ops/recon_kernels.py — no recon-sized HBM
    tensor at all): loss and grads must match the plain path within the
    kernel's bf16-MXU tolerance; closed-loop frame-0 weighting included.

    Near-identity flow init keeps z bounded: under the reference's
    amplifying init the sigmoid saturates and its derivative s(1-s) ~
    e^{-|pre|} becomes exponentially sensitive to ANY bf16 rounding of the
    pre-activation, so no finite tolerance separates correct from broken
    there — the knob targets the stable preset, which is bounded."""
    common = dict(
        posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False, flow_log_var_bias_init=0.0,
    )
    x = _batch()
    key = jax.random.PRNGKey(1)
    for loop in ("open", "closed"):
        extra = dict(loop_mode=loop, loop_penalty=1.0) if loop == "closed" else {}
        m0 = RlVAE(**SMALL, **common, **extra)
        m1 = RlVAE(**SMALL, **common, fused_decode_mse=True, **extra)
        variables = m0.init(jax.random.PRNGKey(0))

        def loss(model, p):
            return model.forward(
                dict(variables, params=p), x, key, train=True).loss

        l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(variables["params"])
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(variables["params"])
        assert abs(float(l0) - float(l1)) / abs(float(l0)) < 5e-3
        rel = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b)))
            / (float(jnp.max(jnp.abs(a))) + 1e-6),
            g0, g1)
        assert max(jax.tree_util.tree_leaves(rel)) < 5e-2
        # eval path (train=False) is untouched: identical recon_x
        o0 = m0.forward(variables, x, key, train=False)
        o1 = m1.forward(variables, x, key, train=False)
        assert bool(jnp.all(o0.recon_x == o1.recon_x))
    # factory plumbing
    from rlvae_tpu.models.factory import create_model as _cm

    cfg = compose(CONF, overrides=["model=riemannian_flow_vae_stable"])
    d = cfg.model.to_dict()
    d["fused_decode_mse"] = True
    assert _cm(d).fused_decode_mse is True


def test_init_tolerates_missing_pretrained_files(capsys):
    """A config pointing at nonexistent pretrained artifacts must warn and
    train from scratch — the reference's loader degrades on ANY failure
    (encoder_manager.py:260-326); round-3 review fix for FileNotFoundError."""
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=0,
        posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False,
        pretrained_encoder_path="/nonexistent/encoder.npz",
    )
    variables = model.init(jax.random.PRNGKey(0))
    assert "params" in variables
    assert "not loaded" in capsys.readouterr().out
