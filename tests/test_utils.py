"""Tests for aux subsystems: profiling, NaN-check debug mode, logging."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.utils.debug import add_nan_checks, assert_finite_tree
from rlvae_tpu.utils.logging import MetricsLogger
from rlvae_tpu.utils.profiling import StepTimer, timed


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.start()
        t.stop()
    m = t.metrics()
    assert set(m) == {"step_time_avg", "step_time_p50", "step_time_p99", "steps_per_sec"}
    assert m["steps_per_sec"] > 0


def test_timed_wrapper():
    f = timed(lambda x: x * 2, sync=False)
    assert f(3) == 6 and f(4) == 8
    assert f.calls == 2 and f.mean_time >= 0


def test_nan_checks_catch():
    f = add_nan_checks(jax.jit(lambda x: jnp.log(x)))
    # fine on positive input
    out = f(jnp.asarray([1.0, 2.0]))
    assert np.isfinite(np.asarray(out)).all()
    # NaN produced -> raises with location info
    with pytest.raises(Exception, match="nan|inf"):
        f(jnp.asarray([-1.0]))


def test_nan_checked_train_step():
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train import make_optimizer
    from rlvae_tpu.train.trainer import make_train_step

    model = RlVAE(input_dim=(3, 4, 4), latent_dim=4, n_flows=0,
                  posterior_type="gaussian", use_riemannian=False)
    variables = model.init(jax.random.PRNGKey(0), n_obs=2)
    opt = make_optimizer(1e-3)
    step = make_train_step(model, opt, nan_checks=True)
    batch = jnp.zeros((2, 2, 3, 4, 4)) + 0.5
    v, o, m = step(variables, opt.init(variables["params"]), batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a"):
        assert_finite_tree({"a": jnp.asarray([jnp.nan])})


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(tmp_path, mode="disabled")
    logger.log({"loss": 1.5, "note": "hi"}, step=3)
    logger.log_table("tbl", [{"model": "a", "x": 1}])
    logger.summary({"best": 0.5})
    logger.finish()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["loss"] == 1.5 and rec["_step"] == 3
    assert json.loads((tmp_path / "tbl.json").read_text())[0]["model"] == "a"
    assert json.loads((tmp_path / "summary.json").read_text())["best"] == 0.5


def test_tsne_separates_clusters():
    """Dependency-free t-SNE (utils/tsne.py): two well-separated Gaussian
    clusters in 16-D stay separated in the 2-D embedding (the reference
    app's latent-exploration t-SNE option)."""
    import numpy as np

    from rlvae_tpu.utils.tsne import tsne

    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 16)) * 0.1
    b = rng.normal(size=(20, 16)) * 0.1 + 4.0
    y = tsne(np.concatenate([a, b]), perplexity=8.0, n_iter=250, seed=1)
    assert y.shape == (40, 2) and np.isfinite(y).all()
    ca, cb = y[:20].mean(0), y[20:].mean(0)
    spread = max(y[:20].std(), y[20:].std())
    assert np.linalg.norm(ca - cb) > 2.0 * spread


def test_tsne_degenerate_inputs():
    import numpy as np

    from rlvae_tpu.utils.tsne import tsne

    assert tsne(np.zeros((2, 4))).shape == (2, 2)  # n <= n_components
    y = tsne(np.ones((8, 4)), n_iter=50)  # all-identical points: finite
    assert np.isfinite(y).all()


def test_umap_lite_separates_clusters():
    """Dependency-free UMAP (utils/umap_lite.py): two well-separated
    Gaussian clusters in 16-D stay separated in the 2-D embedding — closes
    the reference app's PCA/t-SNE/UMAP latent-exploration triple
    (app/components/sidebar.py:109-115; umap-learn is uninstallable here)."""
    import numpy as np

    from rlvae_tpu.utils.umap_lite import umap

    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 16)) * 0.1
    b = rng.normal(size=(20, 16)) * 0.1 + 4.0
    y = umap(np.concatenate([a, b]), n_neighbors=8, n_epochs=150, seed=1)
    assert y.shape == (40, 2) and np.isfinite(y).all()
    ca, cb = y[:20].mean(0), y[20:].mean(0)
    spread = max(y[:20].std(), y[20:].std())
    assert np.linalg.norm(ca - cb) > 2.0 * spread
    # neighborhoods preserved: every point's nearest embedded neighbor is a
    # same-cluster point
    d2 = ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = d2.argmin(1)
    labels = np.repeat([0, 1], 20)
    assert (labels[nn] == labels).mean() > 0.9


def test_umap_lite_determinism_and_degenerate_inputs():
    import numpy as np

    from rlvae_tpu.utils.umap_lite import umap

    rng = np.random.default_rng(2)
    x = rng.normal(size=(30, 8))
    y1 = umap(x, n_epochs=50, seed=3)
    y2 = umap(x, n_epochs=50, seed=3)
    np.testing.assert_array_equal(y1, y2)  # seeded: bit-deterministic

    assert umap(np.zeros((3, 4))).shape == (3, 2)  # n <= n_components + 1
    y = umap(np.ones((10, 4)), n_epochs=30)  # identical points: finite
    assert np.isfinite(y).all()


def test_scan_slope_time_cancels_dispatch_cost():
    """scan_slope_time returns per-call device time with the per-dispatch
    overhead subtracted (the slope of wall-clock vs iteration count), and
    its diagnostics account for the two program runs it measured."""
    import jax.numpy as jnp

    from rlvae_tpu.utils.profiling import scan_slope_time

    batches = jnp.arange(24 * 64, dtype=jnp.float32).reshape(24, 64) / 100.0
    per_call, diag = scan_slope_time(lambda x: jnp.tanh(x), batches,
                                     m_small=4, reps=2)
    assert per_call > 0.0
    assert diag["m_big"] == 24 and diag["m_small"] == 4
    assert diag["t_big_s"] >= per_call * 24 * 0.5  # slope consistent w/ totals
    assert diag["dispatch_overhead_s"] >= 0.0


def test_scan_slope_time_rejects_tiny_stack():
    import jax.numpy as jnp
    import pytest as _pytest

    from rlvae_tpu.utils.profiling import scan_slope_time

    with _pytest.raises(ValueError):
        scan_slope_time(lambda x: x, jnp.ones((4, 2)), m_small=8)


def test_fori_slope_time_one_compile_two_lengths():
    """fori_slope_time measures a per-iteration slope from one compiled
    program driven at two dynamic trip counts."""
    import jax.numpy as jnp

    from rlvae_tpu.utils.profiling import fori_slope_time

    def body(i, carry):
        return carry + jnp.tanh(carry + i.astype(jnp.float32))

    per_iter, diag = fori_slope_time(body, jnp.float32(0.1),
                                     n_small=4, n_big=64, reps=2)
    assert per_iter > 0.0
    assert diag["t_big_s"] >= diag["t_small_s"] * 0.5
    assert diag["dispatch_overhead_s"] >= 0.0
