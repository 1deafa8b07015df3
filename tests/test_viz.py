"""Per-module visualization smoke tests.

Each category module runs at FULL level against a real (small) model with a
loaded metric and must produce its named artifacts — including the suites the
reference ships in src/visualizations/: reconstruction analysis (basic.py:274),
enhanced manifold heatmaps + temporal metric analysis (manifold.py:262,367),
fancy geodesics/eigen-ellipse field/curvature landscape
(interactive.py:177,492-723), temporal animation (:930), the embedded-image
latent explorer (:1128), and the flow animation (flow_analysis.py:382)."""

from pathlib import Path

import numpy as np
import pytest

from rlvae_tpu.geometry import load_metric
from rlvae_tpu.models import RlVAE
from rlvae_tpu.viz import VisualizationConfig, VisualizationLevel

DATA = Path(__file__).resolve().parents[1] / "data" / "pretrained"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    metric = load_metric(DATA / "metric_T0.7_scaled.npz", temperature_override=3.0)
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=3, flow_hidden_size=32,
        posterior_type="riemannian_metric", metric=metric,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    x = np.random.default_rng(0).uniform(size=(4, 4, 3, 8, 8)).astype(np.float32)
    cfg = VisualizationConfig(
        level=VisualizationLevel.FULL,
        enable_basic=True, enable_manifold=True,
        enable_interactive=True, enable_flow_analysis=True,
        enable_fancy_plots=True, disable_curvature=False,
        max_sequences=4, log_to_wandb=False,
    )
    out_dir = tmp_path_factory.mktemp("viz")
    return model, variables, x, cfg, out_dir


def _names(paths):
    return {p.name for p in paths if p is not None}


def test_basic_suite(setup):
    from rlvae_tpu.viz.basic import BasicVisualizations

    model, variables, x, cfg, out = setup
    written = BasicVisualizations(cfg, out, None).run(0, model, variables, x)
    names = _names(written)
    assert {"reconstructions.png", "cyclicity.png", "trajectories.png",
            "cyclicity_analysis.png", "reconstruction_analysis.png"} <= names


@pytest.mark.slow
def test_manifold_suite(setup):
    from rlvae_tpu.viz.manifold import ManifoldVisualizations

    model, variables, x, cfg, out = setup
    written = ManifoldVisualizations(cfg, out, None).run(0, model, variables, x)
    names = _names(written)
    assert {"manifold_heatmap.png", "curvature.png", "temporal_metric.png",
            "enhanced_heatmaps.png", "temporal_metric_analysis.png"} <= names


@pytest.mark.slow
def test_interactive_suite(setup):
    from rlvae_tpu.viz.interactive import InteractiveVisualizations

    model, variables, x, cfg, out = setup
    written = InteractiveVisualizations(cfg, out, None).run(0, model, variables, x)
    names = _names(written)
    assert {"sequence_slider.html", "geodesic_slider.html", "metric_slider.html",
            "temporal_animation.html", "latent_space_explorer.html",
            "latent_explorer.html", "fancy_geodesics.png"} <= names
    # explorer embeds per-point images + hover wiring
    html = next(p for p in written if p.name == "latent_space_explorer.html").read_text()
    assert "data:image/png;base64," in html and "mouseenter" in html


def test_flow_analysis_suite(setup):
    from rlvae_tpu.viz.flow_analysis import FlowAnalysisVisualizations

    model, variables, x, cfg, out = setup
    written = FlowAnalysisVisualizations(cfg, out, None).run(0, model, variables, x)
    names = _names(written)
    assert {"flow_jacobians.png", "flow_det_evolution.png", "flow_animation.html"} <= names


def test_viz_failures_logged(setup, tmp_path):
    """A broken category must not kill training AND must reach the logger
    (round-1 weakness: print-swallowed failures)."""
    from rlvae_tpu.viz.manager import VisualizationManager

    model, variables, x, cfg, out = setup

    class Probe:
        def __init__(self):
            self.entries = []

        def log(self, d, step=None):
            self.entries.append(d)

    probe = Probe()
    mgr = VisualizationManager(cfg, tmp_path, probe)

    class Boom:
        def run(self, *a, **k):
            raise RuntimeError("kaboom")

    mgr.modules = [(Boom(), 1)]
    mgr.visualize_epoch(0, model, variables, x)
    assert any("kaboom" in str(e.get("viz/error", "")) for e in probe.entries)
