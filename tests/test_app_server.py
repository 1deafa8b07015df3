"""HTTP-driving test for the live research app server (rlvae_tpu/app_server.py).

Covers the reference Streamlit app's capability surface (reference:
app/pages/*, app/backend/experiment_runner.py:32,394): all six pages render,
a training run launches in a thread with LIVE metric streaming over the API,
and the inference/exploration endpoints serve real model outputs from the
finished run."""

import json
import time
import urllib.request

import pytest


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
        body = r.read()
        return r.status, body


def _get_json(port, path):
    status, body = _get(port, path)
    assert status == 200, body[:200]
    return json.loads(body)


def _post_json(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from rlvae_tpu.app_server import serve

    outputs = tmp_path_factory.mktemp("app_outputs")
    srv, state = serve(outputs, port=0, block=False)
    yield srv.server_address[1], outputs
    srv.shutdown()


def test_pages_render(server):
    port, _ = server
    from rlvae_tpu.app_server import PAGES

    status, body = _get(port, "/")
    assert status == 200 and b"rlvae_tpu research app" in body
    for page in PAGES:
        status, body = _get(port, f"/page/{page}")
        assert status == 200 and b"<nav>" in body, page


def test_threaded_training_with_live_progress_and_inference(server):
    port, outputs = server
    overrides = [
        "model=vanilla_vae", "training=quick", "visualization=minimal",
        "training.trainer.max_epochs=1", "training.trainer.log_every_n_steps=1",
        "training.n_train_samples=8", "training.n_val_samples=4",
        "data.synthetic_n_train=8", "data.synthetic_n_test=4",
        "data.image_size=[4,4]", "model.n_flows=0", "training.model.n_flows=0",
    ]
    run_id = _post_json(port, "/api/experiments", {"overrides": overrides})["id"]

    saw_running = False
    deadline = time.time() + 300
    progress = None
    while time.time() < deadline:
        progress = _get_json(port, f"/api/experiments/{run_id}/progress")
        if progress["status"] == "running":
            saw_running = True
        if progress["status"] in ("completed", "failed"):
            break
        time.sleep(1.0)
    assert progress is not None and progress["status"] == "completed", progress
    assert saw_running or progress["n_records"] > 0
    # live metric records streamed through the progress callback
    assert progress["n_records"] > 0
    keys = {k for r in progress["records"] for k in r}
    assert any(k.startswith("train/") or k.startswith("val/") for k in keys)
    # incremental polling works
    tail = _get_json(
        port, f"/api/experiments/{run_id}/progress?since={progress['n_records'] - 1}"
    )
    assert len(tail["records"]) == 1

    # run registered + inference endpoints serve model outputs
    runs = _get_json(port, "/api/runs")
    run_name = f"app_{run_id}"
    entry = next(r for r in runs if r["name"] == run_name)
    assert entry["has_checkpoint"] and entry["has_results"]

    rec = _get_json(port, f"/api/model/{run_name}/reconstruct?n=2")
    assert len(rec["rows"]) == 4 and all(len(r) > 0 for r in rec["rows"])
    gen = _get_json(port, f"/api/model/{run_name}/generate?n=2")
    assert len(gen["rows"]) == 2
    lat = _get_json(port, f"/api/model/{run_name}/latents")
    assert len(lat["points"]) > 0
    assert {"x", "y", "seq", "t", "img"} <= set(lat["points"][0])
    # the full reference embedding triple: PCA (default above), t-SNE, UMAP
    lat_u = _get_json(port, f"/api/model/{run_name}/latents?method=umap")
    assert len(lat_u["points"]) == len(lat["points"])
    info = _get_json(port, f"/api/model/{run_name}/info")
    assert info["architecture"]["latent_dim"] == 16

    # experiment list + gallery respond
    exps = _get_json(port, "/api/experiments")
    assert any(e["id"] == run_id for e in exps)
    _get_json(port, "/api/gallery")

    # serving observability: reconstruct went through the batching engine,
    # so its stats must show the dispatched requests
    serving = _get_json(port, "/api/serving")
    assert run_name in serving, serving
    # reconstruct (2 items) AND seeded generate (2 items) both flow
    # through the batching engine
    assert serving[run_name]["requests"] >= 4
    assert serving[run_name]["batches"] >= 2
    assert "generate_p50_ms" in serving[run_name], serving[run_name]


def test_artifact_path_traversal_blocked(server):
    port, _ = server
    try:
        status, _ = _get(port, "/artifact?path=../../etc/passwd")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status in (403, 500)


def test_stop_experiment_checkpoints_resumably(server):
    """POST /api/experiment/<id>/stop cancels a threaded run at the next
    epoch boundary through the trainer's resumable-checkpoint exit."""
    port, outputs = server
    overrides = [
        "model=vanilla_vae", "training=quick", "visualization=minimal",
        "training.trainer.max_epochs=50", "training.trainer.log_every_n_steps=1",
        "training.n_train_samples=8", "training.n_val_samples=4",
        "data.synthetic_n_train=8", "data.synthetic_n_test=4",
        "data.image_size=[4,4]", "model.n_flows=0", "training.model.n_flows=0",
    ]
    run_id = _post_json(port, "/api/experiments", {"overrides": overrides})["id"]

    # wait until the run produced at least one record, then request the stop
    deadline = time.time() + 300
    while time.time() < deadline:
        p = _get_json(port, f"/api/experiments/{run_id}/progress")
        if p["n_records"] >= 1:
            break
        assert p["status"] == "running", p
        time.sleep(0.3)
    out = _post_json(port, f"/api/experiment/{run_id}/stop", {})
    assert out["stop_requested"] is True

    while time.time() < deadline:
        p = _get_json(port, f"/api/experiments/{run_id}/progress")
        if p["status"] != "running":
            break
        time.sleep(0.3)
    assert p["status"] == "stopped", p
    assert p["stop_requested"] is True
    # far fewer epochs ran than requested, and the resumable slot exists
    from pathlib import Path

    run_dir = Path(p["run_dir"])
    assert (run_dir / "checkpoints" / "last").exists()
    # unknown id -> 404 error payload
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _post_json(port, "/api/experiment/nope/stop", {})


def test_export_endpoint_writes_loadable_bundle(server):
    """POST /api/model/<run>/export writes an AOT bundle that load_exported
    can serve (uses the run trained by the threaded-training test)."""
    port, outputs = server
    runs = _get_json(port, "/api/runs")
    run_name = next(r["name"] for r in runs if r["has_checkpoint"])
    out = _post_json(port, f"/api/model/{run_name}/export",
                     {"ops": ["decode"], "buckets": [2]})
    assert out["ops"] == ["decode"] and out["buckets"] == [2]

    import numpy as np

    from rlvae_tpu.export import load_exported

    loaded = load_exported(out["out_dir"])
    d = loaded.manifest["latent_dim"]
    y = loaded.run("decode", np.zeros((2, d), np.float32))
    assert y.shape[0] == 2 and np.all(np.isfinite(y))


def test_generate_accepts_negative_seed(server):
    """seed=-1 worked on the pre-engine path (PRNGKey takes negative ints);
    the engine path masks to uint32 instead of overflowing on numpy>=2."""
    port, _ = server
    runs = _get_json(port, "/api/runs")
    run_name = next(r["name"] for r in runs if r["has_checkpoint"])
    gen = _get_json(port, f"/api/model/{run_name}/generate?n=2&seed=-1")
    assert len(gen["rows"]) == 2


def test_interpolate_endpoint_modes(server):
    """GET /api/model/<run>/interpolate decodes a latent path; the vanilla
    training run has no metric, so 'geodesic' degrades to a clean JSON
    error while linear/spherical serve frames."""
    port, _ = server
    runs = _get_json(port, "/api/runs")
    run_name = next(r["name"] for r in runs if r["has_checkpoint"])
    for mode in ("linear", "spherical"):
        out = _get_json(port, f"/api/model/{run_name}/interpolate?mode={mode}&steps=5")
        assert out["mode"] == mode and out["steps"] == 5
        assert len(out["rows"]) == 1 and len(out["rows"][0]) == 5
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(port, f"/api/model/{run_name}/interpolate?mode=geodesic")
    err = json.loads(exc.value.read())
    assert "metric" in err["error"]


def test_serve_mesh_engine_dispatches_spmd(tmp_path):
    """AppState(serve_mesh=True) builds its per-run engines over the full
    device mesh: one inference request dispatches SPMD across all 8 faked
    devices (serving.make_sharded_ops wiring)."""
    import numpy as np

    from rlvae_tpu.app_server import AppState
    from rlvae_tpu.inference import ModelManager

    cfg = {
        "name": "vanilla_vae",
        "input_dim": [3, 8, 8],
        "latent_dim": 4,
        "n_flows": 2,
        "flow_hidden_size": 16,
        "encoder": {"architecture": "mlp", "hidden_dims": [16]},
        "decoder": {"architecture": "mlp", "hidden_dims": [16]},
    }
    state = AppState(tmp_path, serve_mesh=True)
    mgr = ModelManager.from_config(cfg, seed=0)
    state.manager = lambda run: mgr
    state.sample_batch = lambda run, n: np.zeros((n, 3, 3, 8, 8), np.float32)
    eng = state.engine("fake_run")
    try:
        assert eng.ops["generate"].mesh is not None
        row = np.asarray(eng.run("generate", np.uint32(7), timeout=300))
        assert row.shape == (3, 3, 8, 8) and np.isfinite(row).all()
        assert eng.ops["generate"].last_out_ndev == 8
    finally:
        eng.stop()
