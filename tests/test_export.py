"""Ahead-of-time export (rlvae_tpu/export.py): StableHLO round-trip.

The deployment artifact must reproduce the live ModelManager's outputs and
serve through the BatchingEngine without any model code (the reference ships
its full source tree + cloudpickle to every serving host instead —
app/backend/model_manager.py, base_model.py:174-213).
"""

import json

import numpy as np
import pytest

from rlvae_tpu.export import export_model, load_exported
from rlvae_tpu.inference import ModelManager

TINY = {
    "name": "vanilla_vae",
    "input_dim": [3, 8, 8],
    "latent_dim": 4,
    "n_flows": 2,
    "flow_hidden_size": 16,
    "encoder": {"architecture": "mlp", "hidden_dims": [16]},
    "decoder": {"architecture": "mlp", "hidden_dims": [16]},
}


@pytest.fixture(scope="module")
def manager():
    return ModelManager.from_config(TINY, seed=0)


def test_decode_roundtrip_quick(manager, tmp_path):
    """Smallest slice: one deterministic op, one bucket, full round-trip."""
    export_model(manager, tmp_path, ops=("decode",), buckets=(4,), n_obs=4)
    loaded = load_exported(tmp_path)
    z = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    got = loaded.run("decode", z)
    np.testing.assert_allclose(got, manager.decode(z), rtol=1e-5, atol=1e-5)
    # padding dispatches to the bucket and slices back; decode is
    # deterministic so rows are exact
    got2 = loaded.run("decode", z[:3])
    np.testing.assert_allclose(got2, manager.decode(z[:3]), rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="exceeds"):
        loaded.run("decode", np.zeros((5, 4), np.float32))
    with pytest.raises(KeyError):
        loaded.run("nope", z)


@pytest.mark.slow
def test_full_bundle_parity_and_engine(manager, tmp_path):
    manifest = export_model(
        manager, tmp_path,
        ops=("reconstruct", "encode", "decode", "generate"),
        buckets=(1, 4), n_obs=4,
    )
    assert set(manifest["programs"]) == {"reconstruct", "encode", "decode", "generate"}
    on_disk = json.loads((tmp_path / "manifest.json").read_text())
    assert on_disk == json.loads(json.dumps(manifest))

    loaded = load_exported(tmp_path)
    rng = np.random.default_rng(1)
    seqs = rng.uniform(size=(4, 4, 3, 8, 8)).astype(np.float32)

    # reconstruct: exact at exact-bucket batch sizes (forward's noise draw
    # depends on the traced batch shape, exactly like the live jit path)
    np.testing.assert_allclose(
        loaded.run("reconstruct", seqs), manager.reconstruct(seqs, seed=0),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        loaded.run("reconstruct", seqs[:1]), manager.reconstruct(seqs[:1], seed=0),
        rtol=1e-5, atol=1e-5,
    )
    # encode: deterministic, padding-invariant
    np.testing.assert_allclose(
        loaded.run("encode", seqs[:3, 0]),
        np.asarray(manager.encode(seqs[:3, 0]).embedding),
        rtol=1e-5, atol=1e-5,
    )
    # generate: per-row seeded keys make it padding-invariant too
    seeds = np.asarray([7, 123, 7], np.uint32)
    gen = loaded.run("generate", seeds)
    for i, s in enumerate(seeds):
        np.testing.assert_allclose(
            gen[i], manager.sample_random(1, seed=int(s), n_obs=4)[0],
            rtol=1e-4, atol=1e-4,
        )
    np.testing.assert_allclose(gen[0], gen[2], rtol=0, atol=0)

    # the artifact serves through the BatchingEngine with no model code
    from rlvae_tpu.serving import BatchingEngine, ServeConfig

    eng = BatchingEngine(loaded.as_ops(), ServeConfig(buckets=(1, 4), max_wait_ms=50.0))
    try:
        futs = [eng.submit("decode", rng.normal(size=(4,)).astype(np.float32))
                for _ in range(4)]
        outs = [np.asarray(f.result(timeout=300)) for f in futs]
        assert all(o.shape == tuple(manager.model.input_dim) for o in outs)
    finally:
        eng.stop()


def test_weight_swap_without_reexport(manager, tmp_path):
    """A newer checkpoint's variables drop into a loaded bundle and change
    the outputs to match — programs are weight-agnostic."""
    export_model(manager, tmp_path, ops=("decode",), buckets=(2,), n_obs=4)
    loaded = load_exported(tmp_path)
    other = ModelManager.from_config(TINY, seed=1)
    z = np.random.default_rng(2).normal(size=(2, 4)).astype(np.float32)
    before = loaded.run("decode", z)
    loaded.set_weights(other.variables)
    after = loaded.run("decode", z)
    np.testing.assert_allclose(after, other.decode(z), rtol=1e-5, atol=1e-5)
    assert not np.allclose(before, after)
    with pytest.raises(ValueError, match="leaves"):
        loaded.set_weights({"params": {}})
    # dtype mismatches must fail AT SWAP TIME, not as an opaque aval error
    # at the first run() after the swap
    import jax

    bf16 = jax.tree_util.tree_map(
        lambda l: np.asarray(l).astype("bfloat16"), other.variables
    )
    with pytest.raises(ValueError, match="dtype"):
        loaded.set_weights(bf16)


def test_multi_platform_bundle(manager, tmp_path):
    """platforms=('cpu','tpu') lowers one program that runs on either backend
    (executed here on CPU; the same bytes load on a TPU host)."""
    m = export_model(manager, tmp_path, ops=("decode",), buckets=(2,), n_obs=4,
                     platforms=("cpu", "tpu"))
    assert m["platforms"] == ["cpu", "tpu"]
    loaded = load_exported(tmp_path)
    z = np.random.default_rng(0).normal(size=(2, 4)).astype(np.float32)
    np.testing.assert_allclose(loaded.run("decode", z), manager.decode(z),
                               rtol=1e-5, atol=1e-5)


def test_format_version_enforced(manager, tmp_path):
    export_model(manager, tmp_path, ops=("decode",), buckets=(1,), n_obs=4)
    m = json.loads((tmp_path / "manifest.json").read_text())
    m["format_version"] = 999
    (tmp_path / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(ValueError, match="unsupported export format"):
        load_exported(tmp_path)


def test_bundle_server_serves_over_http(manager, tmp_path):
    """The standalone deployment host (bundle + jax only) serves the
    exported programs over HTTP with dynamic batching."""
    import json
    import urllib.request

    from rlvae_tpu.bundle_server import serve_bundle

    export_model(manager, tmp_path, ops=("decode",), buckets=(1, 4), n_obs=4)
    httpd, engine = serve_bundle(tmp_path, port=0, max_wait_ms=20.0)
    port = httpd.server_address[1]
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
                return json.loads(r.read())

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        ops = get("/ops")
        assert ops["ops"] == {"decode": [1, 4]}
        assert ops["manifest"]["latent_dim"] == 4

        z = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
        out = post("/v1/decode", {"items": z.tolist()})
        got = np.asarray(out["outputs"], np.float32)
        np.testing.assert_allclose(got, manager.decode(z), rtol=1e-5, atol=1e-5)
        stats = get("/stats")
        assert stats["requests"] == 3

        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            post("/v1/nope", {"items": [[0.0]]})
        with pytest.raises(urllib.error.HTTPError):
            post("/v1/decode", {"items": []})
    finally:
        httpd.shutdown()
        engine.stop()


def test_int8_weight_only_quantized_export(manager, tmp_path):
    """quantize='int8' stores Dense kernels as int8+scales (smaller bundle),
    dequantizes in-program, re-quantizes on weight swap, and stays within a
    tight quality gate of the fp32 outputs."""
    out_f = tmp_path / "f32"
    out_q = tmp_path / "int8"
    export_model(manager, out_f, ops=("decode",), buckets=(4,), n_obs=4)
    m = export_model(
        manager, out_q, ops=("decode",), buckets=(4,), n_obs=4, quantize="int8"
    )
    assert m["quantization"]["mode"] == "int8"
    assert len(m["quantization"]["leaf_indices"]) >= 2  # the Dense kernels
    size_f = (out_f / "weights.npz").stat().st_size
    size_q = (out_q / "weights.npz").stat().st_size
    assert size_q < size_f, (size_q, size_f)

    loaded = load_exported(out_q)
    z = np.random.default_rng(3).normal(size=(4, 4)).astype(np.float32)
    got = loaded.run("decode", z)
    ref = manager.decode(z)
    # weight-only int8 on sigmoid outputs in [0, 1]
    assert np.max(np.abs(got - ref)) < 0.05, np.max(np.abs(got - ref))
    assert np.mean(np.abs(got - ref)) < 0.01

    # weight swap re-quantizes under the exported plan
    loaded.set_weights(manager.variables)
    np.testing.assert_allclose(loaded.run("decode", z), got, rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="unknown quantization mode"):
        export_model(manager, tmp_path / "bad", ops=("decode",), buckets=(4,),
                     n_obs=4, quantize="int4")
