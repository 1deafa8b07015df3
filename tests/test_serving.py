"""BatchingEngine: correctness of coalescing, padding, ordering, and errors.

The engine is the TPU-native replacement for the reference app's
request-at-a-time serving (reference: app/backend/model_manager.py) — these
tests pin that batching/padding is invisible to callers: every future
resolves to exactly the row its item would produce in a direct call.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlvae_tpu.serving import BatchingEngine, ServeConfig


def _mk_engine(fn=None, **kw):
    if fn is None:
        fn = jax.jit(lambda x: x * 2.0 + jnp.sum(x, axis=tuple(range(1, x.ndim)), keepdims=x.ndim == 2))
    cfg = ServeConfig(**{"buckets": (1, 2, 4, 8), "max_wait_ms": 5.0, **kw})
    return BatchingEngine({"op": fn}, cfg)


def test_row_alignment_under_concurrency(rng):
    """64 concurrent submissions from 8 threads; every result must equal the
    direct per-item computation (batching must be invisible)."""
    fn = jax.jit(lambda x: x * 3.0 - 1.0)
    eng = BatchingEngine({"op": fn}, ServeConfig(buckets=(1, 2, 4, 8), max_wait_ms=3.0))
    try:
        items = [rng.normal(size=(5,)).astype(np.float32) for _ in range(64)]
        futures = [None] * 64

        def worker(lo, hi):
            for i in range(lo, hi):
                futures[i] = eng.submit("op", items[i])

        threads = [threading.Thread(target=worker, args=(i * 8, (i + 1) * 8)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, f in enumerate(futures):
            np.testing.assert_allclose(
                np.asarray(f.result(timeout=30)), items[i] * 3.0 - 1.0, rtol=1e-6, atol=1e-6
            )
        snap = eng.stats.snapshot()
        assert snap["requests"] == 64
        assert snap["batches"] <= 64  # at least some coalescing is allowed
        assert "op_p50_ms" in snap
    finally:
        eng.stop()


def test_bucket_padding_recorded():
    eng = _mk_engine(max_wait_ms=50.0)
    try:
        fs = [eng.submit("op", np.float32([i, i])) for i in range(3)]
        for f in fs:
            f.result(timeout=30)
        snap = eng.stats.snapshot()
        # 3 rows pad to the 4-bucket in one batch (the 50ms window guarantees
        # coalescing on this single-core host)
        assert snap["requests"] == 3
        assert snap["batches"] == 1
        assert snap["batch_size_hist"] == {4: 1}
        assert 0.0 < snap["padding_waste"] <= 0.25
    finally:
        eng.stop()


def test_error_propagates_to_all_waiters():
    def bad(x):
        raise RuntimeError("boom")

    eng = BatchingEngine({"op": bad}, ServeConfig(buckets=(1, 2), max_wait_ms=20.0))
    try:
        fs = [eng.submit("op", np.float32([1.0])) for _ in range(2)]
        for f in fs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(timeout=30)
    finally:
        eng.stop()


def test_unknown_op_rejected():
    eng = _mk_engine()
    try:
        with pytest.raises(KeyError):
            eng.submit("nope", np.zeros(3, np.float32))
    finally:
        eng.stop()


def test_per_request_mode_max_wait_zero():
    eng = _mk_engine(max_wait_ms=0.0)
    try:
        out = eng.run("op", np.float32([1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(out)[..., :2], np.float32([1.0, 2.0]) * 2.0 + 3.0)
    finally:
        eng.stop()


@pytest.mark.slow
def test_from_manager_reconstruct_matches_direct():
    """Engine rows == direct ModelManager compute on a tiny model."""
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.serving import BatchingEngine

    cfg = {
        "name": "vanilla_vae",
        "input_dim": [3, 8, 8],
        "latent_dim": 4,
        "n_flows": 2,
        "flow_hidden_size": 16,
        "encoder": {"architecture": "mlp", "hidden_dims": [16]},
        "decoder": {"architecture": "mlp", "hidden_dims": [16]},
    }
    mgr = ModelManager.from_config(cfg, seed=0)
    # generous window so all submissions coalesce into ONE bucket-4 batch:
    # forward() is stochastic and its noise draw depends on the batch shape,
    # so exact parity with the direct call needs an unpadded bucket-sized batch
    eng = BatchingEngine.from_manager(mgr, ServeConfig(buckets=(1, 2, 4), max_wait_ms=200.0))
    try:
        rng = np.random.default_rng(0)
        seqs = rng.uniform(size=(4, 4, 3, 8, 8)).astype(np.float32)
        futs = [eng.submit("reconstruct", s) for s in seqs]
        got = np.stack([np.asarray(f.result(timeout=300)) for f in futs])
        want = mgr.reconstruct(seqs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert eng.stats.snapshot()["batches"] == 1
        # decode/encode are deterministic and therefore padding-invariant
        z = rng.normal(size=(4,)).astype(np.float32)
        dec = np.asarray(eng.run("decode", z, timeout=300))
        np.testing.assert_allclose(dec, mgr.decode(z[None])[0], rtol=1e-5, atol=1e-5)
        mu = np.asarray(eng.run("encode", seqs[0, 0], timeout=300))
        np.testing.assert_allclose(
            mu, np.asarray(mgr.encode(seqs[0, :1]).embedding)[0], rtol=1e-5, atol=1e-5
        )
    finally:
        eng.stop()


def test_stop_fails_pending_and_rejects_new():
    """stop() must not strand waiters: queued requests fail fast with
    RuntimeError, and submits after stop are rejected immediately."""
    gate = threading.Event()

    def slow(x):
        gate.wait(timeout=10)
        return np.asarray(x) * 2.0

    eng = BatchingEngine({"op": slow}, ServeConfig(buckets=(1,), max_wait_ms=0.0))
    # first request occupies the dispatcher; the rest sit in the queue
    f0 = eng.submit("op", np.float32([1.0]))
    time.sleep(0.05)
    pending = [eng.submit("op", np.float32([float(i)])) for i in range(4)]
    stopper = threading.Thread(target=eng.stop)
    stopper.start()
    time.sleep(0.05)
    gate.set()  # release the in-flight dispatch so stop() can join
    stopper.join(timeout=10)
    assert not stopper.is_alive()
    np.testing.assert_allclose(np.asarray(f0.result(timeout=5)), [2.0])
    for f in pending:
        with pytest.raises(RuntimeError, match="stopped"):
            f.result(timeout=5)
    with pytest.raises(RuntimeError, match="stopped"):
        eng.submit("op", np.float32([0.0]))


@pytest.mark.slow
def test_generate_seeded_batching_matches_direct():
    """Seeded generation through the engine: each item's output equals the
    direct sample_random(1, seed=s) result, INDEPENDENT of how requests
    coalesce or pad (per-row key derivation makes generation batchable)."""
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.serving import BatchingEngine

    cfg = {
        "name": "vanilla_vae",
        "input_dim": [3, 8, 8],
        "latent_dim": 4,
        "n_flows": 2,
        "flow_hidden_size": 16,
        "encoder": {"architecture": "mlp", "hidden_dims": [16]},
        "decoder": {"architecture": "mlp", "hidden_dims": [16]},
    }
    mgr = ModelManager.from_config(cfg, seed=0)
    eng = BatchingEngine.from_manager(
        mgr,
        ServeConfig(buckets=(1, 2, 4), max_wait_ms=200.0),
        generate_n_obs=4,
    )
    try:
        seeds = [7, 123, 7, 999]  # duplicate seed must give duplicate output
        futs = [eng.submit("generate", np.uint32(s)) for s in seeds]
        got = np.stack([np.asarray(f.result(timeout=300)) for f in futs])
        for i, s in enumerate(seeds):
            want = mgr.sample_random(1, seed=s, n_obs=4)[0]
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got[0], got[2], rtol=0, atol=0)
        # a lone (padded-to-bucket) request still returns its exact seed's row
        lone = np.asarray(eng.run("generate", np.uint32(123), timeout=300))
        np.testing.assert_allclose(lone, got[1], rtol=1e-5, atol=1e-5)
    finally:
        eng.stop()


def test_bad_shape_request_does_not_poison_batch():
    """A malformed payload must fail ONLY its own future — co-batched valid
    requests still get their rows (first-batch path: no shapes learned yet)."""
    fn = jax.jit(lambda x: x + 1.0)
    eng = BatchingEngine({"op": fn}, ServeConfig(buckets=(1, 2, 4), max_wait_ms=50.0))
    try:
        good = [eng.submit("op", np.float32([i, i])) for i in range(3)]
        bad = eng.submit("op", np.float32([9.0, 9.0, 9.0]))  # wrong item shape
        for i, f in enumerate(good):
            np.testing.assert_allclose(np.asarray(f.result(timeout=30)), [i + 1.0, i + 1.0])
        with pytest.raises(ValueError, match="shape"):
            bad.result(timeout=30)
        # shape is now learned from the successful dispatch: malformed
        # payloads are rejected at submit() before they can coalesce
        with pytest.raises(ValueError, match="shape"):
            eng.submit("op", np.float32([1.0]))
    finally:
        eng.stop()


def test_warmup_teaches_item_shapes():
    """After warmup, submit() rejects wrong-shaped payloads immediately."""
    eng = _mk_engine(max_wait_ms=0.0)
    try:
        eng.warmup({"op": np.float32([0.0, 0.0])}, buckets=(1,))
        with pytest.raises(ValueError, match="shape"):
            eng.submit("op", np.float32([[1.0, 2.0]]))
        np.testing.assert_allclose(
            np.asarray(eng.run("op", np.float32([1.0, 2.0]), timeout=30)),
            [2.0 + 3.0, 4.0 + 3.0],
        )
    finally:
        eng.stop()


_TINY_CFG = {
    "name": "vanilla_vae",
    "input_dim": [3, 8, 8],
    "latent_dim": 4,
    "n_flows": 2,
    "flow_hidden_size": 16,
    "encoder": {"architecture": "mlp", "hidden_dims": [16]},
    "decoder": {"architecture": "mlp", "hidden_dims": [16]},
}


def test_from_manager_generate_adaptive(monkeypatch):
    """Adaptive generation through the engine: the calibrated plan
    (ModelManager.adaptive_plan, cached) makes method='adaptive' a single
    jittable fixed-eps program, so the engine can batch it like any other
    seeded generation — rows match the direct batched-seeds contract,
    duplicate seeds give duplicate outputs, and ONE calibration serves every
    request (the break-even economics in outputs/adaptive_hmc/summary.json
    `calibration_breakeven` assume exactly this)."""
    from pathlib import Path

    from rlvae_tpu import inference as inf_mod
    from rlvae_tpu.geometry import load_metric
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.samplers import HMCConfig

    metric = load_metric(
        Path(__file__).resolve().parents[1]
        / "data" / "pretrained" / "metric_T0.7_scaled.npz")
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=16,
        posterior_type="riemannian_metric", metric=metric,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    mgr = ModelManager(model, variables)
    # pre-warm a TINY calibrated plan (the production default is a
    # 4096-chain pool — chip-scale work; the cache makes this the one used)
    plan0 = mgr.adaptive_plan(pool_size=16, config=HMCConfig(
        mcmc_steps=8, n_lf=3, init="centroids", backend="xla"))
    # one-calibration contract: any re-calibration attempt during serving
    # is a bug (the plan cache must absorb every request)
    import rlvae_tpu.samplers as samplers_mod

    def _no_recalibrate(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("calibrate_adaptive_plan re-ran during serving")

    monkeypatch.setattr(samplers_mod, "calibrate_adaptive_plan",
                        _no_recalibrate)
    monkeypatch.setattr(inf_mod, "calibrate_adaptive_plan",
                        _no_recalibrate, raising=False)
    eng = BatchingEngine.from_manager(
        mgr, ServeConfig(buckets=(1, 2, 4), max_wait_ms=200.0),
        generate_n_obs=4, generate_method="adaptive",
    )
    try:
        seeds = [7, 123, 7]
        futs = [eng.submit("generate", np.uint32(s)) for s in seeds]
        got = np.stack([np.asarray(f.result(timeout=300)) for f in futs])
        assert got.shape == (3, 4, 3, 8, 8)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got[0], got[2], rtol=0, atol=0)
        want = mgr.sample_random_batched_seeds(seeds, method="adaptive",
                                               n_obs=4)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert mgr.adaptive_plan() is plan0  # cache hit, no re-calibration
    finally:
        eng.stop()


def test_sharded_ops_parity_8_devices():
    """DP serving: make_sharded_ops dispatches each batch SPMD over the
    8-device mesh and every row equals the single-device computation —
    deterministic ops on the non-divisible (pad) path, reconstruct at the
    exact batch shape, generate per-seed regardless of padding."""
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.parallel import create_mesh
    from rlvae_tpu.serving import make_sharded_ops

    mgr = ModelManager.from_config(_TINY_CFG, seed=0)
    mesh = create_mesh()  # all 8 faked CPU devices
    ops = make_sharded_ops(mgr, mesh, generate_n_obs=3)
    rng = np.random.default_rng(0)

    # deterministic ops, n=5: pads to 8 internally, slices back
    frames = rng.uniform(size=(5, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        ops["encode"](frames), np.asarray(mgr.encode(frames).embedding),
        rtol=1e-5, atol=1e-5,
    )
    assert ops["encode"].last_out_ndev == 8  # actually ran SPMD
    z = rng.normal(size=(5, 4)).astype(np.float32)
    np.testing.assert_allclose(ops["decode"](z), mgr.decode(z), rtol=1e-5, atol=1e-5)

    # reconstruct draws noise from the (padded) batch shape: compare at a
    # divisible shape where no padding happens -> exact parity with the
    # single-device forward under the same key
    seqs = rng.uniform(size=(8, 4, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        ops["reconstruct"](seqs), mgr.reconstruct(seqs, seed=0), rtol=1e-5, atol=1e-5
    )
    assert ops["reconstruct"].last_out_ndev == 8

    # generate derives per-row keys from per-row seeds: padding-invariant
    seeds = np.uint32([7, 123, 7, 999, 5])  # n=5 pads to 8
    got = ops["generate"](seeds)
    assert got.shape[0] == 5
    for i, s in enumerate(seeds):
        np.testing.assert_allclose(
            got[i], mgr.sample_random(1, seed=int(s), n_obs=3)[0],
            rtol=1e-4, atol=1e-4,
        )
    np.testing.assert_allclose(got[0], got[2], rtol=0, atol=0)


def test_from_manager_mesh_engine_e2e():
    """The engine over sharded ops: concurrent seeded-generate requests
    coalesce into SPMD dispatches and each future still resolves to exactly
    its seed's row."""
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.parallel import create_mesh
    from rlvae_tpu.serving import BatchingEngine

    mgr = ModelManager.from_config(_TINY_CFG, seed=0)
    mesh = create_mesh()
    eng = BatchingEngine.from_manager(
        mgr, ServeConfig(buckets=(1, 2, 4), max_wait_ms=200.0),
        generate_n_obs=3, mesh=mesh,
    )
    try:
        seeds = [3, 41, 3, 77]
        futs = [eng.submit("generate", np.uint32(s)) for s in seeds]
        got = np.stack([np.asarray(f.result(timeout=300)) for f in futs])
        for i, s in enumerate(seeds):
            np.testing.assert_allclose(
                got[i], mgr.sample_random(1, seed=s, n_obs=3)[0],
                rtol=1e-4, atol=1e-4,
            )
        np.testing.assert_allclose(got[0], got[2], rtol=0, atol=0)
        assert eng.ops["generate"].last_out_ndev == 8
        z = np.random.default_rng(1).normal(size=(4,)).astype(np.float32)
        dec = np.asarray(eng.run("decode", z, timeout=300))
        np.testing.assert_allclose(dec, mgr.decode(z[None])[0], rtol=1e-5, atol=1e-5)
        assert eng.ops["decode"].last_out_ndev == 8
    finally:
        eng.stop()


def test_queue_full_is_explicit_backpressure():
    """A full queue raises instead of blocking while holding the engine
    lock (which would deadlock against the dispatcher's stats update)."""
    gate = threading.Event()

    def slow(x):
        gate.wait(timeout=10)
        return np.asarray(x)

    eng = BatchingEngine({"op": slow},
                         ServeConfig(buckets=(1,), max_wait_ms=0.0,
                                     queue_capacity=2))
    try:
        f0 = eng.submit("op", np.float32([0.0]))  # occupies the dispatcher
        time.sleep(0.05)
        eng.submit("op", np.float32([1.0]))
        eng.submit("op", np.float32([2.0]))
        with pytest.raises(RuntimeError, match="full"):
            eng.submit("op", np.float32([3.0]))
    finally:
        gate.set()
        eng.stop()
