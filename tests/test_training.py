"""Trainer tests: optimization semantics, scheduling, end-to-end fit on tiny
shapes, checkpoint round-trip, and the data-parallel step on the faked
8-device mesh (the distributed test tier the reference lacks, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlvae_tpu.data import CyclicDataModule
from rlvae_tpu.models import RlVAE
from rlvae_tpu.parallel import batch_sharding, create_mesh, replicate
from rlvae_tpu.train import (
    EarlyStopping,
    PlateauScheduler,
    Trainer,
    get_lr,
    make_optimizer,
    make_train_step,
)

DATA_CFG = {
    "sequence_length": 4,
    "image_size": [8, 8],
    "channels": 3,
    "synthetic_fallback": True,
    "synthetic_n_train": 16,
    "synthetic_n_test": 8,
}

TRAIN_CFG = {
    "trainer": {"max_epochs": 2, "devices": 1, "log_every_n_steps": 2},
    "data": {"batch_size": 4},
    "optimizer": {"lr": 1e-3, "weight_decay": 1e-4},
    "scheduler": {"factor": 0.5, "patience": 1, "min_lr": 1e-6},
    "early_stopping": {"patience": 5, "min_delta": 0.0},
    "n_train_samples": 16,
    "n_val_samples": 8,
}


def _tiny_model():
    return RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=2, flow_hidden_size=16,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )


def test_plateau_scheduler():
    s = PlateauScheduler(factor=0.5, patience=1, threshold=0.0)
    lr = 1.0
    lr = s.step(10.0, lr)
    assert lr == 1.0
    lr = s.step(10.0, lr)  # bad epoch 1
    assert lr == 1.0
    lr = s.step(10.0, lr)  # bad epoch 2 > patience -> reduce
    assert lr == 0.5
    lr = s.step(1.0, lr)  # improvement
    assert lr == 0.5


def test_early_stopping():
    es = EarlyStopping(patience=2, min_delta=0.0)
    assert not es.update(5.0)
    assert not es.update(6.0)
    assert es.update(7.0)  # two bad epochs


def test_train_step_reduces_loss():
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(variables["params"])
    step = make_train_step(model, optimizer)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(size=(4, 4, 3, 8, 8)), jnp.float32)
    losses = []
    for i in range(20):
        variables, opt_state, metrics = step(
            variables, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 1.0, f"no progress: {losses[0]} -> {losses[-1]}"
    assert get_lr(opt_state) == pytest.approx(1e-3)


def test_fit_end_to_end(tmp_path):
    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    dm.setup(TRAIN_CFG)
    trainer = Trainer(model, dm, TRAIN_CFG, run_dir=tmp_path)
    result = trainer.fit()
    assert result["epochs_run"] == 2
    assert np.isfinite(result["best_val_loss"])
    assert (tmp_path / "checkpoints" / "best").exists()
    assert (tmp_path / "checkpoints" / "last").exists()
    assert (tmp_path / "metrics.jsonl").exists()
    # checkpoint round-trip
    restored = trainer.checkpoints.restore("best")
    assert "variables" in restored
    test_metrics = trainer.evaluate("test", variables=result["variables"])
    assert np.isfinite(test_metrics["loss"])


def test_data_parallel_step_8_devices():
    """DP over the faked 8-device mesh: loss/params must match the 1-device
    run exactly (same global batch, psum-reduced grads)."""
    assert jax.device_count() == 8
    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(variables["params"])
    step = make_train_step(model, optimizer)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(size=(16, 4, 3, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(5)

    def grads_of(vs, b):
        return jax.jit(
            jax.grad(lambda p: model.forward({**vs, "params": p}, b, key, train=True).loss)
        )(vs["params"])

    # single-device result
    v1, o1, m1 = step(variables, opt_state, batch, key)
    g1 = grads_of(model.init(jax.random.PRNGKey(0), n_obs=4), batch)

    # 8-device sharded result
    mesh = create_mesh()
    assert mesh.devices.size == 8
    v_r = replicate(mesh, model.init(jax.random.PRNGKey(0), n_obs=4))
    o_r = replicate(mesh, optimizer.init(v_r["params"]))
    sharded = jax.device_put(batch, batch_sharding(mesh))
    v8, o8, m8 = step(v_r, o_r, sharded, key)
    g8 = grads_of(replicate(mesh, model.init(jax.random.PRNGKey(0), n_obs=4)), sharded)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    # psum-reduced gradients must match the single-device global-batch grads
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        scale = max(1e-3, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4 * scale
        )
    # and the updated params stay fully replicated across the mesh
    first_leaf = jax.tree_util.tree_leaves(v8["params"])[0]
    assert first_leaf.sharding.is_fully_replicated


def test_epoch_jit_sharded_8_devices(tmp_path):
    """Whole-epoch compiled training over the faked 8-device mesh: the epoch
    must run as one dispatch with shard-local shuffles, produce finite
    decreasing loss, and keep params exactly replicated across devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rlvae_tpu.train import make_epoch_fn_sharded

    assert jax.device_count() == 8
    mesh = create_mesh()
    # flow-free vanilla config: its loss decreases monotonically on a fixed
    # batch, so progress is a machinery check, not a dynamics bet (the flow
    # models' total loss genuinely rises early — flow expansion, ROADMAP)
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=0,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )
    variables = replicate(mesh, model.init(jax.random.PRNGKey(0), n_obs=4))
    optimizer = make_optimizer(1e-3)
    opt_state = replicate(mesh, optimizer.init(variables["params"]))
    epoch_fn = make_epoch_fn_sharded(model, optimizer, mesh)

    rng = np.random.default_rng(0)
    n_dev, n_local, local_bs = 8, 8, 2
    data = jax.device_put(
        jnp.asarray(rng.uniform(size=(n_dev * n_local, 4, 3, 8, 8)), jnp.float32),
        NamedSharding(mesh, P("data")),
    )
    # fixed indices every step: repeated steps on the same global batch must
    # reduce its loss (optimization machinery, not SGD variance)
    steps = 10
    perm = np.tile(
        np.arange(local_bs, dtype=np.int32)[None, None, :], (steps, n_dev, 1)
    )
    perm = jax.device_put(jnp.asarray(perm), NamedSharding(mesh, P(None, "data", None)))
    losses = []
    for epoch in range(2):
        variables, opt_state, metrics = epoch_fn(
            variables, opt_state, data, perm, jax.random.PRNGKey(epoch)
        )
        fetched = jax.device_get(metrics)
        assert fetched["loss"].shape == (steps,)
        assert np.all(np.isfinite(fetched["loss"]))
        losses.extend(fetched["loss"].tolist())
    assert losses[-1] < losses[0] - 1.0, f"no progress: {losses[0]} -> {losses[-1]}"
    # params stay replicated (identical across all 8 devices)
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_trainer_epoch_jit_multidevice(tmp_path):
    """Trainer.fit with devices=8 takes the sharded epoch-jit path end-to-end."""
    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    cfg = {
        **TRAIN_CFG,
        "trainer": {**TRAIN_CFG["trainer"], "devices": 8},
        "data": {"batch_size": 8},
    }
    dm.setup(cfg)
    trainer = Trainer(model, dm, cfg, run_dir=tmp_path)
    assert trainer.epoch_jit and trainer.n_devices == 8
    result = trainer.fit()
    assert result["epochs_run"] == 2
    assert np.isfinite(result["best_val_loss"])
    # epoch coverage: the compiled epoch must step through (rows-per-device
    # * n_dev) // global_bs batches — i.e. the whole dataset up to shard
    # truncation, not a process-count-shrunken fraction (round-3 review fix)
    n_rows = len(dm.train)
    expected_steps = ((n_rows // 8) * 8) // dm.batch_size
    variables = trainer.model.init(jax.random.PRNGKey(0))
    from rlvae_tpu.parallel import replicate as _rep

    variables = _rep(trainer.mesh, variables)
    opt_state = _rep(trainer.mesh, trainer.optimizer.init(variables["params"]))
    _, _, _, n = trainer._run_epoch_jit(variables, opt_state, 0, jax.random.PRNGKey(1))
    assert n == expected_steps, (n, expected_steps, n_rows)


@pytest.mark.slow
def test_dryrun_multichip():
    """The driver-contract dryrun end to end (~10 min of XLA compiles on the
    1-core host — slow tier; `make dryrun` runs the same function, and each
    path it integrates has a dedicated quick test: DP step
    (test_data_parallel_step_8_devices), sharded epoch-jit
    (test_trainer_epoch_jit_multidevice), DPxTP
    (test_dp_tp_hybrid_loss_and_grad_parity), DPxEP chain
    (tests/test_metric_parallel.py), chunked epochs
    (test_sharded_chunked_matches_resident_epoch)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dp_tp_hybrid_loss_and_grad_parity():
    """A 4x2 (data x model) mesh with the big MLP kernels sharded over the
    model axis must produce the same train step as single-device: the layout
    changes, the math must not."""
    import optax

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.parallel import (
        batch_sharding,
        create_mesh,
        param_shardings,
        shard_params,
    )
    from rlvae_tpu.train import make_optimizer, make_train_step

    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=32,
        posterior_type="gaussian", use_riemannian=False,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    optimizer = make_optimizer(1e-3, 0.0)
    opt_state = optimizer.init(variables["params"])
    batch = jnp.asarray(
        np.random.default_rng(0).uniform(size=(8, 4, 3, 8, 8)), jnp.float32
    )
    key = jax.random.PRNGKey(1)

    step = make_train_step(model, optimizer)
    # real copies: the step donates its inputs
    v_ref = jax.tree_util.tree_map(jnp.array, variables)
    v1, _, m1 = step(v_ref, optimizer.init(variables["params"]), batch, key)

    mesh = create_mesh(n_devices=8, model_parallel=2)
    specs = {
        str(s.spec)
        for s in jax.tree_util.tree_leaves(param_shardings(mesh, variables["params"]))
    }
    assert any("model" in s for s in specs), f"nothing sharded over model: {specs}"
    v_tp = shard_params(mesh, variables)
    o_tp = shard_params(mesh, optimizer.init(variables["params"]))
    b_tp = jax.device_put(batch, batch_sharding(mesh))
    step_tp = make_train_step(model, optimizer)
    v2, _, m2 = step_tp(v_tp, o_tp, b_tp, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=2e-3
    )
    # post-Adam params: near-zero grads can flip update sign (+-lr) under
    # cross-shard reduction order at step 1, so allow 2*lr absolute slack
    for a, b in zip(
        jax.tree_util.tree_leaves(v1["params"]), jax.tree_util.tree_leaves(v2["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5e-3)


def test_multihost_staging_parity_8_devices():
    """The multi-host staging path (parallel/multihost.py:
    make_array_from_process_local_data + host-replicated seeded perms) must
    train bit-for-bit identically to the old device_put staging — the swap
    that un-gated epoch-jit from process_count==1 changes layout plumbing,
    not math."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rlvae_tpu.parallel.multihost import (
        epoch_perm,
        stage_dataset,
        usable_local_rows,
    )
    from rlvae_tpu.train import make_epoch_fn_sharded

    mesh = create_mesh()
    n_dev, n_local, local_bs, steps = 8, 4, 2, 2
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=0,
        posterior_type="gaussian", sampling_method="standard", use_riemannian=False,
    )
    init = model.init(jax.random.PRNGKey(0), n_obs=4)
    optimizer = make_optimizer(1e-3)
    epoch_fn = make_epoch_fn_sharded(model, optimizer, mesh)
    rows = np.random.default_rng(1).uniform(
        size=(n_dev * n_local, 4, 3, 8, 8)
    ).astype(np.float32)
    assert usable_local_rows(mesh, len(rows)) == len(rows)

    # reference numpy perm identical to epoch_perm's (seed+epoch rng, one
    # permutation per device column)
    rng = np.random.default_rng(7 + 0)
    perm_np = np.stack(
        [rng.permutation(n_local)[: steps * local_bs].reshape(steps, local_bs)
         for _ in range(n_dev)], axis=1,
    ).astype(np.int32)

    def run(data, perm):
        variables = replicate(mesh, jax.tree_util.tree_map(jnp.copy, init))
        opt_state = replicate(mesh, optimizer.init(variables["params"]))
        variables, opt_state, m = epoch_fn(
            variables, opt_state, data, perm, jax.random.PRNGKey(3)
        )
        return jax.device_get(variables["params"]), jax.device_get(m["loss"])

    p_old, l_old = run(
        jax.device_put(jnp.asarray(rows), NamedSharding(mesh, P("data"))),
        jax.device_put(jnp.asarray(perm_np), NamedSharding(mesh, P(None, "data", None))),
    )
    p_new, l_new = run(
        stage_dataset(mesh, rows),
        epoch_perm(mesh, seed=7, epoch=0, n_steps=steps,
                   local_bs=local_bs, shard_len=n_local),
    )
    np.testing.assert_array_equal(l_old, l_new)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_old, p_new)
    # determinism across "hosts": same seed -> identical global perm content
    a = np.asarray(epoch_perm(mesh, 7, 0, steps, local_bs, n_local))
    np.testing.assert_array_equal(a, perm_np)


def test_resolve_num_devices_clamps_to_available():
    """A devices request beyond the host's real count must clamp (an
    unclamped value would disagree with the mesh create_mesh actually
    builds and corrupt the sharded-epoch batch/step math)."""
    from rlvae_tpu.parallel import resolve_num_devices

    assert resolve_num_devices(64) == jax.device_count()
    assert resolve_num_devices(1) == 1
    assert resolve_num_devices("all") == jax.device_count()
    assert resolve_num_devices(None) == 1


def test_fit_dataset_smaller_than_batch(tmp_path):
    """A dataset smaller than the batch size yields zero steps per epoch;
    fit() must survive (regression: the epoch-jit path crashed indexing
    the empty stacked metrics)."""
    cfg = {
        **TRAIN_CFG,
        "trainer": {**TRAIN_CFG["trainer"], "max_epochs": 1},
        "data": {"batch_size": 32},
        "n_train_samples": 4,
        "n_val_samples": 8,
    }
    data = CyclicDataModule(DATA_CFG)
    data.setup(cfg)
    t = Trainer(_tiny_model(), data, cfg, run_dir=tmp_path)
    result = t.fit()
    assert np.isfinite(result["best_val_loss"])


@pytest.mark.slow
def test_real_multiprocess_cluster(tmp_path):
    """REAL 2-process verification of the multi-host path (scripts/
    multihost_verify.py): forms an actual jax.distributed cluster on
    localhost (2 procs x 4 fake CPU devices, Gloo collectives) and asserts
    (1) the 2-process DP step numerically equals the single-process
    8-device run of the same global batch, (2) both processes report
    bit-identical results, (3) stage_dataset + epoch_perm +
    make_epoch_fn_sharded execute cross-process with finite decreasing
    losses.  Subprocess-based: the simulated-split staging test above
    cannot catch cross-process collective or addressability bugs."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    env = {**os.environ, "MH_VERIFY_PORT": "9741"}
    # children must NOT inherit this test process's 8-device XLA flag
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [_sys.executable, "scripts/multihost_verify.py"],
        capture_output=True, text=True, timeout=850,
        cwd=str(Path(__file__).resolve().parents[1]), env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert '"checks"' in proc.stdout


def test_preemption_sigterm_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training stops at the epoch boundary, writes the
    resumable 'last' checkpoint, and fit(resume=True) finishes the
    remaining epochs (TPU-pod eviction / SLURM requeue story)."""
    import os
    import signal

    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    cfg = {**TRAIN_CFG, "trainer": {**TRAIN_CFG["trainer"], "max_epochs": 4}}
    dm.setup(cfg)
    trainer = Trainer(model, dm, cfg, run_dir=tmp_path)

    fired = {"n": 0}
    orig = trainer.callbacks.on_epoch_end

    def eviction(cfg_, **kw):
        if fired["n"] == 0:
            fired["n"] = 1
            os.kill(os.getpid(), signal.SIGTERM)  # delivered to our handler
        return orig(cfg_, **kw)

    trainer.callbacks.on_epoch_end = eviction
    result = trainer.fit()
    assert result["preempted"] is True
    assert result["epochs_run"] == 1  # stopped at the first epoch boundary
    assert (tmp_path / "checkpoints" / "last").exists()
    # the prior SIGTERM handler is restored after fit
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.SIG_IGN) or callable(
        signal.getsignal(signal.SIGTERM)
    )

    trainer2 = Trainer(_tiny_model(), dm, cfg, run_dir=tmp_path)
    result2 = trainer2.fit(resume=True)
    assert result2["preempted"] is False
    assert result2["epochs_run"] == 4  # epochs 1..3 after resume
    assert np.isfinite(result2["best_val_loss"])
    # the running best-val carries across the preemption: a resumed epoch
    # can only improve it, never overwrite 'best' with a worse model
    assert result2["best_val_loss"] <= result["best_val_loss"] + 1e-6
    # and the global step counter continues instead of restarting at 0
    assert result2["steps"] > result["steps"]


def _fit_chunked(tmp_path, chunk_steps, tag):
    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    cfg = {
        **TRAIN_CFG,
        "trainer": {**TRAIN_CFG["trainer"],
                    "epoch_jit_chunk_steps": chunk_steps},
    }
    dm.setup(cfg)
    trainer = Trainer(model, dm, cfg, run_dir=tmp_path / tag, seed=7)
    assert trainer.chunk_steps == chunk_steps
    result = trainer.fit()
    return result


def test_chunked_epoch_is_chunk_size_invariant(tmp_path):
    """Larger-than-HBM path: the per-step key schedule makes the training
    trajectory BIT-identical for any chunk size (16 rows / bs 4 = 4 steps;
    chunk 3 exercises the remainder program too)."""
    r1 = _fit_chunked(tmp_path, 1, "c1")
    r3 = _fit_chunked(tmp_path, 3, "c3")
    assert r1["epochs_run"] == r3["epochs_run"] == 2
    assert np.isfinite(r1["best_val_loss"])
    assert r1["best_val_loss"] == r3["best_val_loss"]
    h1 = [m["train/loss"] for m in r1["history"] if "train/loss" in m]
    h3 = [m["train/loss"] for m in r3["history"] if "train/loss" in m]
    assert h1 and h1 == h3


def test_eval_jit_matches_per_batch_loop(tmp_path):
    """Compiled whole-split eval (one scan dispatch) is bit-identical to the
    per-batch loop, including the odd-sized remainder batch and the
    batch-size-weighted average."""
    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    cfg = {**TRAIN_CFG, "data": {"batch_size": 3}}  # val 8 -> 3,3,2 batches
    dm.setup(cfg)
    t_jit = Trainer(model, dm, cfg, run_dir=tmp_path / "a", seed=3)
    cfg_loop = {**cfg, "trainer": {**cfg["trainer"], "eval_jit": False}}
    t_loop = Trainer(model, dm, cfg_loop, run_dir=tmp_path / "b", seed=3)
    assert t_jit._eval_fn is not None and t_loop._eval_fn is None

    variables = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(11)
    a = t_jit.evaluate(split="val", key=key, variables=variables)
    b = t_loop.evaluate(split="val", key=key, variables=variables)
    assert set(a) == set(b) and "loss" in a
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])

    # larger-than-HBM mode: eval stages at most chunk_steps batches per
    # dispatch and still matches bit-for-bit
    cfg_chunk = {**cfg, "trainer": {**cfg["trainer"], "epoch_jit_chunk_steps": 1}}
    t_chunk = Trainer(model, dm, cfg_chunk, run_dir=tmp_path / "c", seed=3)
    c = t_chunk.evaluate(split="val", key=key, variables=variables)
    assert c == a


def test_sharded_chunked_matches_resident_epoch(tmp_path):
    """Chunked sharded epoch (larger-than-mesh-HBM datasets) is BIT-identical
    to the resident sharded epoch on the 8-device mesh: same staging
    shuffle, same shard-local permutations, same per-device key carry."""
    def fit(chunk_steps, tag):
        model = _tiny_model()
        dm = CyclicDataModule(DATA_CFG)
        cfg = {
            **TRAIN_CFG,
            "data": {"batch_size": 8},
            "trainer": {**TRAIN_CFG["trainer"], "devices": 8,
                        **({"epoch_jit_chunk_steps": chunk_steps}
                           if chunk_steps else {})},
        }
        dm.setup(cfg)
        t = Trainer(model, dm, cfg, run_dir=tmp_path / tag, seed=5)
        assert t.n_devices == 8 and t.epoch_jit
        return t.fit()

    resident = fit(0, "resident")
    chunked = fit(1, "chunk1")
    assert resident["epochs_run"] == chunked["epochs_run"] == 2
    assert resident["best_val_loss"] == chunked["best_val_loss"]
    h_res = [m["train/loss"] for m in resident["history"] if "train/loss" in m]
    h_chk = [m["train/loss"] for m in chunked["history"] if "train/loss" in m]
    assert h_res and h_res == h_chk


def test_stop_flag_set_before_fit_runs_zero_epochs(tmp_path):
    """A cancelled comparison/sweep must not train a full epoch of every
    remaining model: the stop flag is polled at epoch ENTRY."""
    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    dm.setup(TRAIN_CFG)
    trainer = Trainer(model, dm, TRAIN_CFG, run_dir=tmp_path,
                      stop_flag=lambda: True)
    result = trainer.fit()
    assert result["preempted"] is True
    assert result["epochs_run"] == 0


def test_preemption_handler_restored_on_exception(tmp_path):
    """An exception mid-fit must not leak the SIGTERM handler."""
    import signal

    model = _tiny_model()
    dm = CyclicDataModule(DATA_CFG)
    dm.setup(TRAIN_CFG)
    trainer = Trainer(model, dm, TRAIN_CFG, run_dir=tmp_path)

    def boom(cfg_, **kw):
        raise RuntimeError("boom")

    trainer.callbacks.on_epoch_begin = boom
    before = signal.getsignal(signal.SIGTERM)
    with pytest.raises(RuntimeError, match="boom"):
        trainer.fit()
    assert signal.getsignal(signal.SIGTERM) == before


def test_epoch_keys_program_cached():
    from rlvae_tpu.parallel import create_mesh
    from rlvae_tpu.train.trainer import _epoch_keys_fn

    mesh = create_mesh(n_devices=8)
    assert _epoch_keys_fn(mesh) is _epoch_keys_fn(mesh)
