"""Training loop — the Lightning replacement.

Replaces LightningRlVAETrainer + the Lightning Trainer wiring (reference:
src/training/lightning_trainer.py:19-318, run_experiment.py:262-304): a jitted
train/eval step under data-parallel shardings over a ``jax.sharding.Mesh``,
an epoch loop with validation cadence, ReduceLROnPlateau, EarlyStopping,
best/last checkpoints, metric logging, and epoch-end visualization hooks.

TPU-first mechanics:
- ONE compiled program per step (forward + grad + Adam update + batch-stats
  merge); donated state so params update in place in HBM,
- batch placed with a NamedSharding over the data axis; XLA inserts the psum
  gradient reduction over ICI (the communication backend replacing "none"),
- host work per step is a dict of scalar fetches, batched per log interval.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlvae_tpu.data.cyclic import CyclicDataModule
from rlvae_tpu.models.rlvae import RlVAE
from rlvae_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    resolve_num_devices,
)
from rlvae_tpu.train.checkpoints import CheckpointManager
from rlvae_tpu.train.optim import (
    EarlyStopping,
    PlateauScheduler,
    get_lr,
    make_optimizer,
    set_lr,
)
from rlvae_tpu.utils.logging import MetricsLogger


def _merge_stats(variables, out):
    if "state_updates" in out:
        upd = out["state_updates"]
        stats = dict(variables["stats"])
        for k in ("encoder", "decoder"):
            if upd.get(k):
                stats[k] = upd[k]
        variables = {**variables, "stats": stats}
    return variables


def _device_prefetch(batches, sharding, n_devices, depth: int = 2):
    """Stage host batches onto the device ahead of consumption so the
    host->device transfer overlaps the previous step's compute."""
    import collections

    queue = collections.deque()
    for batch in batches:
        if batch.shape[0] % n_devices != 0:
            continue  # drop remainder for even sharding
        # device_put on the HOST array places each shard directly on its
        # device; jnp.asarray first would stage the full batch on device 0
        # and then redistribute (an extra HBM stage + inter-device copy)
        queue.append(jax.device_put(batch, sharding))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _step_body(model, optimizer, variables, opt_state, batch, key,
               pmean_axis=None):
    """The shared forward/grad/update/metrics step body used by
    make_train_step, make_epoch_fn, and make_epoch_fn_sharded (one source of
    truth; ``pmean_axis`` inserts the DP reductions of the shard_map path)."""

    def loss_fn(params):
        vs = {**variables, "params": params}
        out = model.forward(vs, batch, key, train=True)
        return out.loss, out

    (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    if pmean_axis is not None:
        grads = jax.lax.pmean(grads, pmean_axis)
    metrics = {
        "loss": out.loss,
        "recon_loss": out.recon_loss,
        "kld_loss": out.kld_loss,
        "flow_loss": out.flow_loss,
        "loop_penalty": out.loop_penalty,
    }
    if pmean_axis is not None:
        metrics = jax.lax.pmean(metrics, pmean_axis)
    metrics["grad_norm"] = optax.global_norm(grads)
    updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)
    if pmean_axis is not None and "state_updates" in out:
        # BN running stats are per-shard; average them so every replica
        # carries identical state
        out = {**out, "state_updates": jax.lax.pmean(out["state_updates"], pmean_axis)}
    variables = _merge_stats({**variables, "params": new_params}, out)
    return variables, opt_state, metrics


def make_train_step(model: RlVAE, optimizer, nan_checks: bool = False) -> Callable:
    def train_step(variables, opt_state, batch, key):
        return _step_body(model, optimizer, variables, opt_state, batch, key)

    if nan_checks:
        # debug mode: checkify float checks pinpoint the first NaN/Inf op;
        # donation is disabled so buffers survive for the error report
        from jax.experimental import checkify

        checked = jax.jit(checkify.checkify(train_step, errors=checkify.float_checks))

        def wrapper(variables, opt_state, batch, key):
            err, out = checked(variables, opt_state, batch, key)
            err.throw()
            return out

        return wrapper

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_epoch_fn(model: RlVAE, optimizer) -> Callable:
    """Whole-epoch compiled training: ONE host dispatch per epoch.

    The training set lives in HBM; the epoch is a ``lax.scan`` over a
    [steps, batch] index matrix that gathers each batch on device.  This
    removes the per-step host->device transfer and dispatch latency that
    dominates wall-clock on the axon runtime (measured: ~600 ms/step wall vs
    ~5 ms/step device compute with the per-step loop).  Single-process DP
    path; the per-step loop remains for multi-device meshes (arbitrary-index
    gathers across a sharded batch axis would insert all-gathers)."""

    def epoch_fn(variables, opt_state, data, perm, key):
        def body(carry, idx):
            variables, opt_state, key = carry
            key, k_step = jax.random.split(key)
            batch = jnp.take(data, idx, axis=0)
            variables, opt_state, metrics = _step_body(
                model, optimizer, variables, opt_state, batch, k_step
            )
            return (variables, opt_state, key), metrics

        (variables, opt_state, _), metrics = jax.lax.scan(
            body, (variables, opt_state, key), perm
        )
        return variables, opt_state, metrics  # metrics leaves stacked [steps]

    return jax.jit(epoch_fn, donate_argnums=(0, 1))


def make_epoch_fn_chunked(model: RlVAE, optimizer) -> Callable:
    """Compiled multi-step training over one HBM-staged CHUNK of the epoch.

    For datasets larger than device HBM the whole-epoch scan of
    :func:`make_epoch_fn` cannot stage the training set residently.  This
    variant scans over ``[S, bs, ...]`` pre-gathered batches and per-step
    PRNG keys passed as scan inputs — no resident dataset, one compiled
    program reused for every same-shape chunk, and the trainer double-buffers
    the next chunk's host->HBM transfer behind the current chunk's compute
    (Trainer._run_epoch_jit_chunked).  Because the key schedule is
    precomputed per STEP (``jax.random.split(epoch_key, n_steps)``), the
    training trajectory is bit-identical for ANY chunk size.
    """

    def chunk_fn(variables, opt_state, batches, keys):
        def body(carry, xs):
            variables, opt_state = carry
            batch, k_step = xs
            variables, opt_state, metrics = _step_body(
                model, optimizer, variables, opt_state, batch, k_step
            )
            return (variables, opt_state), metrics

        (variables, opt_state), metrics = jax.lax.scan(
            body, (variables, opt_state), (batches, keys)
        )
        return variables, opt_state, metrics  # metrics leaves stacked [S]

    return jax.jit(chunk_fn, donate_argnums=(0, 1))


def make_epoch_fn_sharded(model: RlVAE, optimizer, mesh) -> Callable:
    """Whole-epoch compiled training over a multi-device data mesh.

    Extends :func:`make_epoch_fn`'s one-dispatch-per-epoch design to DP
    meshes.  The naive port (``jnp.take`` across a batch-sharded dataset)
    would make XLA all-gather the dataset every step, so instead the epoch
    runs under ``shard_map``: each device owns a dataset shard in its HBM
    (a seeded GLOBAL permutation is applied once at staging, so shards are
    random subsets) and scans over a *local* permutation of it — the
    shard-then-shuffle scheme distributed input pipelines use; samples do
    not migrate between shards across epochs (the price of keeping the
    dataset resident; reference has no analogue — single device pinned,
    SURVEY.md §2c).  Gradients/metrics are
    ``pmean``-reduced over ICI inside the scan body; params and optimizer
    state stay replicated, so every device applies the identical update.

    Per-device RNG: the epoch key is folded with ``axis_index('data')`` so
    posterior-sampling noise differs across shards (same stream semantics as
    sharding a globally-generated noise batch).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from rlvae_tpu.parallel.mesh import DATA_AXIS

    def epoch_fn(variables, opt_state, data, perm, key):
        # data: [N, ...] sharded over DATA_AXIS; perm: [steps, n_dev, local_bs]
        # with LOCAL indices, sharded over its middle axis; everything else
        # replicated.
        def local_epoch(variables, opt_state, local_data, local_perm, key):
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))

            def body(carry, idx):
                variables, opt_state, key = carry
                key, k_step = jax.random.split(key)
                batch = jnp.take(local_data, idx[0], axis=0)
                variables, opt_state, metrics = _step_body(
                    model, optimizer, variables, opt_state, batch, k_step,
                    pmean_axis=DATA_AXIS,
                )
                return (variables, opt_state, key), metrics

            (variables, opt_state, _), metrics = jax.lax.scan(
                body, (variables, opt_state, key), local_perm
            )
            return variables, opt_state, metrics

        return shard_map(
            local_epoch,
            mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(None, DATA_AXIS, None), P()),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )(variables, opt_state, data, perm, key)

    return jax.jit(epoch_fn, donate_argnums=(0, 1))


def _eval_metrics(model: RlVAE, variables, batch, key):
    out = model.forward(variables, batch, key, train=False, compute_metrics=True)
    metrics = {
        "loss": out.loss,
        "recon_loss": out.recon_loss,
        "kld_loss": out.kld_loss,
        "flow_loss": out.flow_loss,
    }
    metrics.update(out.get("metrics", {}))
    return metrics


@functools.lru_cache(maxsize=8)
def _epoch_keys_fn(mesh):
    """Jitted per-mesh program behind :func:`init_epoch_keys` (cached on
    function identity — a fresh closure per call would retrace every
    epoch)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from rlvae_tpu.parallel.mesh import DATA_AXIS

    def f(k):
        return jax.random.fold_in(k[0], jax.lax.axis_index(DATA_AXIS))[None]

    return jax.jit(
        shard_map(f, mesh=mesh, in_specs=P(), out_specs=P(DATA_AXIS),
                  check_rep=False)
    )


def init_epoch_keys(mesh, key):
    """Per-device epoch key carry, sharded over the data axis: device i holds
    ``fold_in(key, i)`` — the exact key the resident sharded epoch derives
    inside its shard_map (make_epoch_fn_sharded.local_epoch)."""
    return _epoch_keys_fn(mesh)(key[None])


def make_epoch_fn_sharded_chunked(model: RlVAE, optimizer, mesh) -> Callable:
    """Chunked variant of :func:`make_epoch_fn_sharded` for datasets larger
    than the mesh's combined HBM.

    Scans ``[S, n_dev, local_bs, ...]`` pre-gathered batches (sharded over
    the data axis) instead of a resident dataset; the per-device PRNG key is
    an explicit carry threaded BETWEEN chunk calls, and the in-chunk
    split/step sequence matches the resident path exactly — so a chunked
    epoch is bit-identical to the resident sharded epoch fed the same
    permutation (tested), and to itself under any chunk size."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from rlvae_tpu.parallel.mesh import DATA_AXIS

    def chunk_fn(variables, opt_state, batches, keys):
        def local_chunk(variables, opt_state, local_batches, key):
            def body(carry, batch):
                variables, opt_state, k = carry
                k, k_step = jax.random.split(k)
                variables, opt_state, metrics = _step_body(
                    model, optimizer, variables, opt_state, batch, k_step,
                    pmean_axis=DATA_AXIS,
                )
                return (variables, opt_state, k), metrics

            (variables, opt_state, k), metrics = jax.lax.scan(
                body, (variables, opt_state, key[0]), local_batches[:, 0]
            )
            return variables, opt_state, metrics, k[None]

        return shard_map(
            local_chunk,
            mesh=mesh,
            in_specs=(P(), P(), P(None, DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P(), P(DATA_AXIS)),
            check_rep=False,
        )(variables, opt_state, batches, keys)

    return jax.jit(chunk_fn, donate_argnums=(0, 1))


def make_eval_step(model: RlVAE) -> Callable:
    def eval_step(variables, batch, key):
        return _eval_metrics(model, variables, batch, key)

    return jax.jit(eval_step)


def make_eval_fn(model: RlVAE) -> Callable:
    """Whole-split compiled evaluation: one ``lax.scan`` dispatch over the
    staged full-size batches (the same per-batch dispatch + device fetch
    that dominates training wall-clock on this runtime dominates validation
    too).  Per-batch keys come in as scan inputs so results are
    bit-identical to the per-batch loop."""

    def eval_fn(variables, batches, keys):
        def body(_, xs):
            batch, k = xs
            return None, _eval_metrics(model, variables, batch, k)

        _, metrics = jax.lax.scan(body, None, (batches, keys))
        return metrics  # leaves stacked [S]

    return jax.jit(eval_fn)


class Trainer:
    """Epoch-driven trainer with validation, scheduling, early stop, and hooks."""

    def __init__(
        self,
        model: RlVAE,
        data_module: CyclicDataModule,
        training_config: Mapping[str, Any],
        run_dir: str | Path = "outputs/run",
        logger: Optional[MetricsLogger] = None,
        viz_hook: Optional[Callable] = None,
        seed: int = 42,
        callbacks: Optional[list] = None,
        stop_flag: Optional[Callable[[], bool]] = None,
    ):
        from rlvae_tpu.train.callbacks import CallbackHandler

        self.model = model
        self.data = data_module
        self.cfg = dict(training_config)
        self.run_dir = Path(run_dir)
        self.logger = logger or MetricsLogger(self.run_dir)
        self.viz_hook = viz_hook
        self.seed = seed
        self.callbacks = CallbackHandler(callbacks)

        trainer_cfg = self.cfg.get("trainer", {})
        self.max_epochs = int(trainer_cfg.get("max_epochs", 30))
        self.log_every = int(trainer_cfg.get("log_every_n_steps", 10))
        n_dev = resolve_num_devices(trainer_cfg.get("devices", 1))
        # DP x TP hybrid: trainer.model_parallel > 1 shards the big MLP
        # kernels over the 'model' axis (parallel/sharding.param_shardings)
        self.model_parallel = int(trainer_cfg.get("model_parallel", 1))
        self.mesh = create_mesh(n_devices=n_dev, model_parallel=self.model_parallel)
        self.n_devices = n_dev

        opt_cfg = self.cfg.get("optimizer", {})
        self.optimizer = make_optimizer(
            float(opt_cfg.get("lr", 1e-3)), float(opt_cfg.get("weight_decay", 0.0))
        )
        self.scheduler = PlateauScheduler.from_config(self.cfg.get("scheduler", {}))
        self.early_stopping = EarlyStopping.from_config(self.cfg.get("early_stopping", {}))
        self.checkpoints = CheckpointManager(
            self.run_dir / "checkpoints", model.get_model_summary()
        )

        self._train_step = make_train_step(
            model, self.optimizer, nan_checks=bool(self.cfg.get("debug_nan_checks", False))
        )
        self._eval_step = make_eval_step(model)
        # whole-split compiled eval (one scan dispatch instead of a dispatch
        # + device fetch per batch); single-device — DP eval keeps the
        # sharded per-batch loop
        self._eval_fn = (
            make_eval_fn(model)
            if n_dev == 1 and bool(trainer_cfg.get("eval_jit", True))
            else None
        )
        # whole-epoch compiled path: on by default (single-device scans the
        # HBM-staged dataset; multi-device runs shard-local shuffles under
        # shard_map — see make_epoch_fn_sharded).  TP meshes and nan-check
        # debugging keep the per-step loop (checkify needs per-step reports).
        self.epoch_jit = (
            bool(trainer_cfg.get("epoch_jit", True))
            and self.model_parallel == 1
            and not self.cfg.get("debug_nan_checks", False)
        )
        if n_dev > 1 and int(getattr(self.data, "batch_size", 0)) % n_dev != 0:
            self.epoch_jit = False  # uneven shards; per-step loop drops remainders
        # larger-than-HBM datasets: epoch_jit_chunk_steps > 0 switches the
        # single-device epoch to compiled chunk scans with double-buffered
        # staging (multi-device large datasets instead spread the resident
        # set across the mesh's HBM via the sharded path)
        self.chunk_steps = int(trainer_cfg.get("epoch_jit_chunk_steps", 0))
        # multi-host runs use the same sharded epoch path: each process
        # stages its local rows with jax.make_array_from_process_local_data
        # and every host computes the identical seeded permutation
        # (parallel/multihost.py) — no gate on jax.process_count()
        if not self.epoch_jit:
            self._epoch_fn = None
        elif n_dev == 1 and self.chunk_steps > 0:
            self._epoch_fn = make_epoch_fn_chunked(model, self.optimizer)
        elif n_dev == 1:
            self._epoch_fn = make_epoch_fn(model, self.optimizer)
        elif self.chunk_steps > 0:
            # larger-than-mesh-HBM datasets: chunked scans sharded over the
            # data axis, any process count (each host stages only its own
            # devices' chunk columns — _run_epoch_jit_sharded_chunked)
            self._epoch_fn = make_epoch_fn_sharded_chunked(
                model, self.optimizer, self.mesh
            )
        else:
            self._epoch_fn = make_epoch_fn_sharded(model, self.optimizer, self.mesh)
        self._device_data = None
        # per-split staged eval cache (trainer.evaluate) — device-resident
        self._eval_staged = {}
        self._host_rows = None  # chunked sharded path keeps rows on host
        self.profile = bool(trainer_cfg.get("profile", False))
        self.history: list[Dict[str, float]] = []
        # preemption tolerance: a SIGTERM (TPU-pod eviction, SLURM requeue —
        # the reference's cluster world relies on requeue + resume) requests
        # a stop at the next epoch boundary; fit() then takes its normal
        # exit path, which already writes the resumable 'last' checkpoint
        self.handle_preemption = bool(trainer_cfg.get("handle_preemption", True))
        self._preempted = False
        # cooperative stop (the app's cancel button, a supervisor): polled at
        # every epoch boundary; same resumable-checkpoint exit as SIGTERM
        self.stop_flag = stop_flag
        self.callbacks.on_init_end(self.cfg, trainer=self)

    # -- preemption ----------------------------------------------------------

    def _install_preemption_handler(self):
        """SIGTERM -> stop at the next epoch boundary (then the normal exit
        path writes the resumable 'last' checkpoint).  No-op off the main
        thread (the app server trains in worker threads; signal handlers are
        main-thread-only) and when handle_preemption is off."""
        if not self.handle_preemption:
            return None
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return None

        def _on_term(signum, frame):
            self._preempted = True

        try:
            return signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            return None

    def _restore_preemption_handler(self, prev) -> None:
        if prev is None:
            return
        import signal

        try:
            signal.signal(signal.SIGTERM, prev)
        except ValueError:
            pass

    # -- loop ----------------------------------------------------------------

    def fit(
        self, variables: Optional[Dict[str, Any]] = None, resume: bool = False
    ) -> Dict[str, Any]:
        key = jax.random.PRNGKey(self.seed)
        start_epoch = 0
        opt_state = None
        resume_best_val = float("inf")
        resume_step = 0
        if resume and self.checkpoints.exists("last"):
            restored = self.checkpoints.restore("last")
            variables = restored["variables"]
            # carry the running best-val and step across the preemption:
            # otherwise the first resumed epoch (< inf) would overwrite the
            # 'best' checkpoint with a worse model, and step-indexed metric
            # records would restart at 0 and overlap the pre-resume ones
            resume_best_val = float(restored.get("val_loss", float("inf")))
            resume_step = int(restored.get("step", 0))
            # opt_state is stored as flat leaves; rebuild the optax NamedTuple
            # structure from a freshly initialized state's treedef
            if "opt_leaves" in restored:
                tmpl = self.optimizer.init(variables["params"])
                treedef = jax.tree_util.tree_structure(tmpl)
                leaves = [restored["opt_leaves"][str(i)] for i in range(treedef.num_leaves)]
                opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
            start_epoch = int(restored.get("epoch", -1)) + 1
            print(f"[rlvae] resuming from epoch {start_epoch}")
        if variables is None:
            k_init, key = jax.random.split(key)
            variables = self.model.init(k_init)
        if opt_state is None:
            opt_state = self.optimizer.init(variables["params"])

        if self.model_parallel > 1:
            from rlvae_tpu.parallel import shard_params

            variables = shard_params(self.mesh, variables)
            opt_state = shard_params(self.mesh, opt_state)
        else:
            variables = replicate(self.mesh, variables)
            opt_state = replicate(self.mesh, opt_state)
        bsharding = batch_sharding(self.mesh)

        from rlvae_tpu.utils.profiling import StepTimer, trace

        best_val = resume_best_val
        step = resume_step
        stop = False
        t_start = time.time()
        timer = StepTimer()
        epoch = start_epoch - 1
        prev_handler = self._install_preemption_handler()
        try:
            self.callbacks.on_train_begin(self.cfg, trainer=self)
            for epoch in range(start_epoch, self.max_epochs):
                t_epoch = time.time()
                # poll the cooperative stop BEFORE the epoch too: a cancelled
                # comparison/sweep must not train a full epoch of every
                # remaining model before noticing the shared stop_event
                if self.stop_flag is not None and self.stop_flag():
                    self._preempted = True
                if self._preempted:
                    self.logger.log({"preempted_at": epoch}, step=step)
                    epoch -= 1  # this epoch did NOT run (epochs_run = epoch + 1)
                    break
                self.callbacks.on_epoch_begin(self.cfg, epoch=epoch, trainer=self)
                train_metrics: list = []
                profiling_this_epoch = self.profile and epoch == 0
                with trace(self.run_dir / "profile", enabled=profiling_this_epoch):
                    if self._epoch_fn is not None:
                        key, k_epoch = jax.random.split(key)
                        variables, opt_state, stacked, n_steps = self._run_epoch_jit(
                            variables, opt_state, epoch, k_epoch
                        )
                        fetched = jax.device_get(stacked)  # one transfer per epoch
                        lr = get_lr(opt_state)  # constant within the epoch: fetch once
                        for s in range(n_steps):
                            step += 1
                            if step % self.log_every == 0:
                                host = {
                                    f"train/{k}": float(v[s]) for k, v in fetched.items()
                                }
                                host["lr"] = lr
                                self.logger.log(host, step=step)
                                self.callbacks.on_train_step_end(self.cfg, step=step, logs=host)
                                self.callbacks.on_log(self.cfg, host, step=step)
                        if n_steps:  # dataset smaller than the batch: no steps ran
                            train_metrics.append(
                                {k: float(v[-1]) for k, v in fetched.items()}
                            )
                    else:
                        for device_batch in _device_prefetch(
                            self.data.train_batches(epoch), bsharding, self.n_devices
                        ):
                            self.callbacks.call_event(
                                "on_train_step_begin", self.cfg, step=step
                            )
                            key, k_step = jax.random.split(key)
                            timer.start()
                            variables, opt_state, metrics = self._train_step(
                                variables, opt_state, device_batch, k_step
                            )
                            # gate on the POST-increment step so the iteration
                            # that is synchronously timed is the one logged
                            if (step + 1) % self.log_every == 0:
                                jax.block_until_ready(metrics)
                            timer.stop()
                            train_metrics.append(metrics)
                            step += 1
                            if step % self.log_every == 0:
                                # one device->host transfer for the whole metrics dict
                                fetched = jax.device_get(metrics)
                                host = {f"train/{k}": float(v) for k, v in fetched.items()}
                                host["lr"] = get_lr(opt_state)
                                host.update(timer.metrics())
                                self.logger.log(host, step=step)
                                self.callbacks.on_train_step_end(self.cfg, step=step, logs=host)
                                self.callbacks.on_log(self.cfg, host, step=step)

                val_metrics = self.evaluate("val", key=jax.random.fold_in(key, epoch), variables=variables)
                val_loss = val_metrics.get("loss", float("nan"))

                lr = get_lr(opt_state)
                new_lr = self.scheduler.step(val_loss, lr)
                if new_lr != lr:
                    opt_state = set_lr(opt_state, new_lr)

                epoch_summary = {
                    "epoch": epoch,
                    "epoch_time": time.time() - t_epoch,
                    **{f"val/{k}": v for k, v in val_metrics.items()},
                }
                if train_metrics:
                    # one transfer for the dict (per-scalar float() is a ~ms
                    # tunnel round-trip each); no-op for the epoch-jit path,
                    # whose entries are already host floats
                    last = jax.device_get(train_metrics[-1])
                    epoch_summary.update({f"train/{k}": float(v) for k, v in last.items()})
                self.logger.log(epoch_summary, step=step)
                self.history.append(epoch_summary)
                self.callbacks.on_evaluate(self.cfg, epoch=epoch, metrics=val_metrics)
                self.callbacks.on_epoch_end(
                    self.cfg, epoch=epoch, logs=epoch_summary, trainer=self
                )

                if val_loss < best_val:
                    best_val = val_loss
                    self.checkpoints.save(
                        "best", {"variables": variables, "step": step, "val_loss": val_loss}
                    )
                    self.callbacks.on_save(self.cfg, slot="best", step=step)

                if self.viz_hook is not None:
                    self.viz_hook(epoch=epoch, model=self.model, variables=variables, trainer=self)

                if self.early_stopping.update(val_loss):
                    self.logger.log({"early_stopped_at": epoch}, step=step)
                    stop = True
                if self.stop_flag is not None and self.stop_flag():
                    self._preempted = True  # same resumable exit as SIGTERM
                if self._preempted:
                    self.logger.log({"preempted_at": epoch}, step=step)
                    stop = True
                if stop:
                    break
        finally:
            # an exception mid-fit must not leak the SIGTERM handler (its
            # closure would pin this Trainer and shadow the caller's handler
            # for every later SIGTERM in this process)
            self._restore_preemption_handler(prev_handler)

        opt_leaves = {
            str(i): leaf
            for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state))
        }
        self.checkpoints.save(
            "last",
            {
                "variables": variables,
                "opt_leaves": opt_leaves,
                "step": step,
                "epoch": epoch,
                "val_loss": best_val,
            },
        )
        self.checkpoints.wait()  # flush any async save before reporting
        result = {
            "variables": variables,
            "best_val_loss": best_val,
            "epochs_run": epoch + 1,
            "steps": step,
            "train_time": time.time() - t_start,
            "preempted": self._preempted,
            "history": self.history,
        }
        self.logger.summary(
            {k: v for k, v in result.items() if k not in ("variables", "history")}
        )
        self.callbacks.on_save(self.cfg, slot="last", step=step)
        self.callbacks.on_train_end(self.cfg, result={
            k: v for k, v in result.items() if k != "variables"
        })
        return result

    def _run_epoch_jit_chunked(self, variables, opt_state, epoch: int, key):
        """Epoch as compiled chunk scans over a host-resident dataset.

        The dataset never lives in HBM: each chunk's rows are gathered on the
        host (the epoch permutation is host-side numpy) and ``device_put``
        for chunk c+1 is dispatched BEFORE chunk c's scan, so the transfer
        rides behind the compute.  One program per chunk shape — at most two
        compiles per run (full chunk + remainder).  The per-step key schedule
        makes the result bit-identical for any chunk size (and to a
        hypothetical S=n whole-epoch run)."""
        bs = self.data.batch_size
        n = self.data.steps_per_epoch()
        if n == 0:
            return variables, opt_state, {}, 0
        rng = np.random.default_rng(self.seed + epoch)
        perm = rng.permutation(len(self.data.train))[: n * bs].reshape(n, bs)
        keys = jax.random.split(key, n)
        data = self.data.train.data
        spans = [(c, min(c + self.chunk_steps, n))
                 for c in range(0, n, self.chunk_steps)]

        def stage(c0, c1):
            rows = np.asarray(data)[perm[c0:c1].reshape(-1)]
            return jax.device_put(
                jnp.asarray(rows).reshape(c1 - c0, bs, *rows.shape[1:])
            )

        nxt = stage(*spans[0])
        outs = []
        for i, (c0, c1) in enumerate(spans):
            cur, nxt = nxt, (stage(*spans[i + 1]) if i + 1 < len(spans) else None)
            variables, opt_state, m = self._epoch_fn(
                variables, opt_state, cur, keys[c0:c1]
            )
            outs.append(m)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *outs)
        return variables, opt_state, stacked, n

    def _run_epoch_jit_sharded_chunked(self, variables, opt_state, epoch: int, key):
        """Chunked epoch over a data-parallel mesh, any process count.

        Same host-gather + double-buffered staging as the single-device
        chunked path, but each chunk is a ``[S, n_dev, local_bs, ...]``
        array sharded over the data axis and the per-device key carry is
        threaded between chunk dispatches — batches AND keys match the
        resident sharded epoch exactly (bit-identical result, tested).

        Multi-host (round-3 VERDICT item 6): every host computes the same
        seeded GLOBAL permutation (parallel/multihost.host_epoch_perm, no
        collective), gathers rows only for its own devices' columns, and
        stages the local ``[S, local_dev, local_bs, ...]`` block via
        ``jax.make_array_from_process_local_data`` — the same
        process-index-ordered placement the resident path's
        ``stage_dataset`` uses, so the two paths see identical batches on
        any cluster shape (scripts/multihost_verify.py checks this on a
        real 2-process Gloo cluster)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from rlvae_tpu.parallel.mesh import DATA_AXIS
        from rlvae_tpu.parallel.multihost import host_epoch_perm, usable_local_rows

        bs = self.data.batch_size
        local_bs = bs // self.n_devices
        pc = jax.process_count()
        local_dev = self.n_devices // pc
        if self._host_rows is None:
            usable = usable_local_rows(self.mesh, len(self.data.train))
            rows = np.asarray(self.data.train.data[:usable])
            # same seeded staging shuffle as the resident path
            gperm = np.random.default_rng(
                self.seed + jax.process_index()
            ).permutation(usable)
            self._host_rows = rows[gperm]
        shard_len = len(self._host_rows) // local_dev
        n = (shard_len * self.n_devices) // bs
        if n == 0:
            return variables, opt_state, {}, 0
        perm = host_epoch_perm(self.seed, epoch, n, local_bs, shard_len, self.n_devices)
        # this process's global device columns (process-index-ordered, the
        # make_array_from_process_local_data placement)
        col0 = jax.process_index() * local_dev
        perm_local = perm[:, col0 : col0 + local_dev]
        rows_dev = self._host_rows.reshape(
            local_dev, shard_len, *self._host_rows.shape[1:]
        )
        sharding = NamedSharding(self.mesh, P(None, DATA_AXIS, None))
        spans = [(c, min(c + self.chunk_steps, n))
                 for c in range(0, n, self.chunk_steps)]

        def stage(c0, c1):
            # [S, local_dev, local_bs, ...]: device j's column gathered from
            # ITS contiguous shard — identical rows to the resident staging
            chunk = rows_dev[
                np.arange(local_dev)[None, :, None], perm_local[c0:c1]
            ]
            return jax.make_array_from_process_local_data(
                sharding, np.ascontiguousarray(chunk)
            )

        keys = init_epoch_keys(self.mesh, key)
        nxt = stage(*spans[0])
        outs = []
        for i, (c0, c1) in enumerate(spans):
            cur, nxt = nxt, (stage(*spans[i + 1]) if i + 1 < len(spans) else None)
            variables, opt_state, m, keys = self._epoch_fn(
                variables, opt_state, cur, keys
            )
            outs.append(m)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *outs)
        return variables, opt_state, stacked, n

    def _run_epoch_jit(self, variables, opt_state, epoch: int, key):
        """One compiled-epoch dispatch: stage data once, scan over batches."""
        if self.n_devices == 1 and self.chunk_steps > 0:
            return self._run_epoch_jit_chunked(variables, opt_state, epoch, key)
        if self.n_devices > 1 and self.chunk_steps > 0:
            return self._run_epoch_jit_sharded_chunked(
                variables, opt_state, epoch, key
            )
        bs = self.data.batch_size
        n = self.data.steps_per_epoch()
        rng = np.random.default_rng(self.seed + epoch)
        if self.n_devices == 1:
            if self._device_data is None:
                self._device_data = jax.device_put(jnp.asarray(self.data.train.data))
            perm = rng.permutation(len(self.data.train))[: n * bs]
            perm = jnp.asarray(perm.reshape(n, bs).astype(np.int32))
        else:
            # shard-local shuffle: each device owns a contiguous dataset
            # shard and permutes only local indices (make_epoch_fn_sharded).
            # Works on any process count: each process stages only its own
            # rows; all hosts compute the identical seeded permutation
            # (parallel/multihost.py).
            from rlvae_tpu.parallel.multihost import (
                epoch_perm,
                stage_dataset,
                usable_local_rows,
            )

            pc = jax.process_count()
            local_bs = bs // self.n_devices
            # the data module truncates every host's shard to the same
            # length (data/cyclic.py: per_host = N // process_count), so
            # global quantities derived from local_len * pc agree on every
            # host — a requirement for identical compiled epoch shapes
            local_len = len(self.data.train)
            n_shard = (local_len * pc) // self.n_devices  # rows per device
            # steps per epoch from GLOBAL row/batch counts (local
            # steps_per_epoch() divides local rows by the GLOBAL batch size
            # and would shrink the epoch pc-fold on multi-host)
            n = (n_shard * self.n_devices) // bs
            if self._device_data is None:
                usable = usable_local_rows(self.mesh, local_len)
                local_rows = np.asarray(self.data.train.data[:usable])
                # seeded LOCAL permutation at staging so contiguous device
                # shards are random subsets, not file order (a class-ordered
                # dataset would otherwise pin one class per device for the
                # whole run — process-strided loading keeps within-host
                # order).  Per-process seed; no cross-host consistency is
                # needed since rows never migrate between hosts.
                gperm = np.random.default_rng(
                    self.seed + jax.process_index()
                ).permutation(usable)
                local_rows = local_rows[gperm]
                self._device_data = stage_dataset(self.mesh, local_rows)
            perm = epoch_perm(
                self.mesh, self.seed, epoch, n, local_bs,
                self._device_data.shape[0] // self.n_devices,
            )
        variables, opt_state, stacked = self._epoch_fn(
            variables, opt_state, self._device_data, perm, key
        )
        return variables, opt_state, stacked, n

    def evaluate(
        self,
        split: str = "test",
        key: Optional[jax.Array] = None,
        variables: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, float]:
        if variables is None:
            restored = self.checkpoints.restore("best")
            variables = restored["variables"]
        key = key if key is not None else jax.random.PRNGKey(0)
        batches = list(
            self.data.val_batches() if split == "val" else self.data.test_batches()
        )
        from rlvae_tpu.parallel import shard_batch

        results: Dict[int, Dict[str, float]] = {}
        if self._eval_fn is not None and len(batches) > 1:
            # compiled whole-split eval: full-size batches go through scan
            # dispatches with the same fold_in(key, i) per-batch keys as the
            # loop (bit-identical results); odd-sized remainders take the
            # per-batch program.  When the larger-than-HBM knob is set
            # (epoch_jit_chunk_steps) the split is staged in chunks of that
            # many batches — eval must not stage what training could not.
            size0 = batches[0].shape[0]
            full = [i for i, b in enumerate(batches) if b.shape[0] == size0]
            per_batch = set(range(len(batches))) - set(full)
            S = self.chunk_steps if self.chunk_steps > 0 else len(full)
            # The split is static across epochs, so the staged device copy
            # is cached per (split, chunk) after the first validation — the
            # host->device upload of the whole split otherwise re-pays the
            # transfer every epoch and DOMINATES per-epoch wall-clock when
            # the link is slow (measured on the axon tunnel: 5.8 s warm val
            # vs a 0.8 s compiled training epoch at full_data scale).  The
            # larger-than-HBM chunked mode must NOT cache (eval would stage
            # what training could not hold).
            cache = (self._eval_staged.setdefault(split, {})
                     if self.chunk_steps == 0 else None)
            for g0 in range(0, len(full), S):
                grp = full[g0:g0 + S]
                if len(grp) < S and g0 > 0:
                    # trailing partial chunk: per-batch program instead of
                    # compiling a second scan shape
                    per_batch.update(grp)
                    break
                if cache is not None and g0 in cache:
                    stacked = cache[g0]
                else:
                    stacked = jax.device_put(
                        np.stack([np.asarray(batches[i], np.float32)
                                  for i in grp])
                    )
                    if cache is not None:
                        cache[g0] = stacked
                keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.asarray(grp, jnp.uint32)
                )
                fetched = jax.device_get(self._eval_fn(variables, stacked, keys))
                for j, i in enumerate(grp):
                    results[i] = {k: float(v[j]) for k, v in fetched.items()}
            for i in per_batch:
                metrics = jax.device_get(self._eval_step(
                    variables,
                    jax.device_put(np.asarray(batches[i], np.float32)),
                    jax.random.fold_in(key, i),
                ))
                results[i] = {k: float(v) for k, v in metrics.items()}
        else:
            for i, batch in enumerate(batches):
                if batch.shape[0] % self.n_devices != 0:
                    continue
                # shard eval batches over the data axis too
                # (replicated-variables DP eval; XLA reduces the means over
                # ICI); shard_batch places the host array per shard without
                # staging it on one device
                device_batch = shard_batch(self.mesh, np.asarray(batch, np.float32))
                metrics = jax.device_get(
                    self._eval_step(variables, device_batch, jax.random.fold_in(key, i))
                )
                results[i] = {k: float(v) for k, v in metrics.items()}

        acc: Dict[str, list] = {}
        weights: list = []
        for i, batch in enumerate(batches):
            if i not in results:
                continue
            self.callbacks.call_event("on_eval_step_begin", self.cfg, step=i)
            weights.append(batch.shape[0])
            for k, v in results[i].items():
                acc.setdefault(k, []).append(v)
            self.callbacks.call_event(
                "on_eval_step_end", self.cfg, step=i, logs=results[i]
            )
        # per-batch means weighted by batch size: a kept remainder batch
        # must not count as much as a full one (val_loss drives checkpoint
        # selection, plateau LR, and early stopping)
        return {
            k: float(np.average(v, weights=weights)) for k, v in acc.items()
        }
