#!/usr/bin/env python
"""Experiment CLI — the Hydra-style entry point.

Same surface as the reference (reference: run_experiment.py:62-360):

    python run_experiment.py model=vanilla_vae training=quick visualization=minimal
    python run_experiment.py experiment=comparison_study
    python run_experiment.py -m model.riemannian_beta=0.5,8.0 training=quick

Experiment types: ``single`` / ``comparison`` / ``sweep`` (multirun also via
``-m`` with comma-valued overrides).  Results land in
``outputs/<experiment_name>/<timestamp>/`` with resolved config, metrics
JSONL, checkpoints, and a ``results.yaml``.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

import yaml  # noqa: E402

from rlvae_tpu.config import Config, compose, expand_multirun, save_config  # noqa: E402


class ExperimentRunner:
    """Orchestrates single runs, comparison studies and sweeps
    (reference: run_experiment.py:62-340)."""

    def __init__(self, config: Config, progress_callback=None, stop_event=None):
        from rlvae_tpu.config.schema import assert_valid

        assert_valid(config.to_dict())
        self.config = config
        # live per-record metrics hook for the app layer (reference:
        # StreamlitProgressCallback, app/backend/experiment_runner.py:394)
        self.progress_callback = progress_callback
        # cooperative cancel (threading.Event or any .is_set() object): the
        # trainer polls it at epoch boundaries and exits resumably
        self.stop_event = stop_event
        self.run_dir = Path(config.get("run.dir", "outputs/run"))
        self.run_dir.mkdir(parents=True, exist_ok=True)
        save_config(config, self.run_dir / "config.yaml")

    # -- entry ----------------------------------------------------------------

    def run(self):
        etype = self.config.get("experiment.type", "single")
        if etype == "single":
            return self.run_single_experiment()
        if etype == "comparison":
            return self.run_comparison_study()
        if etype == "sweep":
            return self.run_hyperparameter_sweep()
        raise ValueError(f"Unknown experiment type: {etype}")

    # -- pieces ---------------------------------------------------------------

    def _build(self, model_cfg: dict, run_dir: Path, run_name: str):
        from rlvae_tpu.data import CyclicDataModule
        from rlvae_tpu.models import create_model
        from rlvae_tpu.train import Trainer
        from rlvae_tpu.utils.logging import MetricsLogger
        from rlvae_tpu.viz import make_viz_hook

        seed = int(self.config.get("seed", 42))
        data_module = CyclicDataModule(self.config.data.to_dict(), seed=seed)
        data_module.setup(self.config.training.to_dict())

        # keep model.input_dim consistent with the dataset geometry
        data_dim = [
            int(self.config.get("data.channels", 3)),
            *[int(v) for v in self.config.get("data.image_size", [64, 64])],
        ]
        if list(model_cfg.get("input_dim", data_dim)) != data_dim:
            print(f"[rlvae] overriding model.input_dim {model_cfg['input_dim']} -> {data_dim} (from data config)")
            model_cfg = {**model_cfg, "input_dim": data_dim}
            # persist the reconciled value so the saved config matches the
            # trained checkpoints (the app/ModelManager rebuild from it)
            self.config.set("model.input_dim", data_dim)
            save_config(self.config, run_dir / "config.yaml")

        model = create_model(model_cfg, name=run_name)
        logger = MetricsLogger(
            run_dir,
            project=self.config.get("wandb.project"),
            run_name=run_name,
            config=self.config.to_dict(),
            mode=self.config.get("wandb.mode", "disabled"),
            on_log=self.progress_callback,
        )
        viz_hook = make_viz_hook(
            self.config.get("visualization", Config()).to_dict()
            if self.config.get("visualization") is not None
            else {},
            data_module,
            run_dir,
            logger,
        )
        trainer = Trainer(
            model,
            data_module,
            self.config.training.to_dict(),
            run_dir=run_dir,
            logger=logger,
            viz_hook=viz_hook,
            seed=seed,
            stop_flag=self.stop_event.is_set if self.stop_event is not None else None,
        )
        return model, data_module, trainer, logger

    def run_single_experiment(self):
        name = self.config.get("experiment_name", "experiment")
        model, data, trainer, logger = self._build(
            self.config.model.to_dict(), self.run_dir, name
        )
        print(f"[rlvae] single run -> {self.run_dir}")
        print(f"[rlvae] model: {model.get_model_summary()['configuration']}")
        print(f"[rlvae] data: train={len(data.train)} val={len(data.val)} test={len(data.test)}")
        result = trainer.fit()
        # evaluate the BEST-val checkpoint (variables=None restores it);
        # fall back to the final weights when no checkpoint was written
        if trainer.checkpoints.exists("best"):
            test_metrics = trainer.evaluate("test")
        else:
            test_metrics = trainer.evaluate("test", variables=result["variables"])
        logger.log({f"test/{k}": v for k, v in test_metrics.items()})
        self._save_results(
            self.run_dir,
            {
                "best_val_loss": result["best_val_loss"],
                "epochs_run": result["epochs_run"],
                "train_time_sec": result["train_time"],
                "test": test_metrics,
            },
        )
        logger.finish()
        result["test_metrics"] = test_metrics  # for sweep objective ranking
        return result

    def run_comparison_study(self):
        from rlvae_tpu.models import MetricsCollector, apply_model_overrides

        experiment = self.config.experiment
        names = list(experiment.get("models", []) or [])
        collector = MetricsCollector()
        overrides = experiment.get("training_override") or {}
        if overrides:
            if "n_epochs" in overrides:
                self.config.set("training.trainer.max_epochs", int(overrides["n_epochs"]))
            for k in ("n_train_samples", "n_val_samples"):
                if k in overrides:
                    self.config.set(f"training.{k}", int(overrides[k]))

        results = {}
        for model_name in names:
            sub_dir = self.run_dir / model_name
            model_cfg = apply_model_overrides(self.config.model.to_dict(), model_name)
            model, data, trainer, logger = self._build(model_cfg, sub_dir, model_name)
            print(f"[rlvae] comparison: training {model_name}")
            result = trainer.fit()
            # evaluate the BEST-val checkpoint (variables=None restores it);
            # fall back to the final weights when no checkpoint was written
            if trainer.checkpoints.exists("best"):
                test_metrics = trainer.evaluate("test")
            else:
                test_metrics = trainer.evaluate(
                    "test", variables=result["variables"]
                )
            for entry in trainer.history:
                collector.add_model_metrics(
                    model_name,
                    {k.replace("val/", ""): v for k, v in entry.items() if k.startswith("val/")},
                )
            results[model_name] = {
                "best_val_loss": result["best_val_loss"],
                "test": test_metrics,
            }
            logger.finish()

        summary = collector.get_comparison_summary()
        self._save_results(self.run_dir, {"models": results, "comparison": summary})
        print("[rlvae] comparison summary:")
        for name, metrics in summary.items():
            keys = [k for k in metrics if k.endswith("_final")][:4]
            print(f"  {name}: " + ", ".join(f"{k}={metrics[k]:.4f}" for k in keys))
        return results

    def run_hyperparameter_sweep(self):
        """Grid sweep from experiment.sweep.parameters (reference:
        run_experiment.py:207-214 defers to Hydra multirun; here the grid is
        expanded in-process)."""
        import itertools

        from rlvae_tpu.config.compose import coerce_scalar

        sweep = self.config.experiment.get("sweep") or {}
        params = sweep.get("parameters") or {}
        axes = {k: [coerce_scalar(x) for x in v["values"]] for k, v in params.items()}
        max_runs = int(self.config.get("experiment.max_runs", 50))
        combos = list(itertools.product(*axes.values()))[:max_runs]
        print(f"[rlvae] sweep: {len(combos)} runs over {list(axes)}")

        objective = self.config.get("experiment.objective.metric", "val_loss")
        results = []
        for i, combo in enumerate(combos):
            run_cfg = self.config.copy()
            for key, value in zip(axes.keys(), combo):
                run_cfg.set(key, value)
            tov = self.config.experiment.get("training_override") or {}
            if "n_epochs" in tov:
                run_cfg.set("training.trainer.max_epochs", int(tov["n_epochs"]))
            for k in ("n_train_samples", "n_val_samples"):
                if k in tov:
                    run_cfg.set(f"training.{k}", int(tov[k]))
            if self.stop_event is not None and self.stop_event.is_set():
                print(f"[rlvae] sweep cancelled before run {i}")
                break
            sub = ExperimentRunner.__new__(ExperimentRunner)
            sub.config = run_cfg
            sub.progress_callback = self.progress_callback
            sub.stop_event = self.stop_event  # __new__ bypasses __init__
            sub.run_dir = self.run_dir / f"run_{i}"
            sub.run_dir.mkdir(parents=True, exist_ok=True)
            save_config(run_cfg, sub.run_dir / "config.yaml")
            result = sub.run_single_experiment()
            entry = {"run": i, "params": dict(zip(axes.keys(), combo)),
                     "best_val_loss": result["best_val_loss"]}
            if objective != "val_loss":
                entry["objective_value"] = float(
                    result.get("test_metrics", {}).get(objective, float("nan"))
                )
            results.append(entry)
        # rank by the configured objective metric and goal (the recorded
        # yaml claims this ranking — honor it)
        goal = self.config.get("experiment.objective.goal", "minimize")
        key = "objective_value" if objective != "val_loss" else "best_val_loss"
        worst = float("-inf") if goal == "maximize" else float("inf")

        def rank_of(r):
            # NaN (objective metric missing from the run's test metrics)
            # must rank WORST — raw NaN keys make Python's sort order
            # arbitrary, turning "best sweep run" into noise
            v = r.get(key, worst)
            return worst if v != v else v

        if any(rank_of(r) == worst for r in results):
            print(
                f"[rlvae] WARNING: objective '{objective}' missing from some "
                "runs' test metrics; those runs rank last"
            )
        results.sort(key=rank_of, reverse=(goal == "maximize"))
        self._save_results(self.run_dir, {"objective": objective, "runs": results})
        if results:
            print(f"[rlvae] best sweep run: {results[0]}")
        return results

    @staticmethod
    def _save_results(run_dir: Path, results: dict) -> None:
        (run_dir / "results.yaml").write_text(yaml.safe_dump(results, sort_keys=False))


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    ~40s first-epoch compile."""
    try:
        import jax

        cache_dir = REPO_ROOT / "outputs" / ".jax_cache"
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"[rlvae] compilation cache unavailable: {e}")


def main(argv=None):
    _enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in argv:
            argv.remove(flag)
            multirun = True
    conf_dir = REPO_ROOT / "conf"
    if multirun:
        for i, run_overrides in enumerate(expand_multirun(argv)):
            print(f"[rlvae] multirun job {i}: {run_overrides}")
            cfg = compose(conf_dir, overrides=run_overrides)
            cfg.set("run.dir", str(Path(cfg.get("sweep.dir", "outputs/sweep")) / str(i)))
            ExperimentRunner(cfg).run()
    else:
        cfg = compose(conf_dir, overrides=argv)
        ExperimentRunner(cfg).run()


if __name__ == "__main__":
    main()
