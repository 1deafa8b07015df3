"""Metrics logging: console + JSONL + optional wandb.

The reference logs everything through Weights & Biases (reference:
run_experiment.py:242-260, lightning_trainer.py:90-168).  wandb is not
installed in this environment, so the logger degrades gracefully: metrics
always go to the console and a local ``metrics.jsonl``; wandb is used when
importable and enabled.  Only process 0 writes (multi-host ready).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping, Optional

import jax


def _wandb():
    try:
        import wandb  # noqa: F401

        return wandb
    except ImportError:
        return None


class MetricsLogger:
    def __init__(
        self,
        run_dir: str | Path,
        project: Optional[str] = None,
        run_name: Optional[str] = None,
        config: Optional[Mapping[str, Any]] = None,
        mode: str = "disabled",  # online, offline, disabled
        on_log=None,
    ):
        self.run_dir = Path(run_dir)
        self.is_main = jax.process_index() == 0
        self.wandb_run = None
        self._file = None
        # live-progress callback (the app server's StreamlitProgressCallback
        # equivalent, reference: app/backend/experiment_runner.py:394-449)
        self.on_log = on_log
        if not self.is_main:
            return
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.run_dir / "metrics.jsonl", "a")
        wandb = _wandb()
        if wandb is not None and mode != "disabled":
            self.wandb_run = wandb.init(
                project=project, name=run_name, config=dict(config or {}), mode=mode,
                dir=str(self.run_dir),
            )

    def log(self, metrics: Mapping[str, Any], step: Optional[int] = None) -> None:
        if not self.is_main:
            return
        record = {"_time": time.time()}
        if step is not None:
            record["_step"] = int(step)
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self.on_log is not None:
            try:
                self.on_log(record)
            except Exception:
                pass  # a broken progress consumer must never kill training
        if self.wandb_run is not None:
            self.wandb_run.log(dict(metrics), step=step)

    def log_table(self, name: str, rows) -> None:
        if not self.is_main:
            return
        (self.run_dir / f"{name}.json").write_text(json.dumps(rows, indent=2, default=str))
        if self.wandb_run is not None:
            import wandb

            cols = sorted({k for r in rows for k in r})
            table = wandb.Table(columns=cols)
            for r in rows:
                table.add_data(*[r.get(c) for c in cols])
            self.wandb_run.log({name: table})

    def log_image(self, name: str, path: str | Path, step: Optional[int] = None) -> None:
        if self.wandb_run is not None:
            import wandb

            self.wandb_run.log({name: wandb.Image(str(path))}, step=step)

    def summary(self, values: Mapping[str, Any]) -> None:
        if not self.is_main:
            return
        (self.run_dir / "summary.json").write_text(json.dumps(dict(values), indent=2, default=str))
        if self.wandb_run is not None:
            for k, v in values.items():
                self.wandb_run.summary[k] = v

    def finish(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
        if self.wandb_run is not None:
            self.wandb_run.finish()
            self.wandb_run = None
