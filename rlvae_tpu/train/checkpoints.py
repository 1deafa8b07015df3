"""Checkpointing via Orbax.

Replaces the reference's three mechanisms (SURVEY.md §5: Lightning
ModelCheckpoint monitoring val_loss, pythae BaseTrainer.save_checkpoint, and
pretrained-component loading): Orbax saves {variables, opt_state, step,
best_val} with 'best' and 'last' slots plus a ``model_config.json`` sidecar
(reference: pythae base_model.py:174-213 save()).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


class CheckpointManager:
    def __init__(
        self,
        directory: str | Path,
        model_config: Optional[Dict[str, Any]] = None,
        use_async: bool = True,
    ):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        if model_config is not None:
            (self.directory / "model_config.json").write_text(
                json.dumps(model_config, indent=2, default=str)
            )
        import orbax.checkpoint as ocp

        # host-0-only writes: save() early-returns on other processes, so
        # Orbax must NOT run its default all-process barrier — with the
        # default options process 0's save blocks forever inside
        # sync_global_processes waiting for processes that never call save
        # (found as a live distributed deadlock on the real 2-process Gloo
        # cluster, scripts/multihost_verify.py).  active_processes={0}
        # scopes every Orbax barrier to the one process that actually saves.
        if jax.process_count() > 1 and jax.process_index() != 0:
            # non-primary processes never save (gate below) and only read:
            # a plain sync checkpointer, constructed without the subset
            # options (Orbax refuses active_processes sets that exclude the
            # constructing process)
            self._ckptr = ocp.PyTreeCheckpointer()
            return
        kw = {}
        if jax.process_count() > 1:
            kw["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            )
        # async saves overlap checkpoint IO with the next epochs; wait_until
        # points are before restore and at manager teardown
        if use_async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler(), **kw)
        else:
            self._ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler(), **kw)

    def save(self, slot: str, state: Dict[str, Any]) -> None:
        if jax.process_index() != 0:  # host-0-only writes (multi-host ready)
            return
        path = (self.directory / slot).resolve()
        self.wait()
        self._ckptr.save(path, _to_numpy_tree(state), force=True)

    def wait(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def restore(self, slot: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        self.wait()
        path = (self.directory / slot).resolve()
        if template is not None:
            import orbax.checkpoint as ocp

            return self._ckptr.restore(
                path, restore_args=ocp.checkpoint_utils.construct_restore_args(template)
            )
        return self._ckptr.restore(path)

    def exists(self, slot: str) -> bool:
        return (self.directory / slot).exists()

    def load_model_config(self) -> Optional[Dict[str, Any]]:
        p = self.directory / "model_config.json"
        return json.loads(p.read_text()) if p.exists() else None
