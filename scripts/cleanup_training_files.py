#!/usr/bin/env python
"""Clean up training artifacts from the workspace.

Equivalent of the reference's workspace cleaner (reference:
scripts/cleanup_training_files.py — removes rendered figures, checkpoints
and run directories while keeping source, data, configs and docs).  Here the
targets are the framework's own artifact layout: ``outputs/<run>/``
checkpoints, visualizations, metrics and reports, plus stray figure files —
never ``data/``, ``conf/`` or sources.

Usage:
    python scripts/cleanup_training_files.py [--outputs DIR] [--keep name ...]
        [--dry-run]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

RUN_ARTIFACTS = ("checkpoints", "visualizations", "profile")
RUN_FILES = ("metrics.jsonl", "report.html", "results.yaml")
STRAY_PATTERNS = ("*.png", "*.html", "*.gif", "*.jpg")


def cleanup(outputs: Path, keep: set[str], dry_run: bool) -> int:
    removed = 0

    def rm(path: Path):
        nonlocal removed
        removed += 1
        print(f"{'[dry-run] would remove' if dry_run else 'removing'} {path}")
        if not dry_run:
            shutil.rmtree(path) if path.is_dir() else path.unlink()

    if outputs.is_dir():
        for run in sorted(outputs.iterdir()):
            if not run.is_dir() or run.name in keep or run.name.startswith("."):
                continue
            for sub in RUN_ARTIFACTS:
                if (run / sub).is_dir():
                    rm(run / sub)
            for f in RUN_FILES:
                if (run / f).is_file():
                    rm(run / f)
    # stray figures at repo root (never inside data/, conf/, rlvae_tpu/)
    for pattern in STRAY_PATTERNS:
        for f in REPO.glob(pattern):
            rm(f)
    return removed


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outputs", type=Path, default=REPO / "outputs")
    ap.add_argument("--keep", nargs="*", default=["curve_parity", ".jax_cache"],
                    help="run-directory names to keep intact")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    n = cleanup(args.outputs, set(args.keep), args.dry_run)
    print(f"{'would remove' if args.dry_run else 'removed'} {n} artifacts "
          f"(kept: {', '.join(args.keep) or 'none'})")


if __name__ == "__main__":
    main()
