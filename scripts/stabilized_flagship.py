#!/usr/bin/env python
"""Stabilized-flagship evidence: reference objective vs flow_loss_mode=volume.

The flagship objective's flow loss -sum log|det J| (reference:
src/models/riemannian_flow_vae.py:1218-1219) rewards latent expansion
without bound; both frameworks reach |z_T| ~ 1e10+ at quick-config scale
(outputs/curve_parity_flagship/, docs/ROADMAP.md).  This script runs the
SAME quick config twice on the current backend —

  arm "reference":  model=riemannian_flow_vae        (parity objective)
  arm "stable":     model=riemannian_flow_vae_stable (flow_loss_mode=volume
                                                      + near-identity init)

— and writes outputs/stabilized_flagship/{<arm>/, results.json, SUMMARY.md}
comparing reconstruction, cyclicity, and latent statistics (total losses are
not comparable across objectives; the shared terms are).

Usage: python scripts/stabilized_flagship.py [--epochs N] [--seqs N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from rlvae_tpu.config import compose  # noqa: E402

OUT = REPO_ROOT / "outputs" / "stabilized_flagship"

ARMS = {
    "reference": "riemannian_flow_vae",
    "stable": "riemannian_flow_vae_stable",
}

# the shared loss surface both objectives optimize; comparable across arms
SHARED_KEYS = (
    "recon_loss", "kld_loss", "cyclicity_error",
    "latent_norm", "latent_variance", "metric_determinant",
)


def run_arm(name: str, model_group: str, epochs: int, seqs: int) -> dict:
    from run_experiment import ExperimentRunner

    run_dir = OUT / name
    cfg = compose(
        REPO_ROOT / "conf",
        overrides=[
            f"model={model_group}",
            "training=quick",
            "visualization=minimal",
            f"training.trainer.max_epochs={epochs}",
            f"training.n_train_samples={seqs}",
            f"run.dir={run_dir}",
            f"experiment_name=stabilized_{name}",
        ],
    )
    runner = ExperimentRunner(cfg)
    result = runner.run_single_experiment()
    test = {k: float(v) for k, v in result["test_metrics"].items()}

    # per-epoch validation trajectory from the run's metrics.jsonl
    traj = []
    metrics_file = run_dir / "metrics.jsonl"
    if metrics_file.exists():
        for line in metrics_file.read_text().splitlines():
            rec = json.loads(line)
            if "val/latent_norm" in rec or "val/loss" in rec:
                traj.append(
                    {
                        "epoch": rec.get("epoch"),
                        **{
                            k.split("/", 1)[1]: rec[k]
                            for k in rec
                            if k.startswith("val/")
                        },
                    }
                )
    return {"test": test, "val_trajectory": traj, "epochs_run": result["epochs_run"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seqs", type=int, default=100)
    args = ap.parse_args()

    OUT.mkdir(parents=True, exist_ok=True)
    results = {}
    for arm, group in ARMS.items():
        print(f"[stabilized] training arm '{arm}' (model={group})", flush=True)
        results[arm] = run_arm(arm, group, args.epochs, args.seqs)

    ref_t, st_t = results["reference"]["test"], results["stable"]["test"]
    summary = {
        "epochs": args.epochs,
        "n_train_samples": args.seqs,
        "shared_metrics": {
            k: {"reference": ref_t.get(k), "stable": st_t.get(k)}
            for k in SHARED_KEYS
            if k in ref_t and k in st_t  # both arms, or the :.6g format dies
        },
        "latent_norm_ratio_ref_over_stable": (
            ref_t["latent_norm"] / max(st_t["latent_norm"], 1e-12)
        ),
        "recon_improvement_pct": 100.0
        * (ref_t["recon_loss"] - st_t["recon_loss"])
        / max(ref_t["recon_loss"], 1e-12),
    }
    (OUT / "results.json").write_text(json.dumps({**summary, "arms": results}, indent=2))

    lines = [
        "# Stabilized flagship — quick-config A/B on "
        f"{args.epochs} epochs / {args.seqs} seqs",
        "",
        "| metric (test, best-val ckpt) | reference objective | stable preset |",
        "|---|---|---|",
    ]
    for k, v in summary["shared_metrics"].items():
        lines.append(f"| {k} | {v['reference']:.6g} | {v['stable']:.6g} |")
    lines += [
        "",
        f"latent-norm ratio (reference / stable): "
        f"{summary['latent_norm_ratio_ref_over_stable']:.3g}",
        f"reconstruction improvement: {summary['recon_improvement_pct']:.1f}%",
        "",
        "Total losses are NOT compared (different objectives); the shared",
        "terms above are.  The stable preset keeps the model family and all",
        "parity defaults; see conf/model/riemannian_flow_vae_stable.yaml.",
    ]
    (OUT / "SUMMARY.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
