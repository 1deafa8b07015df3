#!/usr/bin/env bash
# Quick validation on a TPU VM: tests as a gate, then a quick training run.
# TPU-VM equivalent of the reference's SLURM wrapper
# (reference: scripts/run_quick_test.sh — tests before training, per-stage
# logs, exit-code checks).
set -euo pipefail

cd "$(dirname "$0")/.."
LOGDIR=outputs/logs
mkdir -p "$LOGDIR"

echo "[1/3] component + parity tests"
python -m pytest tests/ -q -x 2>&1 | tee "$LOGDIR/tests.log"

echo "[2/3] quick vanilla training"
python run_experiment.py model=vanilla_vae training=quick visualization=minimal \
  experiment_name=quick_test 2>&1 | tee "$LOGDIR/train_vanilla.log"

echo "[3/3] quick Riemannian training"
python run_experiment.py training=quick visualization=minimal \
  experiment_name=quick_test 2>&1 | tee "$LOGDIR/train_riemannian.log"

echo "quick test suite complete; results under outputs/quick_test"
