#!/usr/bin/env bash
# Long-running experiment suite on a TPU VM (reference:
# scripts/run_weekend_experiments.sh:103-115 — quick + full runs, comparison
# study, hyperparameter sweep via multirun).
set -euo pipefail

cd "$(dirname "$0")/.."
LOGDIR=outputs/logs
mkdir -p "$LOGDIR"

run() {
  local name=$1; shift
  echo "=== $name ==="
  python run_experiment.py "$@" 2>&1 | tee "$LOGDIR/$name.log"
}

run quick_riemannian     training=quick visualization=minimal experiment_name=weekend_quick
run full_riemannian      training=full_data visualization=standard experiment_name=weekend_full
run comparison           experiment=comparison_study training=quick visualization=minimal \
                         experiment_name=weekend_comparison
run sweep -m             model.riemannian_beta=0.5,2.0,8.0 training=quick \
                         visualization=minimal experiment_name=weekend_sweep

echo "weekend suite complete"
