#!/bin/bash
# Many-sequence full-visualization run — TPU-VM launcher.
#
# Equivalent of the reference's SLURM wrapper (reference:
# scripts/run_manyseq.sbatch: gpu:1, visualization=full with 32 sequences and
# batch 32).  On a TPU VM there is no scheduler: run directly, or under
# `nohup` for long jobs. Logs land in logs/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs

exec python run_experiment.py \
    visualization=full \
    visualization.max_sequences=32 \
    training.data.batch_size=32 \
    run.dir=outputs/manyseq \
    "$@" 2>&1 | tee "logs/rlvae_manyseq_$(date +%Y%m%d_%H%M%S).log"
