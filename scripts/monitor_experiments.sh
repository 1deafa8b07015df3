#!/bin/bash
# RlVAE experiment monitor — status of running experiments + recent results.
#
# TPU-native equivalent of the reference's scripts/monitor_experiments.sh
# (reference file:1-90): same report sections, adapted to this stack —
# SLURM queue if present else local training processes, JSONL metric logs
# instead of wandb, the TPU device instead of nvidia-smi.

echo "RlVAE Experiment Monitor"
echo "========================"
echo "Time: $(date)"
echo ""

echo "Running jobs:"
echo "-------------"
if command -v squeue >/dev/null 2>&1; then
    squeue -u "$USER" --format="%.10i %.9P %.20j %.8u %.2t %.10M %.6D %R" | grep rlvae \
        || echo "No RlVAE SLURM jobs running"
else
    # local runs: run_experiment.py, research/evaluation CLIs, the live app
    found=0
    for pid in $(ls /proc 2>/dev/null | grep -E '^[0-9]+$'); do
        cmd=$(tr '\0' ' ' 2>/dev/null < "/proc/$pid/cmdline")
        case "$cmd" in
            *run_experiment.py*|*research_cli.py*|*evaluation_cli.py*|*rlvae_tpu.app*)
                etime=$(ps -o etime= -p "$pid" 2>/dev/null | tr -d ' ')
                echo "PID $pid (${etime:-?}): ${cmd:0:110}"
                found=1
                ;;
        esac
    done
    [ "$found" = 0 ] && echo "No local RlVAE processes running"
fi
echo ""

echo "Recent metric logs (last 24h):"
echo "------------------------------"
logs=$(find outputs -name "metrics.jsonl" -type f -mtime -1 2>/dev/null | head -10)
if [ -n "$logs" ]; then
    echo "$logs" | while read -r file; do
        echo "$file  ($(du -h "$file" | cut -f1), $(wc -l < "$file") entries)"
        tail -1 "$file" | python3 -c "
import json, sys
try:
    e = json.loads(sys.stdin.read())
    keys = ('epoch', 'loss', 'val_loss', 'recon_loss', 'kld_loss')
    print('   last:', {k: e[k] for k in keys if k in e} or e)
except Exception as exc:
    print('   unreadable:', exc)
"
    done
else
    echo "No recent metric logs"
fi
echo ""

echo "Recent results (last 24h):"
echo "--------------------------"
results=$(find outputs -name "results.yaml" -type f -mtime -1 2>/dev/null | head -10)
if [ -n "$results" ]; then
    echo "$results" | while read -r file; do
        echo "$file"
        python3 -c "
import yaml
try:
    with open('$file') as f:
        data = yaml.safe_load(f) or {}
    test = data.get('test') or data.get('test_results') or {}
    if test:
        for k in ('loss', 'recon_loss', 'kld_loss'):
            if k in test:
                print(f'   test {k}: {test[k]:.3f}')
    if 'best_val_loss' in data:
        print(f'   best val loss: {data[\"best_val_loss\"]:.3f} '
              f'({data.get(\"epochs_run\", \"?\")} epochs)')
    if not test and 'best_val_loss' not in data:
        print('   no test results found')
except Exception as e:
    print(f'   error reading file: {e}')
"
    done
else
    echo "No recent results"
fi
echo ""

echo "Disk usage:"
echo "-----------"
df -h . | tail -1
echo ""

echo "Accelerator:"
echo "------------"
if command -v nvidia-smi >/dev/null 2>&1; then
    nvidia-smi --query-gpu=index,name,utilization.gpu,memory.used,memory.total \
        --format=csv,noheader,nounits
else
    # listing devices claims the (single-tenant) TPU; keep it opt-in so the
    # monitor never steals the chip from a running experiment
    if [ "${MONITOR_PROBE_DEVICE:-0}" = "1" ]; then
        timeout 60 python3 -c "import jax; print(jax.devices())" 2>/dev/null \
            || echo "device probe failed/timed out"
    else
        echo "device probe skipped (MONITOR_PROBE_DEVICE=1 to enable;"
        echo "probing claims the single TPU chip away from running jobs)"
    fi
fi
echo ""

echo "Monitor complete"
