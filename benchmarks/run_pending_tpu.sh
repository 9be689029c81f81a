#!/bin/bash
# Pending on-relay measurements (run serially — ONE TPU client at a time).
# Fire this when the axon tunnel returns; each step appends to the log.
# Usage: bash benchmarks/run_pending_tpu.sh [logfile]
set -u
LOG=${1:-/tmp/pending_tpu.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* — $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 1200 "$@" 2>&1 | tail -30 | tee -a "$LOG"
}
# 1. headline bench (post-refactor re-verify; BENCH_r02 quality)
run python bench.py --iters 1000
# 2. wire-format A/B on the real feed (epoch walls incl. host->device)
run python benchmarks/ab_wire.py --epochs 3
# 3. NT-Xent inner-form A/B (scan-amortized)
run python benchmarks/ab_ntxent.py
# 4. scale pretrain steady state (1M x 200k BPR, one epoch)
run python benchmarks/lightgcn_scale_pretrain.py --users 1000000 \
    --items 200000 --epochs 1
echo "ALL DONE $(date -u)" | tee -a "$LOG"
