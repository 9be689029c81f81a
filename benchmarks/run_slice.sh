#!/bin/bash
# One-command real-slice kit (VERDICT r2 item 10). Run this when actual
# multi-chip TPU hardware is available; everything else in the repo is
# already validated on the virtual mesh + 2-process CPU smoke.
#
# Single-host slice (all chips visible to one process):
#     bash benchmarks/run_slice.sh
# Multi-host slice (one process per host; repeat on every host):
#     COORDINATOR_ADDRESS=host0:8476 NUM_PROCESSES=4 PROCESS_ID=$i \
#         bash benchmarks/run_slice.sh
#
# Produces (appended to $LOG, one JSON row per step where applicable):
#   1. weak-scaling row at this mesh size (combine rows from 1/2/4/...-host
#      launches for the >=80% efficiency curve vs the 1-chip baseline)
#   2. sharded-lookup A/B: mp-sharded user-table gather vs replicated
#   3. 10M x 1M steps-only run (row-sharded tables, real collectives)
#   4. graft-entry multichip dryrun on the real mesh
set -u
LOG=${1:-/tmp/slice_bench.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* — $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 3600 "$@" 2>&1 | tail -30 | tee -a "$LOG"
}
# 1. weak scaling at fixed per-chip batch (dp = all chips)
run python benchmarks/scaling_bench.py --per-chip-batch 512
# 2. catalog-MP row: dp x mp mesh with the sharded lookup engaged
run python benchmarks/scaling_bench.py --per-chip-batch 512 --mp 2
# 3. the BASELINE.md 10M x 1M target at real bandwidth (loss must go down),
#    now COMPOSED with the sharded streaming eval: catalog-sharded scores,
#    top-k merge, packed GT, streaming==dense equality gate + live-signal leg
run python benchmarks/scale_smoke.py --users 10000000 --items 1000000 \
    --dims 64 --batch 256 --mesh_dp 2 --mesh_mp 4 --train-steps 50 \
    --batch-pool 8 --assert-decreasing --eval-users 512
# 4. the driver-facing multichip entry on real devices
run python __graft_entry__.py
echo "ALL DONE $(date -u)" | tee -a "$LOG"
