#!/bin/bash
# Round-5 session-2 final measurement queue: shipping-default (v3 pool
# backward) re-measures for BASELINE + driver-path warm.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5h_queue.log; }

log "P1 train-step profile, flagship, shipping default"
timeout 1800 python -u scripts/profile_train_step.py > runs/r5h_prof_flagship.log 2>&1; log "P1 rc=$?"
log "P2 train-step profile, 8k, shipping default"
timeout 2400 python -u scripts/profile_train_step.py --config 8k > runs/r5h_prof_8k.log 2>&1; log "P2 rc=$?"
log "B1 bench flagship"
timeout 3600 python -u bench.py > runs/r5h_bench_flagship.log 2>&1; log "B1 rc=$?"
log "B2 bench scaled8k"
timeout 5400 python -u bench.py --config scaled8k > runs/r5h_bench_8k.log 2>&1; log "B2 rc=$?"
log "queue done"
