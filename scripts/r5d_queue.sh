#!/bin/bash
# Round-5 final TPU queue: re-run the v3 flagship bench arms (the first
# attempt silently measured v2 — GECCO_POOL_BWD=v3 was rejected by the env
# parse, fixed in 5eda9f2). Waits for the r5c queue to finish.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5d_queue.log; }

if [ -f /tmp/r5c_runner.pid ]; then
  while kill -0 "$(cat /tmp/r5c_runner.pid)" 2>/dev/null; do sleep 60; done
fi
log "r5c done; starting r5d"

KB="python -u scripts/kernel_bench.py pool --bwd --batch 48 --n-points 2048 --feature-dim 384 --heads 8 --inducers 64"
log "A4R v3";        GECCO_POOL_BWD=v3 timeout 1800 $KB                > runs/r5d_A4R.log 2>&1; log "A4R rc=$?"
log "A5R v3 tn1024"; GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=1024 timeout 1800 $KB > runs/r5d_A5R.log 2>&1; log "A5R rc=$?"
log "A6R v3 tn2048"; GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=2048 timeout 1800 $KB > runs/r5d_A6R.log 2>&1; log "A6R rc=$?"
log "queue done"
