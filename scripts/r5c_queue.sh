#!/bin/bash
# Round-5 continuation queue. Waits for the r5 queue process to exit, then:
#   1. resumes the OOM-killed conditional certification from snap-10000
#      (the on-device-gather fix removes the ~10 MB/step staging leak);
#   2. runs the r5b pool-backward measurement+certification arms;
#   3. probes the axon host-staging-buffer leak in isolation (500 x 10 MB
#      device_put loop, RSS sampled) so BASELINE can document the runtime
#      fact precisely.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5c_queue.log; }

if [ -f /tmp/r5_runner.pid ]; then
  while kill -0 "$(cat /tmp/r5_runner.pid)" 2>/dev/null; do sleep 60; done
fi
log "r5 queue done; starting r5c"

log "stage 1: conditional resume 10000 -> 12000"
timeout 7200 python -u scripts/validate_conditional.py \
  --steps 12000 --start-step 10000 \
  --restore runs/r5_conditional.jsonl.snapshots/snap-10000 \
  --save-ema runs/r5_conditional_ema \
  --out runs/r5_conditional.jsonl \
  >> runs/r5_conditional.log 2>&1
log "stage 1 rc=$?"

log "stage 2: r5b pool-backward arms"
bash scripts/r5b_queue.sh
log "stage 2 rc=$?"

log "stage 3: staging-leak probe"
timeout 1200 python -u scripts/probe_staging_leak.py > runs/r5c_leak.log 2>&1
log "stage 3 rc=$?"

log "queue done"
