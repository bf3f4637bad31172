#!/bin/bash
# Re-run of the r5f stages that failed on the fresh machine's missing
# editable install (ModuleNotFoundError; `pip install -e .` has been run).
# Waits for the surviving r5f stage-4 profile process to release the TPU.
# Usage: r5g_queue.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5g_queue.log; }

if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
log "TPU free; starting r5g"

log "stage 1: flagship 12k (shipping defaults)"
timeout 5400 python -u scripts/validate_flagship.py \
  --steps 12000 --eval-every 6000 --lr-schedule cosine \
  --snapshot-every 2000 \
  --save-ema runs/r5f_flagship_ema --out runs/r5f_flagship.jsonl \
  > runs/r5f_flagship.log 2>&1
rc1=$?
log "stage 1 rc=$rc1"

if [ "$rc1" -eq 0 ]; then
  # the segment must run the EXACT candidate shipping config (r4 lesson:
  # tile size is a live variable) — v3 body at the TN=1024 tile the new
  # default cap picks at flagship shapes
  log "stage 2a: v3 segment 10k->13k"
  GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=1024 timeout 2400 python -u scripts/validate_flagship.py \
    --steps 13000 --start-step 10000 --eval-every 1500 \
    --restore runs/r5f_flagship.jsonl.snapshots/snap-10000 \
    --snapshot-every 100000 --lr-schedule cosine \
    --out runs/r5f_seg_v3.jsonl > runs/r5f_seg_v3.log 2>&1
  log "stage 2a rc=$?"
  log "stage 2b: control segment 10k->13k"
  timeout 2400 python -u scripts/validate_flagship.py \
    --steps 13000 --start-step 10000 --eval-every 1500 \
    --restore runs/r5f_flagship.jsonl.snapshots/snap-10000 \
    --snapshot-every 100000 --lr-schedule cosine \
    --out runs/r5f_seg_ctl.jsonl > runs/r5f_seg_ctl.log 2>&1
  log "stage 2b rc=$?"
else
  log "stage 2 SKIPPED (flagship rc=$rc1)"
fi

log "stage 3: certifier arms for the candidates"
CERT="python -u scripts/certify_kernels.py --only pool_ext --gains 1 5 12 --seeds 2"
GECCO_POOL_BWD=v3 timeout 2400 $CERT \
  --out runs/r5f_cert_v3.jsonl > runs/r5f_C_v3.log 2>&1; log "cert v3 rc=$?"
GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=1024 timeout 2400 $CERT \
  --out runs/r5f_cert_v3tn1024.jsonl > runs/r5f_C_v3tn1024.log 2>&1; log "cert v3-tn1024 rc=$?"
GECCO_POOL_BWD=v3 timeout 3600 $CERT \
  --batch 8 --n-points 8192 --width-c 768 --inducers 128 \
  --out runs/r5f_cert_v38k.jsonl > runs/r5f_C_v38k.log 2>&1; log "cert v3-8k rc=$?"

log "queue done"
