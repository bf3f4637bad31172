#!/bin/bash
# Round-5 session-2 stage-2 TPU queue: the training-segment gate for the
# pool-backward candidates (the kernel-change policy added in 0cbe7c8:
# certifier pass + a >=2k-step training segment at trained magnitudes
# before any kernel-default change ships). The machine restart destroyed
# the r5 run's snapshots, so the trained state is rebuilt first.
#   stage 1: flagship 12k training run, shipping defaults (rebuilds a
#            trained-magnitude snapshot at 10k + EMA; NaN-abort on).
#   stage 2: v3 segment 10k->13k restored from snap-10000 (the gate), plus
#            a shipping-default control segment from the same snapshot.
#   stage 3: drifted-magnitude certifier for v3 at flagship shapes and
#            v2j/v3 at 8k shapes.
#   stage 4: train-step re-profile with GECCO_POOL_BWD=v3.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5f_queue.log; }

if [ -f /tmp/r5e_queue.pid ]; then
  while kill -0 "$(cat /tmp/r5e_queue.pid)" 2>/dev/null; do sleep 60; done
fi
log "r5e done; starting r5f"

log "stage 1: flagship 12k (shipping defaults)"
timeout 5400 python -u scripts/validate_flagship.py \
  --steps 12000 --eval-every 6000 --lr-schedule cosine \
  --snapshot-every 2000 \
  --save-ema runs/r5f_flagship_ema --out runs/r5f_flagship.jsonl \
  > runs/r5f_flagship.log 2>&1
rc1=$?
log "stage 1 rc=$rc1"

if [ "$rc1" -eq 0 ]; then
  # cosine is positioned over --steps (13000 here vs the parent's 12000):
  # the segment's LR at 10k-13k sits slightly ABOVE the parent tail —
  # conservative for a divergence gate. Evals at 10.5k/12k in both arms
  # give a quality-neutrality comparison, not just finiteness.
  log "stage 2a: v3 segment 10k->13k"
  GECCO_POOL_BWD=v3 timeout 2400 python -u scripts/validate_flagship.py \
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
GECCO_POOL_BWD=v2j timeout 3600 $CERT \
  --batch 8 --n-points 8192 --width-c 768 --inducers 128 \
  --out runs/r5f_cert_v2j8k.jsonl > runs/r5f_C_v2j8k.log 2>&1; log "cert v2j-8k rc=$?"
GECCO_POOL_BWD=v3 timeout 3600 $CERT \
  --batch 8 --n-points 8192 --width-c 768 --inducers 128 \
  --out runs/r5f_cert_v38k.jsonl > runs/r5f_C_v38k.log 2>&1; log "cert v3-8k rc=$?"

log "stage 4: train-step profile with v3"
GECCO_POOL_BWD=v3 timeout 2400 python -u scripts/profile_train_step.py \
  > runs/r5f_prof_v3.log 2>&1; log "stage 4 rc=$?"

log "queue done"
