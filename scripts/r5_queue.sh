#!/bin/bash
# Round-5 TPU queue — sequential (the axon TPU is single-tenant).
# Stage 1 is the round's headline deliverable (VERDICT #1): certify the
# EXACT shipping kernel stack over 30k flagship steps with the 128-step
# final-protocol eval and EMA export. Later stages consume its EMA.
# Every stage logs rc; stages that need the EMA gate on stage-1 rc.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5_queue.log; }

# --- stage 1: flagship 30k certification run (shipping defaults, no env)
log "stage 1: flagship 30k"
timeout 10800 python -u scripts/validate_flagship.py \
  --steps 30000 --eval-every 3000 --lr-schedule cosine \
  --final-eval-solver-steps 128 --final-eval-clouds 256 \
  --snapshot-every 2000 \
  --save-ema runs/r5_flagship_ema --out runs/r5_flagship.jsonl \
  > runs/r5_flagship.log 2>&1
rc1=$?
log "stage 1 rc=$rc1"

# --- stage 2: 100k upsample at flagship capacity (VERDICT #6)
if [ "$rc1" -eq 0 ]; then
  log "stage 2: upsample 100k"
  timeout 1800 python -u scripts/demo_upsample_100k.py \
    --ema-path runs/r5_flagship_ema --layers 6 --width 384 --heads 8 \
    --families 4 --n-new 102400 \
    > runs/r5_upsample.log 2>&1
  log "stage 2 rc=$?"
else
  log "stage 2 SKIPPED (flagship rc=$rc1)"
fi

# --- stage 3: conditional certification (VERDICT #4)
log "stage 3: conditional 12k"
timeout 10800 python -u scripts/validate_conditional.py \
  --steps 12000 --save-ema runs/r5_conditional_ema \
  --out runs/r5_conditional.jsonl \
  > runs/r5_conditional.log 2>&1
log "stage 3 rc=$?"

# --- stage 4: 8k + conditional sampler re-measure, shipping default (VERDICT #8)
log "stage 4: bench scaled8k + conditional"
timeout 5400 python -u bench.py --config scaled8k > runs/r5_bench_8k.log 2>&1
log "stage 4a rc=$?"
timeout 5400 python -u bench.py --config conditional > runs/r5_bench_cond.log 2>&1
log "stage 4b rc=$?"

# --- stage 5: certifier arms (VERDICT #2 — prove detection on the r4 configs)
log "stage 5: certifier arms"
timeout 7200 python -u scripts/certify_kernels.py --arms all \
  --only unpool --gains 5 12 --seeds 1 \
  --out runs/r5_certify_arms.jsonl > runs/r5_certify_arms.log 2>&1
log "stage 5 rc=$?"

log "queue done"
