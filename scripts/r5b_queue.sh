#!/bin/bash
# Round-5 follow-up TPU queue: pool-ext backward experiments (VERDICT #7).
# Run AFTER r5_queue.sh finishes (the axon TPU is single-tenant).
#
# Arms (flagship shapes, batch 48, N=2048, C=384, H=8, I=64 -> J=512):
#   A0  shipping v2, TN cap 512 (re-measure baseline)
#   A1  v2 at TN=1024   (fewer tile prologues; VMEM naive 12 MB, fits)
#   A2  v2 at TN=2048   (single tile per pass)
#   A3  v2j at TN=512   (operand-normaliser body; flagship sanity)
# 8k shapes (N=8192, C=768, H=8, I=128 -> J=1024, batch 16):
#   B0  v1 (current 8k default)
#   B1  v2j TN=128      (un-gated full-width body)
# Then drifted-magnitude certification of every arm that wins.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5b_queue.log; }

KB="python -u scripts/kernel_bench.py pool --bwd --batch 48 --n-points 2048 --feature-dim 384 --heads 8 --inducers 64"
KB8="python -u scripts/kernel_bench.py pool --bwd --batch 16 --n-points 8192 --feature-dim 768 --heads 8 --inducers 128"

log "A0 v2 cap512";              timeout 1800 $KB                       > runs/r5b_A0.log 2>&1; log "A0 rc=$?"
log "A1 v2 tn1024";  GECCO_TN_POOL_BWD=1024 timeout 1800 $KB           > runs/r5b_A1.log 2>&1; log "A1 rc=$?"
log "A2 v2 tn2048";  GECCO_TN_POOL_BWD=2048 timeout 1800 $KB           > runs/r5b_A2.log 2>&1; log "A2 rc=$?"
log "A3 v2j";        GECCO_POOL_BWD=v2j timeout 1800 $KB               > runs/r5b_A3.log 2>&1; log "A3 rc=$?"
log "A4 v3";         GECCO_POOL_BWD=v3 timeout 1800 $KB                > runs/r5b_A4.log 2>&1; log "A4 rc=$?"
log "A5 v3 tn1024";  GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=1024 timeout 1800 $KB > runs/r5b_A5.log 2>&1; log "A5 rc=$?"
log "A6 v3 tn2048";  GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=2048 timeout 1800 $KB > runs/r5b_A6.log 2>&1; log "A6 rc=$?"
log "B0 8k v1";                  timeout 2400 $KB8                     > runs/r5b_B0.log 2>&1; log "B0 rc=$?"
log "B1 8k v2j";     GECCO_POOL_BWD=v2j timeout 2400 $KB8              > runs/r5b_B1.log 2>&1; log "B1 rc=$?"

# certification at drifted magnitudes (flagship + candidate knobs).
CERT="python -u scripts/certify_kernels.py --only pool_ext --gains 1 5 12 --seeds 2"
log "C1 cert v2 tn1024"; GECCO_TN_POOL_BWD=1024 timeout 2400 $CERT \
  --out runs/r5b_cert_tn1024.jsonl > runs/r5b_C1.log 2>&1; log "C1 rc=$?"
log "C2 cert v2 tn2048"; GECCO_TN_POOL_BWD=2048 timeout 2400 $CERT \
  --out runs/r5b_cert_tn2048.jsonl > runs/r5b_C2.log 2>&1; log "C2 rc=$?"
log "C3 cert v2j"; GECCO_POOL_BWD=v2j timeout 2400 $CERT \
  --out runs/r5b_cert_v2j.jsonl > runs/r5b_C3.log 2>&1; log "C3 rc=$?"
log "C4 cert v2j 8k shapes"; GECCO_POOL_BWD=v2j timeout 3600 $CERT \
  --batch 8 --n-points 8192 --width-c 768 --inducers 128 \
  --out runs/r5b_cert_v2j8k.jsonl > runs/r5b_C4.log 2>&1; log "C4 rc=$?"
log "C5 cert v3"; GECCO_POOL_BWD=v3 timeout 2400 $CERT \
  --out runs/r5b_cert_v3.jsonl > runs/r5b_C5.log 2>&1; log "C5 rc=$?"
log "C6 cert v3 tn1024"; GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=1024 timeout 2400 $CERT \
  --out runs/r5b_cert_v3tn1024.jsonl > runs/r5b_C6.log 2>&1; log "C6 rc=$?"

log "queue done"
