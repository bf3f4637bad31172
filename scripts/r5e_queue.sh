#!/bin/bash
# Round-5 session-2 stage-1 TPU queue: the pool-ext backward arms (VERDICT
# #7). The r5b/r5d results did not survive the machine restart (runs/ is
# gitignored) and the r5b v3 arms silently measured v2 (env-parse bug fixed
# in 5eda9f2), so nothing valid is on record — re-measure everything that
# matters in one pass:
#   flagship shapes (batch 48, N=2048, C=384, H=8, I=64 -> J=512):
#     A0  v2 default (TN cap 512)  — re-measure the 2.40 ms/layer baseline
#     A3  v2j                      — operand-normaliser body
#     A4  v3 default tile          — folded-operand body (~22% fewer FLOPs)
#     A5  v3 TN=1024
#     A6  v3 TN=2048
#   8k shapes (batch 16, N=8192, C=768, H=8, I=128 -> J=1024):
#     B0  default (v1)             — re-measure the 12.20 ms/layer baseline
#     B1  v2j
#     B2  v3
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
log() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a runs/r5e_queue.log; }

KB="python -u scripts/kernel_bench.py pool --bwd --batch 48 --n-points 2048 --feature-dim 384 --heads 8 --inducers 64"
KB8="python -u scripts/kernel_bench.py pool --bwd --batch 16 --n-points 8192 --feature-dim 768 --heads 8 --inducers 128"

log "A0 v2 default";              timeout 1800 $KB                      > runs/r5e_A0.log 2>&1; log "A0 rc=$?"
log "A3 v2j";         GECCO_POOL_BWD=v2j timeout 1800 $KB               > runs/r5e_A3.log 2>&1; log "A3 rc=$?"
log "A4 v3";          GECCO_POOL_BWD=v3 timeout 1800 $KB                > runs/r5e_A4.log 2>&1; log "A4 rc=$?"
log "A5 v3 tn1024";   GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=1024 timeout 1800 $KB > runs/r5e_A5.log 2>&1; log "A5 rc=$?"
log "A6 v3 tn2048";   GECCO_POOL_BWD=v3 GECCO_TN_POOL_BWD=2048 timeout 1800 $KB > runs/r5e_A6.log 2>&1; log "A6 rc=$?"
log "B0 8k default";              timeout 2400 $KB8                     > runs/r5e_B0.log 2>&1; log "B0 rc=$?"
log "B1 8k v2j";      GECCO_POOL_BWD=v2j timeout 2400 $KB8              > runs/r5e_B1.log 2>&1; log "B1 rc=$?"
log "B2 8k v3";       GECCO_POOL_BWD=v3 timeout 2400 $KB8               > runs/r5e_B2.log 2>&1; log "B2 rc=$?"
log "queue done"
