#!/bin/bash
# Round-4 continuation TPU queue — runs after bench.py frees the TPU.
# Sequential: the axon TPU is single-tenant.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

# wait for the in-flight bench.py to finish (it appends rc=N when done);
# bounded: give up after ~1h rather than hanging forever if the bench was
# never launched or logs elsewhere
waited=0
while [ ! -f runs/r4b_bench_flagship.log ] || ! grep -q '^rc=' runs/r4b_bench_flagship.log; do
  sleep 10
  waited=$((waited + 10))
  if [ "$waited" -ge 3600 ]; then
    echo "=== [$(date -u +%H:%M:%S)] timed out waiting for bench log" | tee -a runs/r4b_queue.log
    exit 1
  fi
done
echo "=== [$(date -u +%H:%M:%S)] bench done, starting flagship run" | tee -a runs/r4b_queue.log

timeout 3600 python -u scripts/validate_flagship.py \
  --steps 20000 --eval-every 4000 --lr-schedule cosine \
  --final-eval-solver-steps 128 --final-eval-clouds 256 \
  --save-ema runs/r4b_flagship_ema --out runs/r4b_flagship.jsonl \
  > runs/r4b_flagship.log 2>&1
echo "=== [$(date -u +%H:%M:%S)] flagship rc=$?" | tee -a runs/r4b_queue.log

timeout 1200 python -u scripts/demo_upsample_100k.py \
  --ema-path runs/r4b_flagship_ema --layers 6 --width 384 --heads 8 \
  --families 4 --n-new 102400 \
  > runs/r4b_upsample.log 2>&1
echo "=== [$(date -u +%H:%M:%S)] upsample rc=$?" | tee -a runs/r4b_queue.log
