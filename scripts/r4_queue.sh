#!/bin/bash
# Round-4 TPU job queue — run sequentially (the axon TPU is single-tenant).
# Usage: bash scripts/r4_queue.sh [stage...]   (default: all stages in order)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

run() {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name: $*" | tee -a runs/r4_queue.log
  timeout 7200 "$@" > "runs/r4_${name}.log" 2>&1
  local rc=$?
  echo "=== [$(date -u +%H:%M:%S)] DONE $name rc=$rc" | tee -a runs/r4_queue.log
}

for stage in ${@:-denoiserprof trainprof_flagship trainprof_8k bench_8k bench_cond flagship conditional upsample}; do
  case "$stage" in
    denoiserprof)
      run denoiserprof python scripts/profile_denoiser.py ;;
    trainprof_flagship)
      run trainprof_flagship python scripts/profile_train_step.py --config flagship ;;
    trainprof_8k)
      run trainprof_8k python scripts/profile_train_step.py --config 8k --batch 16 ;;
    bench_8k)
      run bench_8k python bench.py --config scaled8k ;;
    bench_cond)
      run bench_cond python bench.py --config conditional ;;
    flagship)
      run flagship python scripts/validate_flagship.py \
        --steps 30000 --eval-every 3000 --lr-schedule cosine \
        --final-eval-solver-steps 128 --final-eval-clouds 256 \
        --save-ema runs/r4_flagship_ema --out runs/r4_flagship.jsonl ;;
    conditional)
      run conditional python scripts/validate_conditional.py \
        --steps 12000 --out runs/r4_conditional.jsonl ;;
    upsample)
      run upsample python scripts/demo_upsample_100k.py \
        --layers 6 --width 384 --train-steps 8000 --n-new 102400 ;;
    *)
      echo "unknown stage $stage" ;;
  esac
done
