#!/bin/bash
# Round-5 queue runner: probe the axon relay with fresh subprocesses until it
# answers (the failure is cached per-process — see .claude/skills/verify), then
# run the sequential queue. Single parent so TPU single-tenancy is respected.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
while true; do
  timeout 900 python -c "import jax, jax.numpy as jnp; jax.devices(); (jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" \
    >> runs/r5_probe.log 2>&1 && break
  echo "[$(date -u +%H:%M:%S)] relay probe failed, retrying in 120s" >> runs/r5_probe.log
  sleep 120
done
exec bash scripts/r5_queue.sh
