#!/usr/bin/env bash
# Round-5 sequential torch-CPU FID/PSNR training legs (VERDICT r4 items
# 3-4): the new srgan64 SR acceptance row (3 seeds) and the cyclegan64
# backbone-settle extension to SIX seeds. Prior rounds' sample sets lived
# in /tmp and did not survive the image reset, so all six cyclegan64 seeds
# retrain (deterministic: same code + seed reproduces the r4 pixels).
# tpugan legs + scoring run separately (on the chip / CPU).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fid_queue_r5.log
echo "=== torch FID queue (r5) start $(date -u +%H:%M:%S) ===" >> "$LOG"
run_leg() {
  local model=$1 seed=$2
  local t0=$(date +%s)
  echo "[start $(date -u +%H:%M:%S)] $model seed=$seed" >> "$LOG"
  if python scripts/fid_headtohead.py --model "$model" --seed "$seed" \
      --train_torch >> "$LOG" 2>&1; then
    echo "[done  $(date -u +%H:%M:%S)] $model seed=$seed ($(( $(date +%s) - t0 ))s)" >> "$LOG"
  else
    echo "[FAIL  $(date -u +%H:%M:%S)] $model seed=$seed" >> "$LOG"
  fi
}
# SR acceptance row first (the last unmeasured BASELINE.md acceptance row).
run_leg srgan64 0
run_leg srgan64 1
run_leg srgan64 2
# cyclegan64 backbone settle: all six seeds.
run_leg cyclegan64 0
run_leg cyclegan64 1
run_leg cyclegan64 2
run_leg cyclegan64 3
run_leg cyclegan64 4
run_leg cyclegan64 5
echo "=== torch FID queue (r5) complete $(date -u +%H:%M:%S) ===" >> "$LOG"
