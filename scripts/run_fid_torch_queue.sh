#!/usr/bin/env bash
# Sequential torch-CPU FID training legs for the round-3 acceptance rows
# (VERDICT.md items 1-2). Run in the background; each leg appends a line to
# the log when done. tpugan legs + scoring run separately (on the chip).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/fid_queue.log
echo "=== torch FID queue start $(date -u +%H:%M:%S) ===" >> "$LOG"
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
# im2im first (the unproven acceptance row), then lsgan, then CIFAR-class.
run_leg cyclegan64 0
run_leg cyclegan64 1
run_leg lsgan 0
run_leg lsgan 1
run_leg lsgan 2
run_leg dcgan_cifar 0
run_leg dcgan_cifar 1
run_leg dcgan_cifar 2
run_leg cyclegan64 2
echo "=== torch FID queue complete $(date -u +%H:%M:%S) ===" >> "$LOG"
