#!/bin/bash
# End-to-end smoke of every trainer on the real TPU chip: short synthetic
# run, reference-format logs, sample PNGs. Run from an empty scratch dir:
#   cd "$(mktemp -d)" && PYTHONPATH=/root/repo:$PYTHONPATH bash /root/repo/scripts/verify_all_tpu.sh
# (APPEND to PYTHONPATH — the axon sitecustomize lives on the existing path;
# overwriting it leaves jax without the TPU backend)
# One model at a time (the chip serializes processes); axon compiles are
# slow/variable — per-model timeout 1500 s. Prints PASS/FAIL per model.

set -u
COMMON="--n_epochs 1 --synthetic_data --log_interval 4"
run() {
  name=$1; shift
  printf '=== %s ===\n' "$name"
  if timeout 1500 python -m tpugan "$name" $COMMON "$@" > "$name.log" 2>&1; then
    echo "PASS $(tail -c 120 "$name.log" | tr -d '\r' | tail -1)"
  else
    echo "FAIL rc=$? $(tail -c 300 "$name.log")"
  fi
  rm -rf images saved_models
}

# MNIST family (28/32px, fast)
for m in gan dcgan lsgan cgan acgan sgan infogan bgan softmax_gan \
         relativistic_gan ebgan began aae; do
  run "$m" --batch_size 16 --max_batches 10 --sample_interval 5
done
run wgan     --batch_size 16 --max_batches 10 --sample_interval 5
run wgan_gp  --batch_size 16 --max_batches 10 --sample_interval 5
run wgan_div --batch_size 16 --max_batches 10 --sample_interval 5
run dragan   --batch_size 16 --max_batches 10 --sample_interval 5
run cluster_gan -b 16 --max_batches 10
run cogan    --batch_size 8 --max_batches 8 --sample_interval 5
run pixelda  --batch_size 8 --max_batches 8 --sample_interval 5 --n_residual_blocks 3

# image-to-image (reduced sizes/blocks where the default compile is huge)
run pix2pix  --batch_size 1 --max_batches 6 --sample_interval 5
run cyclegan --batch_size 1 --max_batches 6 --sample_interval 5 --img_height 128 --img_width 128 --n_residual_blocks 3
run discogan --batch_size 2 --max_batches 6 --sample_interval 5
run dualgan  --batch_size 2 --max_batches 6 --sample_interval 5
run stargan  --batch_size 2 --max_batches 6 --sample_interval 5 --residual_blocks 2
run unit     --batch_size 1 --max_batches 6 --sample_interval 5 --img_height 128 --img_width 128
run munit    --batch_size 1 --max_batches 6 --sample_interval 5
run bicyclegan --batch_size 2 --max_batches 6 --sample_interval 5
run context_encoder --batch_size 2 --max_batches 6 --sample_interval 5
run ccgan    --batch_size 2 --max_batches 6 --sample_interval 5

# super-resolution
run srgan  --batch_size 2 --max_batches 6 --sample_interval 5 --hr_height 128 --hr_width 128
run esrgan --batch_size 2 --max_batches 6 --sample_interval 5 --hr_height 128 --hr_width 128 --residual_blocks 4 --warmup_batches 3

echo "SWEEP_COMPLETE"
