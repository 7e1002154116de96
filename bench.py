"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json): DCGAN training images/sec/chip at 64x64, batch 64.
``vs_baseline`` compares against the measured PyTorch-CPU reference anchor
(see BASELINE.md "Measured anchors" — reproduced by scripts/baseline_torch.py
on this host; the reference publishes no numbers of its own).

Runs on whatever the default JAX platform is (the real TPU chip under the
driver); full training step (G+D update) with device-resident uint8 batches,
warmup excluded.

Uses the framework's fused multi-step dispatch (train/loop.py:scan_steps,
CLI --steps_per_dispatch): K=60 optimizer steps per device call, numerics
identical to K single dispatches (tests/test_scan_dispatch.py). For this
~3 ms-class step the per-dispatch tunnel latency otherwise dominates and
adds 2-10x noise (BASELINE.md variance note).

Measures the production TPU config: bfloat16 mixed precision (fp32 params/
norm stats, bf16 conv/dense compute — the CLI's --dtype bfloat16, incl.
the folded bf16 BatchNorm path), +33% over fp32 with equivalent sample
quality (FID A/Bs in BASELINE.md).
Set TPUGAN_BENCH_DTYPE=float32 for the exact-parity measurement.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

# Measured on this host by scripts/baseline_torch.py (PyTorch CPU, DCGAN
# 64px, batch 64, mean over 30 steps after 3 warmup). See BASELINE.md.
TORCH_CPU_ANCHOR_IMAGES_PER_SEC = 10.3

K = 60  # steps fused per dispatch
BATCH = 64
IMG = 64


def main() -> None:
    import os

    dtype = os.environ.get("TPUGAN_BENCH_DTYPE", "bfloat16")
    if dtype not in ("float32", "bfloat16"):
        raise SystemExit(
            f"TPUGAN_BENCH_DTYPE={dtype!r}: expected float32 or bfloat16"
        )
    if dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    from tpugan.models import dcgan
    from tpugan.train.loop import scan_steps
    from tpugan.utils.benchtime import measure_images_per_sec

    cfg = dcgan.Config(
        img_size=IMG, channels=1, batch_size=BATCH, synthetic_data=True
    )
    modules = dcgan.build(cfg)
    state = dcgan.create_state(cfg, modules)
    steps = jax.jit(scan_steps(dcgan.make_step(cfg, modules)), donate_argnums=0)

    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, (K, BATCH, IMG, IMG, 1), dtype=np.uint8)
    stacked = jax.device_put(host)
    labels = jax.device_put(np.zeros((K, BATCH), np.int32))

    def dispatch(n):
        """Run n dispatches of K steps each and HARD-sync via a scalar D2H
        fetch (the axon remote backend's block_until_ready can under-wait
        on short bursts; see BASELINE.md timing-protocol note)."""
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = steps(state, stacked, labels)
        float(out["d_loss"][-1])
        return time.perf_counter() - t0

    # Shared protocol: warmup + min-per-length difference method over two
    # run lengths (tpugan/utils/benchtime.py).
    ips = measure_images_per_sec(dispatch, K * BATCH, 1, 4)
    print(
        json.dumps(
            {
                "metric": "dcgan_train_images_per_sec_64px",
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / TORCH_CPU_ANCHOR_IMAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
