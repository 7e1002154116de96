#!/usr/bin/env python
"""tpugan CycleGAN 256px throughput (the BASELINE.json 256px config).

Full training step (G joint update + both D updates + replay buffers) with
device-resident uint8 batches; one JSON line like bench.py. Run on the TPU
chip (do not run concurrently with another TPU process).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import numpy as np

# scripts/baseline_torch_cyclegan.py measured anchor (PyTorch CPU, batch 1,
# 256px) — recorded in BASELINE.md.
TORCH_CPU_ANCHOR_IPS = 0.014

STEPS = 20
WARMUP = 3
BATCH = 1
IMG = 256


def main() -> None:
    from tpugan.models import cyclegan

    # TPUGAN_BENCH_DTYPE=bfloat16 measures the mixed-precision production
    # config (same switch as bench.py); default fp32 = reference parity.
    dtype = _os.environ.get("TPUGAN_BENCH_DTYPE", "float32")
    if dtype not in ("float32", "bfloat16"):
        raise SystemExit(
            f"TPUGAN_BENCH_DTYPE={dtype!r}: expected float32 or bfloat16"
        )
    if dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    cfg = cyclegan.Config(
        img_height=IMG, img_width=IMG, batch_size=BATCH, synthetic_data=True
    )
    modules = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, modules, steps_per_epoch=1000)
    step = jax.jit(
        cyclegan.make_step(cfg, modules, steps_per_epoch=1000),
        donate_argnums=0,
    )
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8))
    b = jax.device_put(rng.integers(0, 255, (BATCH, IMG, IMG, 3), dtype=np.uint8))

    from tpugan.utils.benchtime import measure_images_per_sec

    def dispatch(n):
        # Hard scalar sync per burst (axon's block_until_ready under-waits
        # on short runs — BASELINE.md timing note).
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = step(state, a, b)
        float(out["d_loss"])
        return time.perf_counter() - t0

    for _ in range(WARMUP - 1):
        state, out = step(state, a, b)
    float(out["d_loss"])
    # Shared protocol (tpugan/utils/benchtime.py): one more warmup burst +
    # min-per-length difference method (stall-robust; see BASELINE.md
    # timing note), aligned with bench.py.
    ips = measure_images_per_sec(dispatch, BATCH, max(STEPS // 4, 1), STEPS)
    print(
        json.dumps(
            {
                "metric": "cyclegan_train_images_per_sec_256px",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / TORCH_CPU_ANCHOR_IPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
