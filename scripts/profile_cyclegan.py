#!/usr/bin/env python
"""Capture a jax.profiler device trace of the 256px CycleGAN train step.

Same workload as scripts/bench_cyclegan.py (the BASELINE.json 256px
config); writes an xplane trace under --out for offline analysis with
scripts/analyze_xplane.py. Run on the TPU chip, one process at a time.

    python scripts/profile_cyclegan.py --out /tmp/prof_bf16 [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--img", type=int, default=256)
    args = ap.parse_args()

    import jax
    import numpy as np

    if args.dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    from tpugan.models import cyclegan

    cfg = cyclegan.Config(
        img_height=args.img, img_width=args.img, batch_size=1, synthetic_data=True
    )
    modules = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, modules, steps_per_epoch=1000)
    step = jax.jit(
        cyclegan.make_step(cfg, modules, steps_per_epoch=1000), donate_argnums=0
    )
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, 255, (1, args.img, args.img, 3), dtype=np.uint8))
    b = jax.device_put(rng.integers(0, 255, (1, args.img, args.img, 3), dtype=np.uint8))

    # Warmup: compile + 3 executed steps with a hard scalar sync.
    for _ in range(3):
        state, out = step(state, a, b)
    float(out["d_loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, out = step(state, a, b)
    float(out["d_loss"])
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {wall:.3f}s wall -> {args.out}")

    # Independent wall-clock cross-check outside the trace window.
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, out = step(state, a, b)
    float(out["d_loss"])
    wall2 = time.perf_counter() - t0
    print(
        f"untraced {args.steps} steps: {wall2:.3f}s wall "
        f"({args.steps / wall2:.2f} img/s at batch 1)"
    )


if __name__ == "__main__":
    main()
