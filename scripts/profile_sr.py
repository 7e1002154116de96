#!/usr/bin/env python
"""Capture a jax.profiler device trace of the SRGAN/ESRGAN full train step.

Same workload as ``scripts/bench_zoo.py --model srgan/esrgan`` (HR 256px,
batch 4, steady-state full step); writes an xplane trace under --out for
scripts/analyze_xplane.py. Purpose of record: the BASELINE.json north-star
clause names PixelShuffle (srgan/models.py:56, esrgan/models.py:76) as a
dedicated-kernel candidate — this trace attributes what the pixel-shuffle
reshape/transpose ops actually cost in the step (VERDICT r3 item 6).

    python scripts/profile_sr.py --model srgan --out /tmp/prof_srgan

Run on the TPU chip, one process at a time.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="srgan", choices=["srgan", "esrgan"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import numpy as np

    if args.dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    mod = __import__(f"tpugan.models.{args.model}", fromlist=[args.model])
    B, HR = 4, 256
    cfg = mod.Config(batch_size=B, hr_height=HR, hr_width=HR, synthetic_data=True)
    modules = mod.build(cfg)
    state = mod.create_state(cfg, modules)
    if hasattr(mod, "make_steps"):  # esrgan: (warmup_step, full_step)
        step_fn = mod.make_steps(cfg, modules)[1]
    else:
        step_fn = mod.make_step(cfg, modules)
    step = jax.jit(step_fn, donate_argnums=0)
    rng = np.random.default_rng(0)
    hr_u8 = jax.device_put(rng.integers(0, 255, (B, HR, HR, 3), dtype=np.uint8))

    for _ in range(3):  # compile + settle
        state, out = step(state, hr_u8)
    float(out["d_loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, out = step(state, hr_u8)
    float(out["d_loss"])
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(
        f"traced {args.steps} {args.model} steps in {dt:.2f}s "
        f"({1000 * dt / args.steps:.2f} ms/step incl. trace overhead) -> {args.out}"
    )


if __name__ == "__main__":
    main()
