#!/usr/bin/env python
"""Same-session on-chip A/B of the esrgan dense-block channel-split lowering
(TPUGAN_DENSE_SPLIT — nn/layers.py:_SplitConv, nn/sr.py:DenseResidualBlock).

The 2026-08-19 device trace priced the dense-concat materialization at
~11.3 ms/step + 6.0 ms of add_any duals (~18% of the 96.5 ms bf16 esrgan
step); the split lowering shipped opt-in in round 4 pending this
measurement (VERDICT r4 weak #2 / next-round #2).

Protocol: ONE process holds the chip; each mode's step is traced while the
env flag is set (the flag is read at trace time), both modes are measured
TWICE in interleaved order (split0, split1, split1, split0) with the
min-difference timing protocol (utils/benchtime.py). Each measurement gets
a fresh device copy of the SAME host-initialized state (donation consumes
buffers). Default dtype bfloat16 = the production config the trace priced;
TPUGAN_BENCH_DTYPE=float32 measures the parity config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dtype = os.environ.get("TPUGAN_BENCH_DTYPE", "bfloat16")
    if dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    import jax

    from tpugan.models import esrgan
    from tpugan.utils.benchtime import measure_images_per_sec

    B, HR = 4, 256
    cfg = esrgan.Config(batch_size=B, hr_height=HR, hr_width=HR, synthetic_data=True)
    modules = esrgan.build(cfg)
    state_host = jax.device_get(esrgan.create_state(cfg, modules))
    rng = np.random.default_rng(0)
    hr_u8 = rng.integers(0, 255, (B, HR, HR, 3), dtype=np.uint8)

    steps = {}

    def measure(mode: int) -> float:
        os.environ["TPUGAN_DENSE_SPLIT"] = str(mode)
        if mode not in steps:
            # Fresh closure traced under this env setting at first call.
            steps[mode] = jax.jit(
                esrgan.make_steps(cfg, modules)[1], donate_argnums=0
            )
        step = steps[mode]
        state = jax.device_put(state_host)
        imgs = jax.device_put(hr_u8)

        def dispatch(n):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(n):
                state, out = step(state, imgs)
            float(out["d_loss"])
            return time.perf_counter() - t0

        t0 = time.time()
        ips = measure_images_per_sec(dispatch, B, 4, 16)
        print(
            f"  split={mode}: {ips:.2f} img/s ({time.time() - t0:.0f}s incl. "
            f"{'compile+' if len(steps) else ''}warmup)",
            flush=True,
        )
        return ips

    # Interleaved measurement order, configurable so a re-run can lead with
    # the slow-compiling variant (split=1's esrgan compile alone exceeded a
    # 1500 s budget on the axon service — itself a finding).
    order = [int(c) for c in os.environ.get("TPUGAN_AB_ORDER", "0110")]
    results = {"dtype": dtype, "order": [f"split{m}" for m in order]}
    r = {0: [], 1: []}
    for m in order:
        r[m].append(measure(m))
    results["split0_img_s"] = [round(v, 2) for v in r[0]]
    results["split1_img_s"] = [round(v, 2) for v in r[1]]
    if r[0] and r[1]:
        best0, best1 = max(r[0]), max(r[1])
        results["split1_vs_split0_pct"] = round(
            100.0 * (best1 - best0) / best0, 1
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
