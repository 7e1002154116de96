#!/usr/bin/env python
"""Multi-chip data-parallel throughput bench: DCGAN 64px, global batch
scaled to the mesh (512 over 8 devices by default).

The reference is single-device (SURVEY.md §2.4), so this config is the
framework's scaling story, not a parity target: params replicated, batch
sharded over the ICI mesh axis, XLA inserts the gradient all-reduce
(tpugan/parallel/mesh.py). BatchNorm still computes GLOBAL batch stats
(GSPMD semantics == one big device), so the numerics at global batch B
match a single device running batch B — asserted on the virtual CPU mesh
by tests/test_parallel.py::test_bench_dp_config_equivalence via
``check_equivalence`` below.

Run on real hardware:   python scripts/bench_dp.py            # all chips
Force a device count:   python scripts/bench_dp.py --devices 8
Single-chip scaling anchor (same global batch on one chip):
                        python scripts/bench_dp.py --devices 1

Timing protocol: fused K-step dispatch + two run lengths + scalar D2H
sync, same as bench.py (axon block_until_ready under-waits; BASELINE.md).

The flagship 256px CycleGAN config trains at the reference's batch_size=1
and therefore cannot data-parallelize without changing semantics — that
workload is documented single-chip (BASELINE.md); DP applies to any recipe
whose global batch divides by the mesh (the CLI autoshards, warning when
it cannot).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG, K = 64, 20


def _build(batch, dtype="bfloat16", img=IMG):
    import jax

    if dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    from tpugan.models import dcgan
    from tpugan.train.loop import scan_steps

    cfg = dcgan.Config(img_size=img, channels=1, batch_size=batch, synthetic_data=True)
    modules = dcgan.build(cfg)
    state = dcgan.create_state(cfg, modules)
    steps = jax.jit(scan_steps(dcgan.make_step(cfg, modules)), donate_argnums=0)
    return state, steps


def check_equivalence(n_devices: int = 8, batch: int = 32, img: int = 32) -> float:
    """Run one fused dispatch single-device and one sharded over an
    n-device mesh on identical data; return the max |loss delta|.
    Used by the test suite on the virtual CPU mesh (img=32 keeps the
    single-core CPU compile affordable; the bench itself runs 64px)."""
    import jax

    from tpugan.parallel import batch_sharding, data_mesh, shard_state

    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, (4, batch, img, img, 1), dtype=np.uint8)
    labels = np.zeros((4, batch), np.int32)

    outs = []
    for shard in (False, True):
        state, steps = _build(batch, dtype="float32", img=img)
        if shard:
            mesh = data_mesh(jax.devices()[:n_devices])
            state = shard_state(state, mesh)
            sh = batch_sharding(mesh)
            imgs = jax.device_put(host, jax.sharding.NamedSharding(sh.mesh, jax.sharding.PartitionSpec(None, "data")))
            labs = jax.device_put(labels, jax.sharding.NamedSharding(sh.mesh, jax.sharding.PartitionSpec(None, "data")))
        else:
            imgs, labs = jax.device_put(host), jax.device_put(labels)
        state, out = steps(state, imgs, labs)
        outs.append(
            np.stack([np.asarray(out["d_loss"]), np.asarray(out["g_loss"])])
        )
    return float(np.abs(outs[0] - outs[1]).max())


def main() -> None:
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0, help="0 = all")
    ap.add_argument("--per_device_batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()

    from tpugan.parallel import batch_sharding, data_mesh, shard_state

    n = args.devices or jax.device_count()
    batch = args.per_device_batch * n
    state, steps = _build(batch, dtype=args.dtype)
    mesh = data_mesh(jax.devices()[:n])
    state = shard_state(state, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    stack_sh = NamedSharding(mesh, P(None, "data"))

    rng = np.random.default_rng(0)
    stacked = jax.device_put(
        rng.integers(0, 255, (K, batch, IMG, IMG, 1), dtype=np.uint8), stack_sh
    )
    labels = jax.device_put(np.zeros((K, batch), np.int32), stack_sh)

    def timed(n_dispatches):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n_dispatches):
            state, out = steps(state, stacked, labels)
        float(out["d_loss"][-1])
        return time.perf_counter() - t0

    state, out = steps(state, stacked, labels)  # compile
    float(out["d_loss"][-1])

    m1, m2 = 1, 4
    candidates, fallback = [], 0.0
    for _ in range(3):
        t1 = timed(m1)
        t2 = timed(m2)
        fallback = max(fallback, m2 * K * batch / t2)
        if t2 - t1 > 0.2 * t2:
            candidates.append((m2 - m1) * K * batch / (t2 - t1))
    ips = max(candidates) if candidates else fallback
    print(
        json.dumps(
            {
                "metric": "dcgan_dp_train_images_per_sec_64px",
                "value": round(ips, 1),
                "unit": "images/sec",
                "devices": n,
                "global_batch": batch,
                "per_chip": round(ips / n, 1),
                "dtype": args.dtype,
            }
        )
    )


if __name__ == "__main__":
    main()
