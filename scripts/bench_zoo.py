#!/usr/bin/env python
"""tpugan throughput for the remaining BASELINE.json acceptance configs.

bench.py covers DCGAN 64px and scripts/bench_cyclegan.py the 256px config;
this script measures the other three acceptance-table rows (BASELINE.md
"Consequence" table) at the reference's own defaults:

- ``gan``      MLP G/D, 28px, batch 64 (gan/gan.py:21-28)
- ``wgan_gp``  MLP G/critic, 28px, batch 64, n_critic=5
               (wgan_gp/wgan_gp.py:23-31, schedule wgan_gp.py:144-203:
               critic on EVERY batch, G every n_critic batches reusing the
               critic's z)
- ``srgan``    SRResNet G + VGG54 content loss, HR 256px, batch 4
               (srgan/srgan.py:38-46)
- ``esrgan``   RRDB-23 G + RaGAN + VGG perceptual, HR 256px, batch 4,
               steady-state full step, not the pixel-only warmup
               (esrgan/esrgan.py:38-50)

One JSON line per run, same schema as bench.py. The MLP configs are
sub-millisecond steps, so they use the fused K-step dispatch
(train/loop.py:scan_steps) exactly like bench.py; the SR configs are
dispatch-bound-free and run one step per dispatch like bench_cyclegan.
Timing is the shared protocol (tpugan/utils/benchtime.py): warmup
excluded, min-per-length difference method over two run lengths with a
hard scalar sync.

torch-CPU anchors: scripts/baseline_torch_zoo.py (same configs, same
schedules, measured on this host — the reference publishes no numbers).
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from tpugan.utils.benchtime import measure_images_per_sec

# Measured by scripts/baseline_torch_zoo.py on this host (PyTorch CPU,
# reference semantics; see BASELINE.md "Measured anchors").
TORCH_CPU_ANCHOR_IPS = {
    "gan": 1644.7,      # 30 steps after 3 warmup
    "wgan_gp": 1566.3,  # 10 schedule units after 2 (counts critic batches)
    "srgan": 0.2509,    # 2 steps after 1 warmup (15.9 s/step)
    "esrgan": 0.0401,   # 2 steps after 1 warmup (99.7 s/step)
}


def _sync(out, key):
    v = out[key]
    float(v[-1] if getattr(v, "ndim", 0) else v)


def bench_gan() -> tuple[float, str]:
    from tpugan.models import gan
    from tpugan.train.loop import scan_steps

    # K=600 (vs bench.py's 60): the MLP step is ~30 us of compute, so even
    # 60 fused steps leave the dispatch latency-dominated; 600 puts ~20 ms
    # of compute behind each dispatch. uint8 stack = 28 MB host->device.
    K, B, IMG = 600, 64, 28
    cfg = gan.Config(batch_size=B, img_size=IMG, synthetic_data=True)
    modules = gan.build(cfg)
    state = gan.create_state(cfg, modules)
    steps = jax.jit(scan_steps(gan.make_step(cfg, modules)), donate_argnums=0)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, (K, B, IMG, IMG, 1), dtype=np.uint8)
    )
    labels = jax.device_put(np.zeros((K, B), np.int32))

    def dispatch(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = steps(state, imgs, labels)
        _sync(out, "d_loss")
        return time.perf_counter() - t0

    return measure_images_per_sec(dispatch, K * B, 1, 4), "gan_train_images_per_sec_28px"


def bench_wgan_gp() -> tuple[float, str]:
    from tpugan.models import wgan_gp
    from tpugan.models._critic_family import make_schedule_unit
    from tpugan.train.loop import scan_steps

    # 48 schedule units (240 critic + 48 G steps) per dispatch — like the
    # gan config, enough fused compute to stop paying dispatch latency.
    # make_schedule_unit is the SAME fused unit the CLI's
    # --steps_per_dispatch uses (reference schedule wgan_gp.py:144-203).
    K, B, IMG = 48, 64, 28
    cfg = wgan_gp.Config(batch_size=B, img_size=IMG, synthetic_data=True)
    modules = wgan_gp.build(cfg)
    state = wgan_gp.create_state(cfg, modules)
    d_step, g_step = wgan_gp.make_steps(cfg, modules)
    nc = cfg.n_critic

    steps = jax.jit(
        scan_steps(make_schedule_unit(cfg, d_step, g_step)), donate_argnums=0
    )
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, (K, nc, B, IMG, IMG, 1), dtype=np.uint8)
    )
    labels = jax.device_put(np.zeros((K, nc, B), np.int32))

    def dispatch(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = steps(state, imgs, labels)
        _sync(out, "d_loss")
        return time.perf_counter() - t0

    # images/sec counts every critic batch (the reference consumes one
    # loader batch per critic step).
    return (
        measure_images_per_sec(dispatch, K * nc * B, 1, 4),
        "wgan_gp_train_images_per_sec_28px",
    )


def _bench_sr(model: str, n_steps: int) -> tuple[float, str]:
    mod = __import__(f"tpugan.models.{model}", fromlist=[model])
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
    hr_u8 = jax.device_put(
        rng.integers(0, 255, (B, HR, HR, 3), dtype=np.uint8)
    )

    def dispatch(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = step(state, hr_u8)
        _sync(out, "d_loss")
        return time.perf_counter() - t0

    n1 = max(n_steps // 4, 1)
    return (
        measure_images_per_sec(dispatch, B, n1, n_steps),
        f"{model}_train_images_per_sec_256px",
    )


def bench_pix2pix() -> tuple[float, str]:
    """U-Net G + conditional PatchGAN D at the reference's own defaults
    (pix2pix.py:24-41: 256px, batch 1). Step-level confirmation target for
    the stride-2 packed-conv routing arm (nn/layers.py:Conv._pack_factor),
    whose pix2pix-family evidence was previously microbench-only
    (scripts/bench_pack_floor.py)."""
    from tpugan.models import pix2pix

    B, IMG = 1, 256
    cfg = pix2pix.Config(batch_size=B, synthetic_data=True)
    modules = pix2pix.build(cfg)
    state = pix2pix.create_state(cfg, modules)
    step = jax.jit(pix2pix.make_step(cfg, modules), donate_argnums=0)
    rng = np.random.default_rng(0)
    a_u8 = jax.device_put(rng.integers(0, 255, (B, IMG, IMG, 3), dtype=np.uint8))
    b_u8 = jax.device_put(rng.integers(0, 255, (B, IMG, IMG, 3), dtype=np.uint8))

    def dispatch(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = step(state, a_u8, b_u8)
        _sync(out, "d_loss")
        return time.perf_counter() - t0

    return (
        measure_images_per_sec(dispatch, B, 16, 64),
        "pix2pix_train_images_per_sec_256px",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model",
        required=True,
        choices=["gan", "wgan_gp", "srgan", "esrgan", "pix2pix"],
    )
    args = ap.parse_args()
    # TPUGAN_BENCH_DTYPE=bfloat16 measures the mixed-precision production
    # config (same switch as bench.py/bench_cyclegan.py); default fp32 =
    # reference parity.
    dtype = _os.environ.get("TPUGAN_BENCH_DTYPE", "float32")
    if dtype not in ("float32", "bfloat16"):
        raise SystemExit(
            f"TPUGAN_BENCH_DTYPE={dtype!r}: expected float32 or bfloat16"
        )
    if dtype == "bfloat16":
        import jax.numpy as jnp

        from tpugan.nn.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)
    if args.model == "gan":
        ips, metric = bench_gan()
    elif args.model == "wgan_gp":
        ips, metric = bench_wgan_gp()
    elif args.model == "pix2pix":
        ips, metric = bench_pix2pix()
    elif args.model == "srgan":
        ips, metric = _bench_sr("srgan", 16)
    else:
        ips, metric = _bench_sr("esrgan", 8)
    anchor = TORCH_CPU_ANCHOR_IPS.get(args.model)
    rec = {
        "metric": metric,
        "value": round(ips, 2),
        "unit": "images/sec/chip",
    }
    if anchor:
        rec["vs_baseline"] = round(ips / anchor, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
