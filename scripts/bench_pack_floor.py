#!/usr/bin/env python
"""Pack-routing floor A/B: the boundary-conv shapes the production floors
currently keep on the direct path, measured in isolation on the real chip.

Shapes under test (VERDICT r3 item 2b):

- ``srgan_stem``   k=9 s=1  3->64 @ 64px  b4 — the SRGAN c9s1-64 stem
                   (srgan/models.py:33-40) runs at LR 64px, BELOW the
                   128x128 _PACK3_MIN_PIXELS floor (nn/layers.py).
- ``pix2pix_d``    k=4 s=2  6->64 @256px  b1 — the PatchGAN entry conv
                   (pix2pix/models.py:114), below the k>=5 floor; needs
                   the STRIDED packing (conv_pack.py stride parameter).
- ``pix2pix_g``    k=4 s=2  3->64 @256px  b1 — the UNetDown entry
                   (pix2pix/models.py:16-27).

Each case times fwd+bwd (value_and_grad of a mean-square head w.r.t. x and
kernel — the training-step work) for the direct lowering and the packed
lowering at r in {4, 8}, K_ITERS sequential applications fused into one
dispatch via lax.scan (sub-ms ops through the remote tunnel are dispatch-
bound otherwise; the data-dependent carry defeats CSE). Timing is the
shared protocol (tpugan/utils/benchtime.py). One JSON line per case.
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.ops.conv_pack import conv_small_channel
from tpugan.utils.benchtime import measure_images_per_sec

K_ITERS = 50
N1, N2 = 2, 6

CASES = {
    # name: (batch, hw, cin, cout, k, stride, padding)
    "srgan_stem": (4, 64, 3, 64, 9, 1, 4),
    "pix2pix_d": (1, 256, 6, 64, 4, 2, 1),
    "pix2pix_g": (1, 256, 3, 64, 4, 2, 1),
    # Shipped stride-1 boundaries (r=8 today) — is r=4 better there too?
    "cyclegan_in": (1, 262, 3, 64, 7, 1, 0),   # reflection-padded c7s1-64
    "cyclegan_out": (1, 262, 64, 3, 7, 1, 0),  # c7s1-3 exit
    # k=3 boundary shapes (r5): the srgan/esrgan discriminator entry conv
    # AND VGG19 conv1_1 share the first shape (srgan/models.py:74-95,
    # vgg19 features[0]); the esrgan G tail (esrgan/models.py:84) and its
    # LR-64px stem are the others. Excluded from routing today by the
    # k>=5 floor; the r5 srgan trace puts D fwd+bwd at 40% of the step.
    "sr_d_entry": (4, 256, 3, 64, 3, 1, 1),
    "esrgan_tail": (4, 256, 64, 3, 3, 1, 1),
    "esrgan_stem64": (4, 64, 3, 64, 3, 1, 1),
}


def _variant_fn(case, variant, dtype):
    b, hw, cin, cout, k, s, pad = CASES[case]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, hw, hw, cin)), dtype)
    kern = jnp.asarray(rng.normal(0, 0.1, (k, k, cin, cout)), dtype)

    if variant == "direct":
        conv = lambda x_, k_: jax.lax.conv_general_dilated(
            x_, k_, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        r = int(variant.split("_r")[1])
        conv = lambda x_, k_: conv_small_channel(
            x_, k_, padding=pad, r=r, stride=s
        )

    def loss(x_, k_):
        return jnp.mean(jnp.square(conv(x_, k_)))

    vg = jax.value_and_grad(loss, argnums=(0, 1))

    def unit(carry, _):
        v, (gx, gk) = vg(x + carry, kern)
        return (v + jnp.mean(gx) + jnp.mean(gk)).astype(dtype), ()

    @jax.jit
    def burst(c0):
        c, _ = jax.lax.scan(unit, c0, None, length=K_ITERS)
        return c

    def dispatch(n):
        t0 = time.perf_counter()
        c = jnp.asarray(0.0, dtype)
        for _ in range(n):
            c = burst(c)
        float(c)  # hard D2H sync (axon under-waits on block_until_ready)
        return time.perf_counter() - t0

    return dispatch


def main() -> None:
    dtype_s = _os.environ.get("TPUGAN_BENCH_DTYPE", "float32")
    dtype = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
    only = _sys.argv[1] if len(_sys.argv) > 1 else None
    for case in CASES:
        if only and case != only:
            continue
        row = {"case": case, "dtype": dtype_s, "unit": "us/fwdbwd"}
        for variant in ("direct", "pack_r2", "pack_r4", "pack_r8"):
            b, hw, cin, cout, k, s, pad = CASES[case]
            if variant != "direct" and int(variant.split("_r")[1]) % s:
                continue
            if variant == "pack_r2" and k != 3:
                continue  # r=2 only plausibly competitive at k=3 (1.8x FLOPs)
            dispatch = _variant_fn(case, variant, dtype)
            # calls/sec via the shared protocol, then us per fwd+bwd call
            rate = measure_images_per_sec(dispatch, K_ITERS, N1, N2)
            row[variant] = round(1e6 / rate, 1)
        base = row.get("direct")
        best = min(v for kk, v in row.items() if kk.startswith("pack"))
        row["pack_speedup"] = round(base / best, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
