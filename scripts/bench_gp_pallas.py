#!/usr/bin/env python
"""North-star measurement: fused WGAN-GP closed-form penalty vs autodiff.

BASELINE.json's north-star clause names the gradient-penalty
double-backward (wgan_gp/wgan_gp.py:119-138) as a candidate Pallas win.
ops/pallas_critic.py implements the template-A MLP critic's penalty in
closed form twice — plain XLA ops and a single-block VMEM-resident Pallas
pair — and this script measures all three implementations on the chip:

1. ``penalty_us`` — the isolated value+param-grad of the penalty, K
   iterations fused into one ``lax.scan`` dispatch with the params
   perturbed each iteration (defeats CSE; drowns the ~ms dispatch latency
   that otherwise dominates a ~20 us computation).
2. ``unit_ips`` — the full wgan_gp schedule unit (5 critic + 1 G step,
   bench_zoo.py config) with TPUGAN_PALLAS_GP routing the penalty.

Run once per mode::

    python scripts/bench_gp_pallas.py --mode generic|xla|pallas

Prints one JSON line. ``generic`` is the production default
(ops/penalty.py via jax.grad composition); deltas vs it answer the
north-star question either way.
"""

from __future__ import annotations

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def _penalty_loss(mode, mods):
    import jax
    import jax.numpy as jnp

    from tpugan.models._common import apply_mod
    from tpugan.nn.layers import flatten_nchw
    from tpugan.ops.pallas_critic import extract_mlp_critic, mlp_gp_pallas, mlp_gp_xla
    from tpugan.ops.penalty import wgan_gp_penalty

    if mode == "generic":

        def loss(d_params, real, fake, key):
            def d_apply(x):
                out, _ = apply_mod(
                    mods["discriminator"], d_params, None, x, train=True
                )
                return out

            return wgan_gp_penalty(d_apply, real, fake, key)

    else:
        fn = mlp_gp_xla if mode == "xla" else mlp_gp_pallas

        def loss(d_params, real, fake, key):
            w1, b1, w2, b2, w3 = extract_mlp_critic(d_params)
            alpha = jax.random.uniform(
                key, (real.shape[0],) + (1,) * (real.ndim - 1), real.dtype
            )
            x = flatten_nchw(alpha * real + (1.0 - alpha) * fake)
            return fn(x, w1, b1, w2, b2, w3)

    return loss


def bench_penalty(mode: str) -> float:
    """Microseconds per fused penalty value+grad (reference config:
    batch 64, 784 -> 512 -> 256 critic)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpugan.models import wgan_gp
    from tpugan.utils.benchtime import measure_images_per_sec

    K = int(_os.environ.get("TPUGAN_BENCH_K", "512"))
    B, IMG = 64, 28
    cfg = wgan_gp.Config(batch_size=B, img_size=IMG, synthetic_data=True)
    mods = wgan_gp.build(cfg)
    state = wgan_gp.create_state(cfg, mods)
    loss = _penalty_loss(mode, mods)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(0, 0.7, (B, IMG, IMG, 1)), jnp.float32)
    fake = jnp.asarray(rng.normal(0, 0.7, (B, IMG, IMG, 1)), jnp.float32)

    def unit(carry, _):
        params, key = carry
        key, sub = jax.random.split(key)
        v, g = jax.value_and_grad(loss)(params, real, fake, sub)
        # Perturb the params each iteration so XLA cannot CSE the K
        # iterations into one; 1e-6 keeps the trajectory numerically tame.
        params = jax.tree_util.tree_map(lambda p, gg: p - 1e-6 * gg, params, g)
        return (params, key), v

    @jax.jit
    def run(params, key):
        (params, key), vs = jax.lax.scan(
            unit, (params, key), None, length=K
        )
        return params, key, vs

    params = state.params["discriminator"]
    key = jax.random.PRNGKey(0)

    def dispatch(n):
        nonlocal params, key
        t0 = time.perf_counter()
        for _ in range(n):
            params, key, vs = run(params, key)
        float(vs[-1])
        return time.perf_counter() - t0

    rate = measure_images_per_sec(dispatch, K, 1, 4)
    return 1e6 / rate  # us per penalty


def bench_unit(mode: str) -> float:
    """Full schedule-unit throughput (bench_zoo.py wgan_gp config) with
    TPUGAN_PALLAS_GP routing the penalty inside the real d_step."""
    if mode != "generic":
        _os.environ["TPUGAN_PALLAS_GP"] = "xla" if mode == "xla" else "1"
    else:
        _os.environ.pop("TPUGAN_PALLAS_GP", None)
    from bench_zoo import bench_wgan_gp

    return bench_wgan_gp()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True, choices=["generic", "xla", "pallas"])
    ap.add_argument("--skip_unit", action="store_true")
    args = ap.parse_args()
    penalty_us = bench_penalty(args.mode)
    rec = {
        "metric": f"wgan_gp_penalty_value_and_grad_{args.mode}",
        "value": round(penalty_us, 2),
        "unit": "us",
    }
    if not args.skip_unit:
        rec["unit_ips"] = round(bench_unit(args.mode), 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
