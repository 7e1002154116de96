#!/usr/bin/env python
"""FID evaluation harness.

Trains-free scoring: generate N samples from a (fresh or checkpointed)
MNIST-family generator and compute the Frechet distance against the real
(or synthetic-fallback) dataset using the shared feature backbone
(tpugan.metrics.fid — VGG19 by default; drop vgg19_features.npz under
--data_dir for pretrained features).

    PYTHONPATH=/root/repo python scripts/eval_fid.py --model dcgan \
        --n_samples 2048 [--state path/to/state.msgpack]

Prints one JSON line: {"model": ..., "fid": ..., "n": ...}.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dcgan")
    ap.add_argument("--n_samples", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--state", default="", help="optional TrainState msgpack")
    ap.add_argument("--synthetic_data", action="store_true")
    args = ap.parse_args()

    from tpugan.metrics.fid import feature_model, fid_from_features
    from tpugan.models import registry

    recipe = registry.get(args.model)
    cfg = recipe.Config(
        data_dir=args.data_dir, synthetic_data=args.synthetic_data
    )
    modules = recipe.build(cfg)
    state = recipe.create_state(cfg, modules)
    if args.state:
        from tpugan.io.checkpoint import load_pytree

        state = load_pytree(state, args.state)

    G = modules["generator"]
    from tpugan.models._common import apply_mod

    @jax.jit
    def gen(params, g_bs, rng):
        z = jax.random.normal(rng, (args.batch, cfg.latent_dim))
        out, _ = apply_mod(G, params, g_bs, z, train=True)
        return out

    fake_batches = []
    rng = jax.random.PRNGKey(123)
    for i in range(-(-args.n_samples // args.batch)):
        fake_batches.append(
            gen(
                state.params["generator"],
                state.model_state.get("generator", {}),
                jax.random.fold_in(rng, i),
            )
        )

    loader = recipe.make_loader(cfg)
    real_batches = []
    seen = 0
    for batch in loader.epoch(0):
        x = (batch[0].astype(jnp.float32) / 255.0) * 2.0 - 1.0
        real_batches.append(x)
        seen += x.shape[0]
        if seen >= args.n_samples:
            break

    # InceptionV3 pool3 when inception_v3.npz is on disk, else VGG19.
    model = feature_model(data_dir=args.data_dir)
    fid = fid_from_features(
        model(real_batches)[: args.n_samples],
        model(fake_batches)[: args.n_samples],
    )
    print(json.dumps({"model": args.model, "fid": round(fid, 3),
                      "n": args.n_samples}))


if __name__ == "__main__":
    main()
