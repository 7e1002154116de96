"""Shared recipe plumbing for the MNIST-family models.

``apply_mod`` hides the flax collection/rng bookkeeping (batch_stats
mutation, dropout keys) so each recipe's train step reads like the
reference's loop body. ``run_mnist_recipe`` is the canonical outer loop
(epochs, log line, 5x5 sample grid) shared by the template-A/B scripts.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from tpugan.io.images import save_image
from tpugan.train.loop import Callbacks, run_training


def apply_mod(
    module,
    params,
    batch_stats,
    *args,
    train: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    method=None,
    **kwargs,
):
    """Apply a flax module, returning (out, new_batch_stats).

    batch_stats may be an empty dict/None for stat-free modules; running
    stats are mutated only in train mode (PyTorch .train() semantics).
    """
    variables = {"params": params}
    has_stats = batch_stats is not None and len(batch_stats) > 0
    if has_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    # Name-scope every application so HLO dumps and profiler traces map
    # ops back to model phases (SURVEY §5 tracing hook; the torch profiler
    # shows module names natively — this is the XLA-side equivalent).
    with jax.named_scope(type(module).__name__):
        if has_stats and train:
            out, mut = module.apply(
                variables, *args, train=train, mutable=["batch_stats"],
                rngs=rngs, method=method, **kwargs,
            )
            return out, mut["batch_stats"]
        out = module.apply(
            variables, *args, train=train, rngs=rngs, method=method, **kwargs
        )
    return out, batch_stats


def init_module(module, rng, *args, **kwargs):
    """Init returning (params, batch_stats)."""
    variables = module.init(rng, *args, **kwargs)
    return variables["params"], dict(variables.get("batch_stats", {}))


def std_log_line(cfg):
    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
            % (
                epoch,
                cfg.n_epochs,
                i,
                bpe,
                float(out["d_loss"]),
                float(out["g_loss"]),
            )
        )

    return log


def grid_sampler(cfg, key: str = "gen_imgs", n: int = 25, nrow: int = 5):
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)

    def sample(state, out, batches_done):
        imgs = jax.device_get(out[key][:n])
        save_image(
            imgs,
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=nrow,
            normalize=True,
        )

    return sample


def run_mnist_recipe(cfg, recipe_mod, callbacks: Optional[Callbacks] = None):
    """Standard driver: build -> init -> loader -> jitted loop.

    When more than one accelerator is visible, the step runs data-parallel
    over the full ICI mesh automatically (GSPMD: batch sharded on axis
    'data', state replicated, gradient all-reduce inserted by XLA) — the
    global batch semantics match single-device exactly (tests/
    test_parallel.py), so the reference CLI contract is unchanged.
    """
    modules = recipe_mod.build(cfg)
    state = recipe_mod.create_state(cfg, modules)
    sharding = None
    if jax.device_count() > 1 and cfg.batch_size % jax.device_count() == 0:
        from tpugan.parallel import batch_sharding, data_mesh, shard_state

        mesh = data_mesh()
        state = shard_state(state, mesh)
        sharding = batch_sharding(mesh)
        print(
            "[tpugan] data-parallel over %d devices" % jax.device_count()
        )
    try:
        loader = recipe_mod.make_loader(cfg, sharding=sharding)
    except TypeError:
        loader = recipe_mod.make_loader(cfg)
    step = recipe_mod.make_step(cfg, modules)
    cb = callbacks or Callbacks(
        log=std_log_line(cfg), sample=grid_sampler(cfg)
    )
    return run_training(
        cfg,
        loader,
        state,
        step,
        cb,
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )
