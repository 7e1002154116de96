"""DRAGAN (Kodali et al. 2017) — "On Convergence and Stability of GANs".

Reference: /root/reference/implementations/dragan/dragan.py — template-B
conv G/D (weights_init_normal), BCE 1:1 G-then-D Adam schedule
(dragan.py:184-217), plus a gradient penalty on perturbed REAL data
(dragan.py:142-167, lambda_gp=10).

Latent reference bugs (SURVEY.md §5 items 2 + new) and our policy
(default fixed, ``--reference_quirks`` restores them):
1. The loop iterates undefined ``mnist_loader`` (dragan.py:175) — fixed to
   the actual dataloader (the script as published crashes).
2. ``d_loss.backward()`` is never called — only
   ``gradient_penalty.backward()`` (dragan.py:209-217), so the reference D
   learns from the penalty alone. Default here: D minimizes
   d_loss + lambda_gp * penalty; with --reference_quirks the update uses
   the penalty only.
3. Sampling is per-EPOCH: full batch, nrow=sqrt(batch_size)
   (dragan.py:224).
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import optax

from tpugan.io.images import save_image
from tpugan.losses import bce
from tpugan.models import dcgan as _dcgan
from tpugan.models._common import apply_mod
from tpugan.models._template_b import create_state_b
from tpugan.ops.penalty import dragan_penalty
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import normalize_uint8
from tpugan.utils.config import config_from_args, flag

NAME = "dragan"
LAMBDA_GP = 10.0  # dragan.py:107


@dataclasses.dataclass
class Config(_dcgan.Config):
    # Flag parity with dragan.py:21-33 (same set as dcgan, 32px default).
    reference_quirks: bool = flag(
        False, "reproduce the reference's penalty-only D update (latent bug)"
    )


def build(cfg: Config):
    return _dcgan.build(cfg)


def create_state(cfg: Config, modules=None):
    return create_state_b(cfg, modules or build(cfg))


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z, k_do1, k_do2, k_do3, k_do4, k_pen = jax.random.split(state.rng, 7)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))

        # --- G phase (dragan.py:184-200) ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            d_out, d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, train=True,
                dropout_rng=k_do1,
            )
            return bce(d_out, 1.0), (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (dragan.py:202-217) ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_objective(d_params):
            d_real, bs1 = apply_mod(
                D, d_params, d_bs, real, train=True, dropout_rng=k_do2
            )
            d_fake, bs2 = apply_mod(
                D, d_params, bs1, gen_detached, train=True, dropout_rng=k_do3
            )
            d_loss = 0.5 * (bce(d_real, 1.0) + bce(d_fake, 0.0))

            def d_apply(x):
                out, _ = apply_mod(
                    D, d_params, bs2, x, train=True, dropout_rng=k_do4
                )
                return out

            gp = LAMBDA_GP * dragan_penalty(d_apply, real, k_pen)
            objective = gp if cfg.reference_quirks else d_loss + gp
            return objective, (d_loss, bs2)

        (_, (d_loss, d_bs_final)), d_grads = jax.value_and_grad(
            d_objective, has_aux=True
        )(state.params["discriminator"])
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            model_state={"generator": g_bs, "discriminator": d_bs_final},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss, "gen_imgs": gen_imgs}

    return step


make_loader = _dcgan.make_loader


def run(cfg: Config):
    import tpugan.models.dragan as m

    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    modules = build(cfg)
    state = create_state(cfg, modules)
    loader = make_loader(cfg)
    step = make_step(cfg, modules)
    last = {"gen": None}

    def log(epoch, i, bpe, out):
        last["gen"] = out["gen_imgs"]
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
            % (epoch, cfg.n_epochs, i, bpe, float(out["d_loss"]), float(out["g_loss"]))
        )

    def epoch_end(state, epoch):
        if last["gen"] is not None:
            save_image(
                jax.device_get(last["gen"]),
                os.path.join(imgdir, "%d.png" % epoch),
                nrow=int(math.sqrt(cfg.batch_size)),
                normalize=True,
            )
        return state

    return run_training(
        cfg, loader, state, step,
        Callbacks(log=log, epoch_end=epoch_end),
        n_epochs=cfg.n_epochs,
        sample_interval=0,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
