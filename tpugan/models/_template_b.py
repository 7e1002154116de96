"""Template-B (DCGAN-style) 1:1 alternating step factory.

Shared by dcgan (BCE, /root/reference/implementations/dcgan/dcgan.py:143-183)
and lsgan (MSE, lsgan/lsgan.py:140-188): G update first on the fresh fake
batch, then D update on real + the same fakes detached, both Adam. The
discriminator's BatchNorm running stats are threaded through all three D
forwards in reference order (G-phase fake, D-phase real, D-phase fake), and
each forward gets a fresh Dropout2d mask, matching PyTorch train-mode
behavior.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpugan.models._common import apply_mod, init_module
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8


def create_state_b(cfg, modules) -> TrainState:
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, img, train=True)
    params = {"generator": g_params, "discriminator": d_params}
    model_state = {"generator": g_bs, "discriminator": d_bs}
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    opt_state = {
        "generator": tx.init(g_params),
        "discriminator": tx.init(d_params),
    }
    return TrainState.create(params, opt_state, k_state, model_state=model_state)


def make_step_b(cfg, modules, adv_loss: Callable):
    """adv_loss(d_out, target_scalar) -> scalar (bce for dcgan, mse for
    lsgan)."""
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z, k_do1, k_do2, k_do3 = jax.random.split(state.rng, 5)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))

        # --- G phase ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            d_out, d_bs = apply_mod(
                D,
                state.params["discriminator"],
                state.model_state["discriminator"],
                gen,
                train=True,
                dropout_rng=k_do1,
            )
            return adv_loss(d_out, 1.0), (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (fakes detached from pre-update G) ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            d_real, bs1 = apply_mod(
                D, d_params, d_bs, real, train=True, dropout_rng=k_do2
            )
            d_fake, bs2 = apply_mod(
                D, d_params, bs1, gen_detached, train=True, dropout_rng=k_do3
            )
            loss = 0.5 * (adv_loss(d_real, 1.0) + adv_loss(d_fake, 0.0))
            return loss, bs2

        (d_loss, d_bs_final), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
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
