"""Boundary-Seeking GAN (Hjelm et al. 2017).

Reference: /root/reference/implementations/bgan/bgan.py — template-A MLP G/D
on MNIST 28x28 (bgan.py:40-82), G trained with the boundary-seeking loss
0.5*mean((log D - log(1-D))^2) (bgan.py:85-90,148), D with plain BCE
(bgan.py:93,160-162), 1:1 Adam updates.

Reference quirk (fixed here, documented per SURVEY.md §5 item 2): the
reference's loop iterates an undefined ``mnist_loader`` (bgan.py:126) — the
loader is actually named ``dataloader``; as written the script crashes with
NameError. We run the obviously-intended loop. No ``--reference_quirks``
branch exists for this one since reproducing a NameError is not a behavior.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from tpugan.losses import bce, boundary_seeking
from tpugan.models import gan as _gan
from tpugan.models._common import apply_mod, init_module, run_mnist_recipe
from tpugan.nn.blocks import MLPDiscriminator, MLPGenerator
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "bgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with bgan.py:21-31.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(28, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval betwen image samples")


def build(cfg: Config):
    img_shape = (cfg.img_size, cfg.img_size, cfg.channels)
    return {
        "generator": MLPGenerator(img_shape=img_shape),
        "discriminator": MLPDiscriminator(sigmoid=True),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, train=True)
    d_params, _ = init_module(modules["discriminator"], k_d, img, train=True)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"generator": g_bs}
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z = jax.random.split(state.rng)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))

        # --- G phase (bgan.py:139-151): boundary-seeking loss ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            d_out, _ = apply_mod(D, state.params["discriminator"], None, gen)
            return boundary_seeking(d_out), (gen, g_bs)

        (g_loss, (gen_imgs, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (bgan.py:157-165): plain BCE on real + detached fakes ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            real_out, _ = apply_mod(D, d_params, None, real)
            fake_out, _ = apply_mod(D, d_params, None, gen_detached)
            return (bce(real_out, 1.0) + bce(fake_out, 0.0)) / 2

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"]
        )
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            model_state={"generator": g_bs},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss, "gen_imgs": gen_imgs}

    return step


make_loader = _gan.make_loader


def run(cfg: Config):
    return run_mnist_recipe(cfg, _this())


def _this():
    import tpugan.models.bgan as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
