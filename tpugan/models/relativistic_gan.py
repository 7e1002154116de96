"""Relativistic GAN (Jolicoeur-Martineau 2018).

Reference: /root/reference/implementations/relativistic_gan/relativistic_gan.py
— template-B conv G/D on MNIST 32px, D without sigmoid, BCEWithLogits
(relativistic_gan.py:84,95), no weights_init_normal (torch default init).
D loss is relativistic: RSGAN ``D(x) - D(G(z))`` or, with ``--rel_avg_gan``,
RaGAN mean-centered differences (relativistic_gan.py:169-179).

Reference quirk (default fixed, ``--reference_quirks`` restores it, SURVEY.md
§5 item 3): the reference computes the relativistic G loss
(relativistic_gan.py:151-154) then immediately OVERWRITES it with plain
BCEWithLogits(D(G(z)), 1) (relativistic_gan.py:157), so the shipped G update
is non-relativistic. Default here uses the clearly-intended relativistic G
loss; ``--reference_quirks`` reproduces the overwritten (plain) one.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from tpugan.losses import bce_with_logits
from tpugan.models import dcgan as _dcgan
from tpugan.models._common import apply_mod, init_module, run_mnist_recipe
from tpugan.nn.blocks import DCGANGenerator, DCGANTrunk
from tpugan.nn.layers import Linear
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

import flax.linen as nn

NAME = "relativistic_gan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with relativistic_gan.py:20-31.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval betwen image samples")
    rel_avg_gan: bool = flag(False, "relativistic average GAN instead of standard")
    reference_quirks: bool = flag(
        False, "reproduce the reference's g_loss overwrite (plain BCE G update)"
    )


class _Critic(nn.Module):
    """Trunk + raw linear head (relativistic_gan.py:65-91); torch init."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        feat = DCGANTrunk(init_mode="torch")(img, train=train)
        return Linear(1)(feat)


def build(cfg: Config):
    return {
        "generator": DCGANGenerator(
            img_size=cfg.img_size, channels=cfg.channels, init_mode="torch"
        ),
        "discriminator": _Critic(),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, img, train=True)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state,
        model_state={"generator": g_bs, "discriminator": d_bs},
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z, k_do1, k_do2, k_do3, k_do4 = jax.random.split(state.rng, 6)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))

        # --- G phase (relativistic_gan.py:140-160). The reference runs
        # D(real) first (stats update 1, output detached), then D(gen). ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            real_pred, bs1 = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], real, train=True,
                dropout_rng=k_do1,
            )
            real_pred = jax.lax.stop_gradient(real_pred)
            fake_pred, bs2 = apply_mod(
                D, state.params["discriminator"], bs1, gen, train=True,
                dropout_rng=k_do2,
            )
            if cfg.reference_quirks:
                # The overwrite at relativistic_gan.py:157.
                loss = bce_with_logits(fake_pred, 1.0)
            elif cfg.rel_avg_gan:
                loss = bce_with_logits(
                    fake_pred - jnp.mean(real_pred, axis=0, keepdims=True), 1.0
                )
            else:
                loss = bce_with_logits(fake_pred - real_pred, 1.0)
            return loss, (gen, g_bs, bs2)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (relativistic_gan.py:166-182) ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            real_pred, bs1 = apply_mod(
                D, d_params, d_bs, real, train=True, dropout_rng=k_do3
            )
            fake_pred, bs2 = apply_mod(
                D, d_params, bs1, gen_detached, train=True, dropout_rng=k_do4
            )
            if cfg.rel_avg_gan:
                real_loss = bce_with_logits(
                    real_pred - jnp.mean(fake_pred, axis=0, keepdims=True), 1.0
                )
                fake_loss = bce_with_logits(
                    fake_pred - jnp.mean(real_pred, axis=0, keepdims=True), 0.0
                )
            else:
                real_loss = bce_with_logits(real_pred - fake_pred, 1.0)
                fake_loss = bce_with_logits(fake_pred - real_pred, 0.0)
            return (real_loss + fake_loss) / 2, bs2

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


make_loader = _dcgan.make_loader


def run(cfg: Config):
    return run_mnist_recipe(cfg, _this())


def _this():
    import tpugan.models.relativistic_gan as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
