"""Softmax GAN (Lin 2017).

Reference: /root/reference/implementations/softmax_gan/softmax_gan.py —
template-A MLP G + sigmoid-free MLP critic (softmax_gan.py:38-80), MNIST
28x28. Single fused step (softmax_gan.py:125-159): one forward computes
d_real/d_fake, the batch-space partition Z = sum(exp(-d_real)) +
sum(exp(-d_fake)), then
    d_loss = (1/B)  * sum(d_real) + log(Z + 1e-8)
    g_loss = (1/2B) * (sum(d_real) + sum(d_fake)) + log(Z + 1e-8)
with the reference's log(x + 1e-8) stabilizer (softmax_gan.py:117-118).

Gradient-accumulation parity: the reference zero-grads BOTH optimizers once
at the top, runs d_loss.backward(retain_graph=True), steps D, then
g_loss.backward() and steps G (softmax_gan.py:128-159). Because d_loss
depends on G through d_fake and grads accumulate, G's applied update is
grad_G(d_loss + g_loss), while D's is grad_D(d_loss) — and both backwards
use activations from the pre-update parameters. Reproduced exactly below by
differentiating the joint forward once per parameter set.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from tpugan.models import gan as _gan
from tpugan.models._common import apply_mod, init_module, run_mnist_recipe
from tpugan.nn.blocks import MLPDiscriminator, MLPGenerator
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "softmax_gan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with softmax_gan.py:19-29.
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
        "discriminator": MLPDiscriminator(sigmoid=False),  # raw energy head
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


def _log(x):
    return jnp.log(x + 1e-8)  # softmax_gan.py:117-118


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z = jax.random.split(state.rng)
        bsz = real.shape[0]
        z = jax.random.normal(k_z, (bsz, cfg.latent_dim))
        d_target = 1.0 / bsz
        g_target = 1.0 / (bsz * 2)

        # One joint forward (softmax_gan.py:143-157); both losses share it.
        def losses_fn(params):
            gen, g_bs = apply_mod(
                G, params["generator"], state.model_state["generator"], z,
                train=True,
            )
            d_real, _ = apply_mod(D, params["discriminator"], None, real)
            d_fake, _ = apply_mod(D, params["discriminator"], None, gen)
            part = jnp.sum(jnp.exp(-d_real)) + jnp.sum(jnp.exp(-d_fake))
            d_loss = d_target * jnp.sum(d_real) + _log(part)
            g_loss = g_target * (jnp.sum(d_real) + jnp.sum(d_fake)) + _log(part)
            return d_loss, g_loss, gen, g_bs

        def d_objective(d_params):
            d_loss, g_loss, gen, g_bs = losses_fn(
                {"generator": state.params["generator"], "discriminator": d_params}
            )
            return d_loss, (g_loss, gen, g_bs)

        def g_objective(g_params):
            d_loss, g_loss, _, _ = losses_fn(
                {"generator": g_params, "discriminator": state.params["discriminator"]}
            )
            # Accumulation parity: G sees d_loss + g_loss (see module docstring).
            return d_loss + g_loss

        (d_loss, (g_loss, gen_imgs, g_bs)), d_grads = jax.value_and_grad(
            d_objective, has_aux=True
        )(state.params["discriminator"])
        g_grads = jax.grad(g_objective)(state.params["generator"])

        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

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
    import tpugan.models.softmax_gan as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
