"""SGAN (Odena 2016) — Semi-Supervised GAN.

Reference: /root/reference/implementations/sgan/sgan.py — template-B conv G
on plain z (sgan.py:48-73), D with adv (Sigmoid) + (num_classes+1)-way aux
Softmax head where the extra class means "fake" (sgan.py:98-99,162).
G: BCE only (sgan.py:185); D: (BCE + CE)/2 on real with true labels and on
fake with the fake-class label, halved again (sgan.py:193-202). The aux
Softmax->CrossEntropy double-softmax quirk is kept. 25-sample 5x5 grid
(sgan.py:219-220).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.losses import bce, cross_entropy_on_softmax
from tpugan.models import dcgan as _dcgan
from tpugan.models._common import (
    apply_mod,
    grid_sampler,
    init_module,
    run_mnist_recipe,
)
from tpugan.nn.blocks import DCGANGenerator, DCGANTrunk
from tpugan.nn.layers import Linear
from tpugan.train.loop import Callbacks
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "sgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with sgan.py:20-31 (note --num_classes, not --n_classes).
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    num_classes: int = flag(10, "number of classes for dataset")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval between image sampling")


class SGANDiscriminator(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        feat = DCGANTrunk(init_mode="normal02")(img, train=train)
        validity = jax.nn.sigmoid(Linear(1)(feat))
        label = jax.nn.softmax(Linear(self.num_classes + 1)(feat), axis=-1)
        return validity, label


def build(cfg: Config):
    return {
        "generator": DCGANGenerator(
            img_size=cfg.img_size, channels=cfg.channels, init_mode="normal02"
        ),
        "discriminator": SGANDiscriminator(num_classes=cfg.num_classes),
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
    return TrainState.create(
        params,
        {"generator": tx.init(g_params), "discriminator": tx.init(d_params)},
        k_state,
        model_state={"generator": g_bs, "discriminator": d_bs},
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        real = normalize_uint8(imgs_u8)
        labels = labels.astype(jnp.int32)
        rng, k_z, k_do1, k_do2, k_do3 = jax.random.split(state.rng, 5)
        bsz = real.shape[0]
        z = jax.random.normal(k_z, (bsz, cfg.latent_dim))
        fake_aux_gt = jnp.full((bsz,), cfg.num_classes, jnp.int32)

        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            (validity, _), d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, train=True,
                dropout_rng=k_do1,
            )
            return bce(validity, 1.0), (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            (real_pred, real_aux), bs1 = apply_mod(
                D, d_params, d_bs, real, train=True, dropout_rng=k_do2
            )
            (fake_pred, fake_aux), bs2 = apply_mod(
                D, d_params, bs1, gen_detached, train=True, dropout_rng=k_do3
            )
            d_real = 0.5 * (
                bce(real_pred, 1.0) + cross_entropy_on_softmax(real_aux, labels)
            )
            d_fake = 0.5 * (
                bce(fake_pred, 0.0)
                + cross_entropy_on_softmax(fake_aux, fake_aux_gt)
            )
            pred = jnp.concatenate([real_aux, fake_aux], axis=0)
            gt = jnp.concatenate([labels, fake_aux_gt], axis=0)
            acc = jnp.mean((jnp.argmax(pred, axis=1) == gt).astype(jnp.float32))
            return 0.5 * (d_real + d_fake), (bs2, acc)

        (d_loss, (d_bs_final, d_acc)), d_grads = jax.value_and_grad(
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
        out = {
            "d_loss": d_loss, "g_loss": g_loss, "d_acc": d_acc,
            "gen_imgs": gen_imgs,
        }
        return new_state, out

    return step


make_loader = _dcgan.make_loader


def run(cfg: Config):
    import tpugan.models.sgan as m

    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f, acc: %d%%] [G loss: %f]"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), int(100 * float(out["d_acc"])),
                float(out["g_loss"]),
            )
        )

    return run_mnist_recipe(
        cfg, m, Callbacks(log=log, sample=grid_sampler(cfg))
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
