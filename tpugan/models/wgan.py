"""WGAN (Arjovsky et al. 2017).

Reference: /root/reference/implementations/wgan/wgan.py — template-A MLP
G/critic (no sigmoid, wgan.py:65-80), RMSprop(5e-5) (wgan.py:105-106),
critic loss -mean(D(x)) + mean(D(G(z))) with weight clipping to
±clip_value after every critic step (wgan.py:134-141), generator every
n_critic=5 batches on the same z (wgan.py:144-157). Note the reference
omits the Resize transform (wgan.py:95-99) — images stay 28px, matching
the img_size default.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tpugan.models._critic_family import (
    build_a,
    create_state_a,
    make_d_step,
    make_g_step,
    make_loader_a,
    run_critic_family,
)
from tpugan.train.optim import clip_params, rmsprop_torch
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "wgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with wgan.py:20-31 (no b1/b2 — RMSprop).
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.00005, "learning rate")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(28, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    n_critic: int = flag(5, "number of training steps for discriminator per iter")
    clip_value: float = flag(0.01, "lower and upper clip value for disc. weights")
    sample_interval: int = flag(400, "interval betwen image samples")


build = build_a


def _txs(cfg):
    return rmsprop_torch(cfg.lr), rmsprop_torch(cfg.lr)


def create_state(cfg: Config, modules=None):
    tx_g, tx_d = _txs(cfg)
    return create_state_a(cfg, modules or build(cfg), tx_g, tx_d)


def d_loss_fn(d_apply, real, fake, rng):
    del rng
    return -jnp.mean(d_apply(real)) + jnp.mean(d_apply(fake))


def make_steps(cfg: Config, modules=None):
    modules = modules or build(cfg)
    tx_g, tx_d = _txs(cfg)
    d_step = make_d_step(
        cfg, modules, tx_d, d_loss_fn,
        post_update=lambda p: clip_params(p, cfg.clip_value),
    )
    g_step = make_g_step(cfg, modules, tx_g)
    return d_step, g_step


make_loader = make_loader_a


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    d_step, g_step = make_steps(cfg, modules)
    return run_critic_family(
        cfg, modules, state, d_step, g_step, sample_inside_gstep=False
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
