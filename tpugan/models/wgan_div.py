"""WGAN-DIV (Wu et al. 2018) — Wasserstein divergence.

Reference: /root/reference/implementations/wgan_div/wgan_div.py —
template-A MLP G/critic, Adam (wgan_div.py:114-115), critic loss
-mean(D(x)) + mean(D(G(z))) + div_gp where div_gp penalizes
||dD/dx||^p on real and fake separately with k=2, p=6
(wgan_div.py:86-87,148-163); generator every n_critic=5 on the same z.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tpugan.models import wgan_gp as _gp
from tpugan.models._critic_family import (
    build_a,
    create_state_a,
    make_d_step,
    make_g_step,
    make_loader_a,
    run_critic_family,
)
from tpugan.ops.penalty import wdiv_penalty
from tpugan.train.optim import adam_torch
from tpugan.utils.config import config_from_args

NAME = "wgan_div"
K, P = 2.0, 6.0  # wgan_div.py:86-87


@dataclasses.dataclass
class Config(_gp.Config):
    # Flag parity with wgan_div.py:22-33 (identical set to wgan_gp).
    pass


build = build_a


def create_state(cfg: Config, modules=None):
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    return create_state_a(cfg, modules or build(cfg), tx, tx)


def d_loss_fn(d_apply, real, fake, rng):
    del rng
    div = wdiv_penalty(d_apply, real, fake, k=K, p=P)
    return -jnp.mean(d_apply(real)) + jnp.mean(d_apply(fake)) + div


def make_steps(cfg: Config, modules=None):
    modules = modules or build(cfg)
    tx_g = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    tx_d = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    return (
        make_d_step(cfg, modules, tx_d, d_loss_fn),
        make_g_step(cfg, modules, tx_g),
    )


make_loader = make_loader_a


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    d_step, g_step = make_steps(cfg, modules)
    return run_critic_family(
        cfg, modules, state, d_step, g_step, sample_inside_gstep=True
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
