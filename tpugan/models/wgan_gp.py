"""WGAN-GP (Gulrajani et al. 2017).

Reference: /root/reference/implementations/wgan_gp/wgan_gp.py — template-A
MLP G/critic, Adam(2e-4, 0.5, 0.999) (wgan_gp.py:113-114), critic loss
-mean(D(x)) + mean(D(G(z))) + 10*GP (wgan_gp.py:171) with the
double-backward gradient penalty on alpha-interpolated samples
(wgan_gp.py:119-138), generator every n_critic=5 on the same z
(wgan_gp.py:179-193). batches_done advances by n_critic (wgan_gp.py:203).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpugan.models._critic_family import (
    build_a,
    create_state_a,
    make_d_step,
    make_g_step,
    make_loader_a,
    run_critic_family,
)
from tpugan.ops.penalty import wgan_gp_penalty
from tpugan.train.optim import adam_torch
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "wgan_gp"
LAMBDA_GP = 10.0  # wgan_gp.py:87


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with wgan_gp.py:25-37.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(28, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    n_critic: int = flag(5, "number of training steps for discriminator per iter")
    clip_value: float = flag(0.01, "lower and upper clip value for disc. weights")
    sample_interval: int = flag(400, "interval betwen image samples")


build = build_a


def _txs(cfg):
    return (
        adam_torch(cfg.lr, cfg.b1, cfg.b2),
        adam_torch(cfg.lr, cfg.b1, cfg.b2),
    )


def create_state(cfg: Config, modules=None):
    tx_g, tx_d = _txs(cfg)
    return create_state_a(cfg, modules or build(cfg), tx_g, tx_d)


def d_loss_fn(d_apply, real, fake, rng, d_params=None):
    """Critic loss (wgan_gp.py:165-171). ``d_params`` (threaded through by
    make_d_step) enables the opt-in fused closed-form penalty —
    TPUGAN_PALLAS_GP=1|xla, template-A critic only (ops/pallas_critic.py);
    numerically equal to the generic grad-of-grad path
    (tests/test_pallas_critic.py)."""
    gp = None
    if d_params is not None:
        fused = _fused_gp_or_none(d_params, real, fake, rng)
        if fused is not None:
            gp = fused
    if gp is None:
        gp = wgan_gp_penalty(d_apply, real, fake, rng)
    return -jnp.mean(d_apply(real)) + jnp.mean(d_apply(fake)) + LAMBDA_GP * gp


def _fused_gp_or_none(d_params, real, fake, rng):
    import os

    mode = os.environ.get("TPUGAN_PALLAS_GP", "0")
    if mode not in ("1", "xla"):
        return None
    from tpugan.nn.layers import flatten_nchw
    from tpugan.ops.pallas_critic import (
        extract_mlp_critic, mlp_gp_pallas, mlp_gp_xla, pallas_gp_supported,
    )

    leaves = extract_mlp_critic(d_params)
    if leaves is None or real.dtype != jnp.float32:
        return None
    w1, b1, w2, b2, w3 = leaves
    alpha = jax.random.uniform(
        rng, (real.shape[0],) + (1,) * (real.ndim - 1), real.dtype
    )  # same stream/shape as ops/penalty.py:wgan_gp_penalty
    x = flatten_nchw(alpha * real + (1.0 - alpha) * fake)
    if mode == "xla":
        return mlp_gp_xla(x, w1, b1, w2, b2, w3)
    if jax.default_backend() != "tpu" or not pallas_gp_supported(
            x.shape[0], x.shape[1], w2.shape[0], w2.shape[1]):
        return None
    return mlp_gp_pallas(x, w1, b1, w2, b2, w3)


def make_steps(cfg: Config, modules=None):
    modules = modules or build(cfg)
    tx_g, tx_d = _txs(cfg)
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
