"""Adversarial Autoencoder (Makhzani et al. 2015).

Reference: /root/reference/implementations/aae/aae.py — MLP Encoder with
reparameterized z = eps*exp(logvar/2) + mu (aae.py:39-67), MLP Decoder
(aae.py:70-87), and a latent-space D on 10-dim codes (aae.py:90-105).
"G" = encoder+decoder trained by ONE Adam over the chained parameters
(aae.py:140-142) with loss 0.001*BCE(D(E(x)), 1) + 0.999*L1(Dec(E(x)), x)
(aae.py:180-182); D discriminates N(0,1) draws (valid) vs detached encodings
(fake) (aae.py:194-199). Sampling decodes a 10x10 N(0,1) grid (aae.py:148-153).
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.io.images import save_image
from tpugan.losses import bce, l1
from tpugan.models import gan as _gan
from tpugan.models._common import apply_mod, init_module, run_mnist_recipe
from tpugan.nn.blocks import MLPDiscriminator
from tpugan.nn.layers import BatchNorm, Linear, leaky_relu
from tpugan.train.loop import Callbacks
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "aae"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with aae.py:20-30.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(10, "dimensionality of the latent code")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval between image sampling")


class Encoder(nn.Module):
    """aae.py:46-67 — returns (mu, logvar); reparameterization happens in the
    step (it consumes step RNG)."""

    latent_dim: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        from tpugan.nn.layers import flatten_nchw

        x = flatten_nchw(img)  # torch img.view(B, -1) (aae.py:62)
        x = Linear(512)(x)
        x = leaky_relu(x, 0.2)
        x = Linear(512)(x)
        x = BatchNorm()(x, train=train)  # default eps here (no 0.8)
        x = leaky_relu(x, 0.2)
        mu = Linear(self.latent_dim)(x)
        logvar = Linear(self.latent_dim)(x)
        return mu, logvar


class Decoder(nn.Module):
    """aae.py:70-87."""

    img_shape: tuple

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = Linear(512)(z)
        x = leaky_relu(x, 0.2)
        x = Linear(512)(x)
        x = BatchNorm()(x, train=train)
        x = leaky_relu(x, 0.2)
        h, w, c = self.img_shape
        x = Linear(h * w * c)(x)
        x = jnp.tanh(x)
        from tpugan.nn.layers import unflatten_nchw

        return unflatten_nchw(x, c, h, w)  # torch view order (aae.py:86)


def build(cfg: Config):
    img_shape = (cfg.img_size, cfg.img_size, cfg.channels)
    return {
        "encoder": Encoder(latent_dim=cfg.latent_dim),
        "decoder": Decoder(img_shape=img_shape),
        # Latent-space D (aae.py:90-105): widths 512 -> 256 -> 1, sigmoid.
        "discriminator": MLPDiscriminator(sigmoid=True),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_e, k_dec, k_d, k_state = jax.random.split(rng, 4)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    e_params, e_bs = init_module(modules["encoder"], k_e, img, train=True)
    dec_params, dec_bs = init_module(modules["decoder"], k_dec, z, train=True)
    d_params, _ = init_module(modules["discriminator"], k_d, z, train=True)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    # One optimizer over encoder U decoder (itertools.chain, aae.py:140-142).
    g_params = {"encoder": e_params, "decoder": dec_params}
    params = {**g_params, "discriminator": d_params}
    opt_state = {"g": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state,
        model_state={"encoder": e_bs, "decoder": dec_bs},
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    E, Dec, D = modules["encoder"], modules["decoder"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_eps, k_z = jax.random.split(state.rng, 3)
        bsz = real.shape[0]
        eps = jax.random.normal(k_eps, (bsz, cfg.latent_dim))

        # --- G phase (aae.py:174-185): encoder+decoder jointly ---
        def g_loss_fn(g_params):
            (mu, logvar), e_bs = apply_mod(
                E, g_params["encoder"], state.model_state["encoder"], real,
                train=True,
            )
            encoded = eps * jnp.exp(logvar / 2) + mu  # aae.py:39-43
            decoded, dec_bs = apply_mod(
                Dec, g_params["decoder"], state.model_state["decoder"], encoded,
                train=True,
            )
            d_out, _ = apply_mod(D, state.params["discriminator"], None, encoded)
            loss = 0.001 * bce(d_out, 1.0) + 0.999 * l1(decoded, real)
            return loss, (encoded, e_bs, dec_bs)

        g_tree = {"encoder": state.params["encoder"], "decoder": state.params["decoder"]}
        (g_loss, (encoded, e_bs, dec_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_tree)
        g_up, g_opt = tx.update(g_grads, state.opt_state["g"], g_tree)
        g_tree = optax.apply_updates(g_tree, g_up)

        # --- D phase (aae.py:191-202): N(0,1) real vs detached encodings ---
        z = jax.random.normal(k_z, (bsz, cfg.latent_dim))
        enc_detached = jax.lax.stop_gradient(encoded)

        def d_loss_fn(d_params):
            real_out, _ = apply_mod(D, d_params, None, z)
            fake_out, _ = apply_mod(D, d_params, None, enc_detached)
            return 0.5 * (bce(real_out, 1.0) + bce(fake_out, 0.0))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"]
        )
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        new_state = state.replace(
            step=state.step + 1,
            params={**g_tree, "discriminator": d_params},
            model_state={"encoder": e_bs, "decoder": dec_bs},
            opt_state={"g": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return step


make_loader = _gan.make_loader


def make_sampler(cfg: Config, modules):
    """aae.py:148-153 — decode a 10x10 N(0,1) grid."""
    Dec = modules["decoder"]
    n_row = 10
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)

    @jax.jit
    def gen(dec_params, dec_bs, rng):
        z = jax.random.normal(rng, (n_row * n_row, cfg.latent_dim))
        out, _ = apply_mod(Dec, dec_params, dec_bs, z, train=True)
        return out

    def sample(state, out, batches_done):
        rng = jax.random.fold_in(state.rng, batches_done)
        imgs = gen(state.params["decoder"], state.model_state["decoder"], rng)
        save_image(
            jax.device_get(imgs),
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=n_row, normalize=True,
        )

    return sample


def run(cfg: Config):
    from tpugan.models._common import std_log_line

    modules = build(cfg)
    return run_mnist_recipe(
        cfg, _this(),
        callbacks=Callbacks(
            log=std_log_line(cfg), sample=make_sampler(cfg, modules)
        ),
    )


def _this():
    import tpugan.models.aae as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
