"""Energy-Based GAN (Zhao et al. 2016).

Reference: /root/reference/implementations/ebgan/ebgan.py — conv G
(template-B without the first BatchNorm, latent 62, ebgan.py:47-71) and an
autoencoder D returning (reconstruction, embedding) (ebgan.py:74-101):
Conv(ch->64, 3, s2, p1)+ReLU down, Linear(down_dim->32) embedding,
fc [BN1d(32, eps=0.8), ReLU, Linear(32->down_dim), BN1d(down_dim), ReLU],
then Upsample + Conv(64->ch) up. weights_init_normal hits Conv2d layers
only — the name filter "BatchNorm2d" misses the 1d norms (ebgan.py:38-44),
so those keep torch default init.

Losses (ebgan.py:159-202): G minimizes MSE(D_recon(G(z)), G(z).detach()) +
0.1 * pullaway(embeddings); D minimizes MSE on real recon plus hinge
max(0, margin - fake_recon_mse) with margin = max(1, batch_size/64)
(ebgan.py:156-157,194-199). The reference's host-side hinge branch
(``if (margin - d_loss_fake).item() > 0``) becomes a jnp.where with
identical value and gradient.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.losses import mse, pullaway
from tpugan.models import dcgan as _dcgan
from tpugan.models._common import apply_mod, init_module, run_mnist_recipe
from tpugan.nn.blocks import DCGANGenerator
from tpugan.nn.layers import BatchNorm, Conv, Linear, Upsample
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "ebgan"
LAMBDA_PT = 0.1  # ebgan.py:156


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with ebgan.py:19-30.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(62, "dimensionality of the latent space")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "number of image channels")


class EBGANDiscriminator(nn.Module):
    """Autoencoder D (ebgan.py:74-101): returns (recon, embedding)."""

    img_size: int
    channels: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        down_size = self.img_size // 2
        from tpugan.nn.layers import flatten_nchw, unflatten_nchw

        x = Conv(64, 3, 2, 1, init_mode="normal02")(img)
        x = nn.relu(x)
        flat = flatten_nchw(x)  # torch out.view(B, -1) (ebgan.py:98)
        embedding = Linear(32)(flat)
        # fc stack (ebgan.py:86-92); BN1d layers keep torch init (see module
        # docstring) — eps 0.8 on the first, default on the second.
        y = BatchNorm(eps=0.8, init_mode="torch")(embedding, train=train)
        y = nn.relu(y)
        y = Linear(flat.shape[-1])(y)
        y = BatchNorm(init_mode="torch")(y, train=train)
        y = nn.relu(y)
        # torch out.view(B, 64, d, d) order (ebgan.py:100).
        y = unflatten_nchw(y, 64, down_size, down_size)
        y = Upsample(2)(y)
        recon = Conv(self.channels, 3, 1, 1, init_mode="normal02")(y)
        return recon, embedding


def build(cfg: Config):
    return {
        "generator": DCGANGenerator(
            img_size=cfg.img_size, channels=cfg.channels, first_bn=False,
            init_mode="normal02",
        ),
        "discriminator": EBGANDiscriminator(
            img_size=cfg.img_size, channels=cfg.channels
        ),
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
    margin = max(1.0, cfg.batch_size / 64.0)  # ebgan.py:157

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z = jax.random.split(state.rng)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))

        # --- G phase (ebgan.py:165-182) ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            (recon, emb), d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, train=True,
            )
            loss = mse(recon, jax.lax.stop_gradient(gen)) + LAMBDA_PT * pullaway(emb)
            return loss, (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (ebgan.py:188-202) ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            (real_recon, _), bs1 = apply_mod(D, d_params, d_bs, real, train=True)
            (fake_recon, _), bs2 = apply_mod(
                D, d_params, bs1, gen_detached, train=True
            )
            d_loss_real = mse(real_recon, real)
            d_loss_fake = mse(fake_recon, gen_detached)
            hinge = jnp.where(
                margin - jax.lax.stop_gradient(d_loss_fake) > 0,
                margin - d_loss_fake,
                0.0,
            )
            return d_loss_real + hinge, bs2

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
    import tpugan.models.ebgan as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
