"""Boundary Equilibrium GAN (Berthelot et al. 2017).

Reference: /root/reference/implementations/began/began.py — template-B conv G
(WITH the leading plain BatchNorm2d, latent 62, began.py:47-72) and an
autoencoder D (began.py:75-99): Conv(ch->64, 3, s2, p1)+ReLU,
fc [Linear(down_dim->32), BN1d(32, eps=0.8), ReLU, Linear(32->down_dim),
BN1d(down_dim), ReLU], Upsample + Conv(64->ch). weights_init_normal hits
Conv2d only (the "BatchNorm2d" name filter misses BN1d, began.py:38-44).

L1 recon energies (began.py:159-196): G minimizes mean|D(G(z)) - G(z)| with
gradient through BOTH terms (began.py:163 — the target is NOT detached);
D minimizes L_real - k * L_fake on detached fakes. The equilibrium term k is
loop-carried state updated each batch: k <- clip(k + 0.001*(0.75*L_real -
L_fake), 0, 1) (began.py:139-193), carried here in ``state.aux["k"]``.
Convergence metric M = L_real + |diff| is logged per batch; the reference's
``.data[0]`` access (began.py:196, pre-torch-0.4 API — crashes on modern
torch) is simply a scalar read here.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.models import dcgan as _dcgan
from tpugan.models._common import apply_mod, init_module, run_mnist_recipe
from tpugan.nn.blocks import DCGANGenerator
from tpugan.nn.layers import BatchNorm, Conv, Linear, Upsample
from tpugan.train.loop import Callbacks
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "began"
GAMMA = 0.75  # began.py:140
LAMBDA_K = 0.001  # began.py:141


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with began.py:19-30.
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


class BEGANDiscriminator(nn.Module):
    """Autoencoder D (began.py:75-99): returns reconstruction only."""

    img_size: int
    channels: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        down_size = self.img_size // 2
        from tpugan.nn.layers import flatten_nchw, unflatten_nchw

        x = Conv(64, 3, 2, 1, init_mode="normal02")(img)
        x = nn.relu(x)
        flat = flatten_nchw(x)  # torch out.view(B, -1) (began.py:97)
        y = Linear(32)(flat)
        y = BatchNorm(eps=0.8, init_mode="torch")(y, train=train)
        y = nn.relu(y)
        y = Linear(flat.shape[-1])(y)
        y = BatchNorm(init_mode="torch")(y, train=train)
        y = nn.relu(y)
        # torch out.view(B, 64, d, d) order (began.py:98).
        y = unflatten_nchw(y, 64, down_size, down_size)
        y = Upsample(2)(y)
        return Conv(self.channels, 3, 1, 1, init_mode="normal02")(y)


def build(cfg: Config):
    return {
        "generator": DCGANGenerator(
            img_size=cfg.img_size, channels=cfg.channels, first_bn=True,
            init_mode="normal02",
        ),
        "discriminator": BEGANDiscriminator(
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
        aux={"k": jnp.zeros((), jnp.float32)},  # began.py:142
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
        k = state.aux["k"]

        # --- G phase (began.py:154-166): target NOT detached ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            recon, d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, train=True,
            )
            return jnp.mean(jnp.abs(recon - gen)), (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (began.py:172-183) ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            d_real, bs1 = apply_mod(D, d_params, d_bs, real, train=True)
            d_fake, bs2 = apply_mod(D, d_params, bs1, gen_detached, train=True)
            loss_real = jnp.mean(jnp.abs(d_real - real))
            loss_fake = jnp.mean(jnp.abs(d_fake - gen_detached))
            return loss_real - k * loss_fake, (loss_real, loss_fake, bs2)

        (d_loss, (loss_real, loss_fake, d_bs_final)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params["discriminator"])
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        # --- equilibrium update (began.py:189-196) ---
        diff = GAMMA * loss_real - loss_fake
        k_new = jnp.clip(k + LAMBDA_K * diff, 0.0, 1.0)
        m = loss_real + jnp.abs(diff)

        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            model_state={"generator": g_bs, "discriminator": d_bs_final},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
            aux={"k": k_new},
        )
        out = {
            "d_loss": d_loss, "g_loss": g_loss, "M": m, "k": k_new,
            "gen_imgs": gen_imgs,
        }
        return new_state, out

    return step


make_loader = _dcgan.make_loader


def run(cfg: Config):
    def log(epoch, i, bpe, out):
        # began.py:202-205 log format, including M and k.
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f] -- M: %f, k: %f"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), float(out["g_loss"]),
                float(out["M"]), float(out["k"]),
            )
        )

    from tpugan.models._common import grid_sampler

    return run_mnist_recipe(
        cfg, _this(), callbacks=Callbacks(log=log, sample=grid_sampler(cfg))
    )


def _this():
    import tpugan.models.began as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
