"""Coupled GAN (Liu & Tuzel 2016).

Reference: /root/reference/implementations/cogan/cogan.py — coupled
generators sharing an fc + conv trunk with per-domain heads G1/G2
(cogan.py:51-87) and coupled discriminators sharing a conv trunk with
per-domain linear heads D1/D2 (cogan.py:90-122), trained with MSE
adversarial loss averaged over both domains (cogan.py:126,210,225-230)
on zipped MNIST (grayscale expanded to 3ch, cogan.py:193) + MNIST-M
(cogan.py:142-171). Note this script's ``weights_init_normal`` variant
matches **Linear** and BatchNorm names (cogan.py:42-48) — Conv2d layers
keep the torch default init, unlike the other template-B scripts.

D block order here is Conv -> [BN] -> LReLU -> Dropout (cogan.py:94-99),
not the dcgan order, so the trunk is written out rather than reusing
DCGANTrunk. Samples concatenate both domains' full batches, nrow=8
(cogan.py:241-243).
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader, ZipLoader, mnist_or_synthetic, mnistm_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import mse
from tpugan.models._common import apply_mod, init_module, std_log_line
from tpugan.nn.layers import BatchNorm, Conv, Dropout2d, Linear, Upsample, leaky_relu
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "cogan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with cogan.py:23-33.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(32, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(400, "interval betwen image samples")


class _GHead(nn.Module):
    """Per-domain generator head (cogan.py:66-79)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(64, 3, 1, 1, init_mode="torch")(x)
        x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = Conv(self.channels, 3, 1, 1, init_mode="torch")(x)
        return jnp.tanh(x)


class CoupledGenerators(nn.Module):
    """cogan.py:51-87: shared fc + shared_conv trunk, split G1/G2 heads."""

    img_size: int
    channels: int

    @nn.compact
    def __call__(self, z, train: bool = True):
        from tpugan.nn.layers import unflatten_nchw

        s0 = self.img_size // 4
        x = Linear(128 * s0 * s0, init_mode="normal02")(z)
        # torch out.view(B, 128, s0, s0) order (cogan.py:82-83).
        x = unflatten_nchw(x, 128, s0, s0)
        x = BatchNorm(init_mode="normal02")(x, train=train)  # default eps
        x = Upsample(2)(x)
        x = Conv(128, 3, 1, 1, init_mode="torch")(x)
        x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = Upsample(2)(x)
        img1 = _GHead(channels=self.channels)(x, train=train)
        img2 = _GHead(channels=self.channels)(x, train=train)
        return img1, img2


class _DTrunk(nn.Module):
    """Shared D trunk (cogan.py:94-106): Conv -> [BN(0.8)] -> LReLU ->
    Dropout2d(0.25), filters 16/32/64/128, first block without BN."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for i, f in enumerate((16, 32, 64, 128)):
            x = Conv(f, 3, 2, 1, init_mode="torch")(x)
            if i > 0:
                x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
            x = leaky_relu(x, 0.2)
            x = Dropout2d(0.25)(x, train=train)
        from tpugan.nn.layers import flatten_nchw

        return flatten_nchw(x)  # torch out.view(B, -1) (cogan.py:115)


class CoupledDiscriminators(nn.Module):
    """cogan.py:90-122: one trunk applied to both domains sequentially
    (BatchNorm stats see img1 then img2, matching the torch call order),
    split linear heads."""

    @nn.compact
    def __call__(self, img1, img2, train: bool = True):
        trunk = _DTrunk()
        d1 = Linear(1, init_mode="normal02")
        d2 = Linear(1, init_mode="normal02")
        validity1 = d1(trunk(img1, train=train))
        validity2 = d2(trunk(img2, train=train))
        return validity1, validity2


def build(cfg: Config):
    return {
        "generator": CoupledGenerators(
            img_size=cfg.img_size, channels=cfg.channels
        ),
        "discriminator": CoupledDiscriminators(),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, img, img, train=True)
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

    def step(state: TrainState, imgs1_u8, labels1, imgs2_u8, labels2):
        del labels1, labels2
        imgs1 = normalize_uint8(imgs1_u8)
        imgs2 = normalize_uint8(imgs2_u8)
        rng, k_z, k_do1, k_do2, k_do3 = jax.random.split(state.rng, 5)
        z = jax.random.normal(k_z, (imgs1.shape[0], cfg.latent_dim))

        # --- G phase (cogan.py:200-213) ---
        def g_loss_fn(g_params):
            (gen1, gen2), g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            (v1, v2), d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen1, gen2, train=True,
                dropout_rng=k_do1,
            )
            loss = (mse(v1, 1.0) + mse(v2, 1.0)) / 2
            return loss, (gen1, gen2, g_bs, d_bs)

        (g_loss, (gen1, gen2, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (cogan.py:219-233): real pair first, then detached fakes
        gen1_d = jax.lax.stop_gradient(gen1)
        gen2_d = jax.lax.stop_gradient(gen2)

        def d_loss_fn(d_params):
            (v1r, v2r), bs1 = apply_mod(
                D, d_params, d_bs, imgs1, imgs2, train=True, dropout_rng=k_do2
            )
            (v1f, v2f), bs2 = apply_mod(
                D, d_params, bs1, gen1_d, gen2_d, train=True, dropout_rng=k_do3
            )
            loss = (
                mse(v1r, 1.0) + mse(v1f, 0.0) + mse(v2r, 1.0) + mse(v2f, 0.0)
            ) / 4
            return loss, bs2

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
        out = {
            "d_loss": d_loss, "g_loss": g_loss,
            "gen_imgs1": gen1, "gen_imgs2": gen2,
        }
        return new_state, out

    return step


def make_loader(cfg: Config, sharding=None) -> ZipLoader:
    import numpy as np

    ds1, is_real1 = mnist_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size, channels=1,
        synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    # Grayscale -> 3ch expand happens host-side once (cogan.py:193).
    imgs1 = np.repeat(ds1.images, cfg.channels, axis=-1)
    ds2, is_real2 = mnistm_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size,
        synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not (is_real1 and is_real2):
        print("[tpugan] MNIST/MNIST-M not found on disk — using synthetic data")
    return ZipLoader(
        DeviceLoader([imgs1, ds1.labels], cfg.batch_size, shuffle=True,
                     seed=cfg.seed, sharding=sharding),
        DeviceLoader([ds2.images, ds2.labels], cfg.batch_size, shuffle=True,
                     seed=cfg.seed + 1, sharding=sharding),
    )


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    from tpugan.parallel import auto_sharding, replicate_for

    sharding = auto_sharding(cfg.batch_size)
    state = replicate_for(sharding, state)
    loader = make_loader(cfg, sharding=sharding)
    step = make_step(cfg, modules)
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)

    def sample(state, out, batches_done):
        # cogan.py:241-243 — both domains stacked, nrow=8.
        imgs = jnp.concatenate([out["gen_imgs1"], out["gen_imgs2"]], axis=0)
        save_image(
            jax.device_get(imgs),
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=8, normalize=True,
        )

    return run_training(
        cfg, loader, state, step,
        Callbacks(log=std_log_line(cfg), sample=sample),
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
