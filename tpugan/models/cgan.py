"""Conditional GAN (Mirza & Osindero 2014).

Reference: /root/reference/implementations/cgan/cgan.py — MLP G/D where a
label Embedding(n_classes, n_classes) is CONCATENATED to z (G,
cgan.py:43-65) / to the flattened image (D, cgan.py:69-91; Dropout(0.4),
no sigmoid head), LSGAN-style MSE adversarial loss (cgan.py:95), 1:1 Adam.
Sampling: 10x10 grid with one digit class per row (cgan.py:129-137).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader, mnist_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import mse
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.layers import BatchNorm, Dropout, Embedding, Linear, leaky_relu
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "cgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with cgan.py:20-30.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    n_classes: int = flag(10, "number of classes for dataset")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval between image sampling")


class CGANGenerator(nn.Module):
    img_shape: Tuple[int, int, int]
    n_classes: int

    @nn.compact
    def __call__(self, z, labels, train: bool = True):
        emb = Embedding(self.n_classes, self.n_classes)(labels)
        x = jnp.concatenate([emb, z], axis=-1)  # cgan.py:63 order
        widths = (128, 256, 512, 1024)
        for i, w in enumerate(widths):
            x = Linear(w)(x)
            if i > 0:
                x = BatchNorm(eps=0.8)(x, train=train)
            x = leaky_relu(x, 0.2)
        h, w_, c = self.img_shape
        x = jnp.tanh(Linear(h * w_ * c)(x))
        from tpugan.nn.layers import unflatten_nchw

        return unflatten_nchw(x, c, h, w_)  # torch view order (cgan.py:56)


class CGANDiscriminator(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, img, labels, train: bool = True):
        from tpugan.nn.layers import flatten_nchw

        emb = Embedding(self.n_classes, self.n_classes)(labels)
        # torch img.view(B, -1) element order (cgan.py:89).
        x = jnp.concatenate([flatten_nchw(img), emb], axis=-1)
        x = leaky_relu(Linear(512)(x), 0.2)
        x = Linear(512)(x)
        x = Dropout(0.4)(x, train=train)
        x = leaky_relu(x, 0.2)
        x = Linear(512)(x)
        x = Dropout(0.4)(x, train=train)
        x = leaky_relu(x, 0.2)
        return Linear(1)(x)  # no sigmoid (cgan.py:84 + MSE loss)


def build(cfg: Config):
    img_shape = (cfg.img_size, cfg.img_size, cfg.channels)
    return {
        "generator": CGANGenerator(img_shape=img_shape, n_classes=cfg.n_classes),
        "discriminator": CGANDiscriminator(n_classes=cfg.n_classes),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    lbl = jnp.zeros((2,), jnp.int32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, lbl, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, img, lbl, train=True)
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
        rng, k_z, k_lbl, k_do1, k_do2, k_do3 = jax.random.split(state.rng, 6)
        bsz = real.shape[0]
        z = jax.random.normal(k_z, (bsz, cfg.latent_dim))
        gen_labels = jax.random.randint(k_lbl, (bsz,), 0, cfg.n_classes)

        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, gen_labels,
                train=True,
            )
            d_out, _ = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, gen_labels,
                train=True, dropout_rng=k_do1,
            )
            return mse(d_out, 1.0), (gen, g_bs)

        (g_loss, (gen_imgs, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            d_real, _ = apply_mod(
                D, d_params, state.model_state["discriminator"], real, labels,
                train=True, dropout_rng=k_do2,
            )
            d_fake, _ = apply_mod(
                D, d_params, state.model_state["discriminator"], gen_detached,
                gen_labels, train=True, dropout_rng=k_do3,
            )
            return 0.5 * (mse(d_real, 1.0) + mse(d_fake, 0.0))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"]
        )
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            model_state={**state.model_state, "generator": g_bs},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "g_loss": g_loss, "gen_imgs": gen_imgs}

    return step


def make_sampler(cfg: Config, modules):
    """cgan.py:129-137 — n_row^2 samples, one class per row, nrow=n_row."""
    G = modules["generator"]
    n_row = cfg.n_classes
    labels = jnp.asarray(
        [num for _ in range(n_row) for num in range(n_row)], jnp.int32
    )

    @jax.jit
    def gen(params, g_bs, rng):
        z = jax.random.normal(rng, (n_row * n_row, cfg.latent_dim))
        imgs, _ = apply_mod(G, params, g_bs, z, labels, train=True)
        return imgs

    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)

    def sample(state, out, batches_done):
        rng = jax.random.fold_in(state.rng, batches_done)
        imgs = gen(state.params["generator"], state.model_state["generator"], rng)
        save_image(
            jax.device_get(imgs),
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=n_row,
            normalize=True,
        )

    return sample


def make_loader(cfg: Config, sharding=None) -> DeviceLoader:
    ds, is_real = mnist_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size, channels=cfg.channels,
        synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not is_real:
        print("[tpugan] MNIST not found on disk — using synthetic dataset")
    return DeviceLoader(
        [ds.images, ds.labels], cfg.batch_size, shuffle=True, seed=cfg.seed,
        sharding=sharding,
    )


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    loader = make_loader(cfg)
    step = make_step(cfg, modules)

    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
            % (epoch, cfg.n_epochs, i, bpe, float(out["d_loss"]), float(out["g_loss"]))
        )

    return run_training(
        cfg, loader, state, step,
        Callbacks(log=log, sample=make_sampler(cfg, modules)),
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
