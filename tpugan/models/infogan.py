"""InfoGAN (Chen et al. 2016).

Reference: /root/reference/implementations/infogan/infogan.py — template-B
conv G on concat(z62, onehot10, code2) (infogan.py:61,80-85); D with three
heads: adv (raw linear), class Softmax, continuous code (infogan.py:110-121).
Three phases per batch (infogan.py:203-282): G (MSE adv), D (MSE adv), then
an information phase minimizing lambda_cat*CE + lambda_con*MSE through a
THIRD Adam over G ∪ D params with its own moments (infogan.py:164-168 —
the duplicated-moment quirk is kept: opt_state["info"] is independent of
the G/D optimizers). Sampling writes three grids per interval: static /
varying_c1 / varying_c2 (infogan.py:179-196).
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.io.images import save_image
from tpugan.losses import cross_entropy_on_softmax, mse
from tpugan.models import dcgan as _dcgan
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.blocks import DCGANGenerator, DCGANTrunk
from tpugan.nn.layers import Linear
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "infogan"
LAMBDA_CAT, LAMBDA_CON = 1.0, 0.1  # infogan.py:129-131


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with infogan.py:24-35.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(62, "dimensionality of the latent space")
    code_dim: int = flag(2, "latent code")
    n_classes: int = flag(10, "number of classes for dataset")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval between image sampling")


def to_categorical(y, num_columns):
    """One-hot float encoding (infogan.py:50-55)."""
    return jax.nn.one_hot(jnp.asarray(y), num_columns, dtype=jnp.float32)


class InfoGANGenerator(nn.Module):
    img_size: int
    channels: int

    @nn.compact
    def __call__(self, z, labels_onehot, code, train: bool = True):
        gen_input = jnp.concatenate([z, labels_onehot, code], axis=-1)
        return DCGANGenerator(
            img_size=self.img_size, channels=self.channels, init_mode="normal02"
        )(gen_input, train=train)


class InfoGANDiscriminator(nn.Module):
    n_classes: int
    code_dim: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        feat = DCGANTrunk(init_mode="normal02")(img, train=train)
        validity = Linear(1)(feat)  # raw — MSE adversarial (infogan.py:119)
        label = jax.nn.softmax(Linear(self.n_classes)(feat), axis=-1)
        latent_code = Linear(self.code_dim)(feat)
        return validity, label, latent_code


def build(cfg: Config):
    return {
        "generator": InfoGANGenerator(img_size=cfg.img_size, channels=cfg.channels),
        "discriminator": InfoGANDiscriminator(
            n_classes=cfg.n_classes, code_dim=cfg.code_dim
        ),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    oh = jnp.zeros((2, cfg.n_classes), jnp.float32)
    code = jnp.zeros((2, cfg.code_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, oh, code, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, img, train=True)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {
        "generator": tx.init(g_params),
        "discriminator": tx.init(d_params),
        "info": tx.init(params),  # third optimizer over G ∪ D
    }
    return TrainState.create(
        params, opt_state, k_state,
        model_state={"generator": g_bs, "discriminator": d_bs},
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8, labels):
        real = normalize_uint8(imgs_u8)
        del labels  # infogan's adversarial phases ignore true labels
        rng, k_z1, k_lbl1, k_code1, k_z2, k_lbl2, k_code2, k_do1, k_do2, k_do3, k_do4 = (
            jax.random.split(state.rng, 11)
        )
        bsz = real.shape[0]

        z = jax.random.normal(k_z1, (bsz, cfg.latent_dim))
        label_input = to_categorical(
            jax.random.randint(k_lbl1, (bsz,), 0, cfg.n_classes), cfg.n_classes
        )
        code_input = jax.random.uniform(
            k_code1, (bsz, cfg.code_dim), minval=-1.0, maxval=1.0
        )

        # --- G phase (infogan.py:219-236) ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, label_input,
                code_input, train=True,
            )
            (validity, _, _), d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, train=True,
                dropout_rng=k_do1,
            )
            return mse(validity, 1.0), (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (infogan.py:238-256) ---
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            (real_pred, _, _), bs1 = apply_mod(
                D, d_params, d_bs, real, train=True, dropout_rng=k_do2
            )
            (fake_pred, _, _), bs2 = apply_mod(
                D, d_params, bs1, gen_detached, train=True, dropout_rng=k_do3
            )
            return 0.5 * (mse(real_pred, 1.0) + mse(fake_pred, 0.0)), bs2

        (d_loss, d_bs2), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params["discriminator"]
        )
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        # --- Information phase (infogan.py:258-282): fresh z/labels/code,
        # joint grads through updated G and D. ---
        sampled = jax.random.randint(k_lbl2, (bsz,), 0, cfg.n_classes)
        z2 = jax.random.normal(k_z2, (bsz, cfg.latent_dim))
        label2 = to_categorical(sampled, cfg.n_classes)
        code2 = jax.random.uniform(
            k_code2, (bsz, cfg.code_dim), minval=-1.0, maxval=1.0
        )

        def info_loss_fn(both):
            gen, g_bs2 = apply_mod(
                G, both["generator"], g_bs, z2, label2, code2, train=True
            )
            (_, pred_label, pred_code), d_bs3 = apply_mod(
                D, both["discriminator"], d_bs2, gen, train=True,
                dropout_rng=k_do4,
            )
            loss = LAMBDA_CAT * cross_entropy_on_softmax(
                pred_label, sampled
            ) + LAMBDA_CON * mse(pred_code, code2)
            return loss, (g_bs2, d_bs3)

        both = {"generator": g_params, "discriminator": d_params}
        (info_loss, (g_bs_f, d_bs_f)), info_grads = jax.value_and_grad(
            info_loss_fn, has_aux=True
        )(both)
        info_up, info_opt = tx.update(info_grads, state.opt_state["info"], both)
        both = optax.apply_updates(both, info_up)

        new_state = state.replace(
            step=state.step + 1,
            params=both,
            model_state={"generator": g_bs_f, "discriminator": d_bs_f},
            opt_state={
                "generator": g_opt, "discriminator": d_opt, "info": info_opt,
            },
            rng=rng,
        )
        out = {
            "d_loss": d_loss, "g_loss": g_loss, "info_loss": info_loss,
            "gen_imgs": gen_imgs,
        }
        return new_state, out

    return step


make_loader = _dcgan.make_loader


def make_sampler(cfg: Config, modules):
    """infogan.py:173-196 — static grid + c1/c2 sweeps into three dirs."""
    G = modules["generator"]
    n_row = cfg.n_classes
    n = n_row * n_row
    static_label = to_categorical(
        np.array([num for _ in range(n_row) for num in range(n_row)]),
        cfg.n_classes,
    )
    static_z = jnp.zeros((n, cfg.latent_dim))
    static_code = jnp.zeros((n, cfg.code_dim))
    c_varied = np.repeat(np.linspace(-1, 1, n_row)[:, None], n_row, 0)
    zeros = np.zeros((n, 1))
    c1 = jnp.asarray(np.concatenate([c_varied, zeros], -1), jnp.float32)
    c2 = jnp.asarray(np.concatenate([zeros, c_varied], -1), jnp.float32)

    dirs = {}
    for d in ("static", "varying_c1", "varying_c2"):
        dirs[d] = os.path.join(cfg.output_dir, "images", d)
        os.makedirs(dirs[d], exist_ok=True)

    @jax.jit
    def gen(params, g_bs, rng):
        z = jax.random.normal(rng, (n, cfg.latent_dim))
        static_sample, _ = apply_mod(
            G, params, g_bs, z, static_label, static_code, train=True
        )
        s1, _ = apply_mod(G, params, g_bs, static_z, static_label, c1, train=True)
        s2, _ = apply_mod(G, params, g_bs, static_z, static_label, c2, train=True)
        return static_sample, s1, s2

    def sample(state, out, batches_done):
        rng = jax.random.fold_in(state.rng, batches_done)
        st, s1, s2 = gen(
            state.params["generator"], state.model_state["generator"], rng
        )
        for arr, d in ((st, "static"), (s1, "varying_c1"), (s2, "varying_c2")):
            save_image(
                jax.device_get(arr),
                os.path.join(dirs[d], "%d.png" % batches_done),
                nrow=n_row, normalize=True,
            )

    return sample


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    loader = make_loader(cfg)
    step = make_step(cfg, modules)

    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f] [info loss: %f]"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), float(out["g_loss"]),
                float(out["info_loss"]),
            )
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
