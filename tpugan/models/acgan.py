"""ACGAN (Odena et al. 2017) — Auxiliary-Classifier GAN.

Reference: /root/reference/implementations/acgan/acgan.py — template-B conv
G with label Embedding(n_classes, latent_dim) MULTIPLIED into z
(acgan.py:50,70), twin-head D: adv (Sigmoid) + aux (Softmax)
(acgan.py:99-100). BCE + CrossEntropy on both real and fake
(acgan.py:112-113,186-207); D accuracy telemetry (acgan.py:208-220).
Parity quirk kept: the Softmax aux output is fed to CrossEntropyLoss
(double log-softmax) — see losses.cross_entropy_on_softmax.
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.io.images import save_image
from tpugan.losses import bce, cross_entropy_on_softmax
from tpugan.models import cgan as _cgan
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.blocks import DCGANGenerator, DCGANTrunk
from tpugan.nn.layers import Embedding, Linear
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import config_from_args

NAME = "acgan"


@dataclasses.dataclass
class Config(_cgan.Config):
    # Flag parity with acgan.py:23-33 (same set as cgan).
    pass


class ACGANGenerator(nn.Module):
    img_size: int
    channels: int
    n_classes: int
    latent_dim: int

    @nn.compact
    def __call__(self, z, labels, train: bool = True):
        emb = Embedding(self.n_classes, self.latent_dim)(labels)
        gen_input = emb * z  # acgan.py:70 torch.mul
        return DCGANGenerator(
            img_size=self.img_size, channels=self.channels, init_mode="normal02"
        )(gen_input, train=train)


class ACGANDiscriminator(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        feat = DCGANTrunk(init_mode="normal02")(img, train=train)
        validity = jax.nn.sigmoid(Linear(1)(feat))
        label = jax.nn.softmax(Linear(self.n_classes)(feat), axis=-1)
        return validity, label


def build(cfg: Config):
    return {
        "generator": ACGANGenerator(
            img_size=cfg.img_size, channels=cfg.channels,
            n_classes=cfg.n_classes, latent_dim=cfg.latent_dim,
        ),
        "discriminator": ACGANDiscriminator(n_classes=cfg.n_classes),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    lbl = jnp.zeros((2,), jnp.int32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, lbl, train=True)
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
        rng, k_z, k_lbl, k_do1, k_do2, k_do3 = jax.random.split(state.rng, 6)
        bsz = real.shape[0]
        z = jax.random.normal(k_z, (bsz, cfg.latent_dim))
        gen_labels = jax.random.randint(k_lbl, (bsz,), 0, cfg.n_classes)

        # --- G phase (acgan.py:175-190) ---
        def g_loss_fn(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, gen_labels,
                train=True,
            )
            (validity, pred_label), d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen, train=True,
                dropout_rng=k_do1,
            )
            loss = 0.5 * (
                bce(validity, 1.0)
                + cross_entropy_on_softmax(pred_label, gen_labels)
            )
            return loss, (gen, g_bs, d_bs)

        (g_loss, (gen_imgs, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (acgan.py:192-220) ---
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
                + cross_entropy_on_softmax(fake_aux, gen_labels)
            )
            # accuracy telemetry (acgan.py:217-220)
            pred = jnp.concatenate([real_aux, fake_aux], axis=0)
            gt = jnp.concatenate([labels, gen_labels], axis=0)
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


make_loader = _cgan.make_loader


def make_sampler(cfg: Config, modules):
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
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f, acc: %d%%] [G loss: %f]"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), int(100 * float(out["d_acc"])),
                float(out["g_loss"]),
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
