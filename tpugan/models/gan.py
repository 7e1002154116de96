"""Vanilla GAN (Goodfellow 2014).

Reference: /root/reference/implementations/gan/gan.py — MLP G/D on MNIST
28x28, BCE adversarial loss, 1:1 alternating Adam(2e-4, 0.5, 0.999) updates
(gan.py:112-161), 5x5 sample grid every ``--sample_interval`` batches
(gan.py:169-170).

TPU-native step layout: one jitted function runs [noise gen -> G fwd ->
D fwd -> G update -> D fwd x2 -> D update]; input arrives as uint8 and is
normalized on device; the G phase's fake batch is reused (stop_gradient) by
the D phase exactly as the reference reuses ``gen_imgs.detach()``
(gan.py:157).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader, mnist_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import bce
from tpugan.nn.blocks import MLPDiscriminator, MLPGenerator
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "gan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with gan.py:19-31 (names, types, defaults).
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(28, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval betwen image samples")


def build(cfg: Config):
    img_shape = (cfg.img_size, cfg.img_size, cfg.channels)
    return {
        "generator": MLPGenerator(img_shape=img_shape),
        "discriminator": MLPDiscriminator(sigmoid=True),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_vars = modules["generator"].init(k_g, z, train=True)
    d_vars = modules["discriminator"].init(k_d, img, train=True)
    params = {"generator": g_vars["params"], "discriminator": d_vars["params"]}
    model_state = {"generator": g_vars.get("batch_stats", {})}
    tx = _tx(cfg)
    opt_state = {
        "generator": tx.init(params["generator"]),
        "discriminator": tx.init(params["discriminator"]),
    }
    return TrainState.create(params, opt_state, k_state, model_state=model_state)


def _tx(cfg: Config) -> optax.GradientTransformation:
    return adam_torch(cfg.lr, cfg.b1, cfg.b2)


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = _tx(cfg)

    def step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z = jax.random.split(state.rng)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))

        # --- G phase (gan.py:135-147) ---
        def g_loss_fn(g_params):
            gen, g_mut = G.apply(
                {"params": g_params, "batch_stats": state.model_state["generator"]},
                z,
                train=True,
                mutable=["batch_stats"],
            )
            d_out = D.apply({"params": state.params["discriminator"]}, gen)
            return bce(d_out, 1.0), (gen, g_mut["batch_stats"])

        (g_loss, (gen_imgs, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (gan.py:153-161); fakes detached from the pre-update G.
        gen_detached = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            real_loss = bce(D.apply({"params": d_params}, real), 1.0)
            fake_loss = bce(D.apply({"params": d_params}, gen_detached), 0.0)
            return (real_loss + fake_loss) / 2

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
            model_state={"generator": g_bs},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        out = {"d_loss": d_loss, "g_loss": g_loss, "gen_imgs": gen_imgs}
        return new_state, out

    return step


def make_loader(cfg: Config, sharding=None) -> DeviceLoader:
    ds, is_real = mnist_or_synthetic(
        cfg.data_dir,
        img_size=cfg.img_size,
        channels=cfg.channels,
        synthetic=cfg.synthetic_data,
        seed=cfg.seed,
    )
    if not is_real:
        print("[tpugan] MNIST not found on disk — using synthetic dataset")
    return DeviceLoader(
        [ds.images, ds.labels],
        cfg.batch_size,
        shuffle=True,
        seed=cfg.seed,
        sharding=sharding,
    )


def run(cfg: Config):
    os.makedirs(os.path.join(cfg.output_dir, "images"), exist_ok=True)
    modules = build(cfg)
    state = create_state(cfg, modules)
    loader = make_loader(cfg)
    step = make_step(cfg, modules)

    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
            % (epoch, cfg.n_epochs, i, bpe, float(out["d_loss"]), float(out["g_loss"]))
        )

    def sample(state, out, batches_done):
        imgs = jax.device_get(out["gen_imgs"][:25])
        save_image(
            imgs,
            os.path.join(cfg.output_dir, "images", "%d.png" % batches_done),
            nrow=5,
            normalize=True,
        )

    return run_training(
        cfg,
        loader,
        state,
        step,
        Callbacks(log=log, sample=sample),
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
