"""Context Encoder (Pathak et al. 2016) — inpainting.

Reference: /root/reference/implementations/context_encoder/
context_encoder.py + models.py + datasets.py — conv encoder (5 stride-2
downs with BN eps 0.8) -> 1x1 Conv to a 4000-channel bottleneck -> deconv
decoder emitting ONLY the 64px mask patch (models.py:6-40); 4-block D on
the patch with InstanceNorm and strides 2/2/2/1 (models.py:43-66, patch =
mask_size/8). Loss: 0.001*MSE adv + 0.999*L1 on the masked part
(context_encoder.py:149-152), on 128px CelebA.

Masking parity (datasets.py:20-37): train batches get a per-sample random
mask_size^2 patch replaced with 1.0 (in normalized space); the val sheet
uses the center mask and shows masked / filled / original rows
(context_encoder.py:109-120). Masking runs on-device in the jitted step.
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import celeba_images_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import l1, mse
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    InstanceNorm,
    leaky_relu,
)
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "context_encoder"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with context_encoder.py:33-45.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(8, "size of the batches")
    dataset_name: str = flag("img_align_celeba", "name of the dataset")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(4, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(128, "size of each image dimension")
    mask_size: int = flag(64, "size of random mask")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(500, "interval between image sampling")


class CEGenerator(nn.Module):
    """models.py:6-40."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        def down(y, f, normalize=True):
            y = Conv(f, 4, 2, 1, init_mode="normal02")(y)
            if normalize:
                y = BatchNorm(eps=0.8, init_mode="normal02")(y, train=train)
            return leaky_relu(y, 0.2)

        def up(y, f, normalize=True):
            y = ConvTranspose(f, 4, 2, 1, init_mode="normal02")(y)
            if normalize:
                y = BatchNorm(eps=0.8, init_mode="normal02")(y, train=train)
            return nn.relu(y)

        y = down(x, 64, normalize=False)
        y = down(y, 64)
        y = down(y, 128)
        y = down(y, 256)
        y = down(y, 512)
        y = Conv(4000, 1, 1, 0, init_mode="normal02")(y)
        y = up(y, 512)
        y = up(y, 256)
        y = up(y, 128)
        y = up(y, 64)
        y = Conv(self.channels, 3, 1, 1, init_mode="normal02")(y)
        return jnp.tanh(y)


class CEDiscriminator(nn.Module):
    """models.py:43-66 (also ccgan/models.py:83-111): 3x3 convs with strides
    (2,2,2,1), InstanceNorm except first, 3x3 head."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = img
        for f, stride, normalize in (
            (64, 2, False), (128, 2, True), (256, 2, True), (512, 1, True)
        ):
            x = Conv(f, 3, stride, 1, init_mode="normal02")(x)
            if normalize:
                x = InstanceNorm()(x)
            x = leaky_relu(x, 0.2)
        return Conv(1, 3, 1, 1, init_mode="normal02")(x)


def build(cfg: Config):
    return {
        "generator": CEGenerator(channels=cfg.channels),
        "discriminator": CEDiscriminator(),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    patch = jnp.zeros(
        (1, cfg.mask_size, cfg.mask_size, cfg.channels), jnp.float32
    )
    g_params, g_bs = init_module(modules["generator"], k_g, img, train=True)
    d_params, _ = init_module(modules["discriminator"], k_d, patch)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"generator": g_bs}
    )


def random_mask(imgs, rng, img_size, mask_size):
    """Per-sample random square mask (datasets.py:20-28): returns
    (masked_imgs, masked_parts) with the patch filled with 1.0."""
    bsz = imgs.shape[0]
    coords = jax.random.randint(rng, (bsz, 2), 0, img_size - mask_size)

    def one(img, yx):
        y1, x1 = yx[0], yx[1]
        part = jax.lax.dynamic_slice(
            img, (y1, x1, 0), (mask_size, mask_size, img.shape[-1])
        )
        ones = jnp.ones((mask_size, mask_size, img.shape[-1]), img.dtype)
        masked = jax.lax.dynamic_update_slice(img, ones, (y1, x1, 0))
        return masked, part

    return jax.vmap(one)(imgs, coords)


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8):
        imgs = normalize_uint8(imgs_u8)
        rng, k_mask = jax.random.split(state.rng)
        masked_imgs, masked_parts = random_mask(
            imgs, k_mask, cfg.img_size, cfg.mask_size
        )

        # --- G phase (context_encoder.py:143-155) ---
        def g_loss_fn(g_params):
            gen_parts, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], masked_imgs,
                train=True,
            )
            d_out, _ = apply_mod(
                D, state.params["discriminator"], None, gen_parts
            )
            g_adv = mse(d_out, 1.0)
            g_pixel = l1(gen_parts, masked_parts)
            return 0.001 * g_adv + 0.999 * g_pixel, (gen_parts, g_adv, g_pixel, g_bs)

        (g_loss, (gen_parts, g_adv, g_pixel, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (context_encoder.py:161-169) ---
        gen_d = jax.lax.stop_gradient(gen_parts)

        def d_loss_fn(d_params):
            real_out, _ = apply_mod(D, d_params, None, masked_parts)
            fake_out, _ = apply_mod(D, d_params, None, gen_d)
            return 0.5 * (mse(real_out, 1.0) + mse(fake_out, 0.0))

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
        out = {"d_loss": d_loss, "g_adv": g_adv, "g_pixel": g_pixel}
        return new_state, out

    return step


def make_loader(cfg: Config, mode="train", batch_size=None, sharding=None):
    imgs, is_real = celeba_images_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.img_size, cfg.img_size,
        mode=mode, synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not is_real and mode == "train":
        print("[tpugan] CelebA not found on disk — using synthetic faces")
    return DeviceLoader(
        [imgs],
        batch_size or cfg.batch_size,
        shuffle=True,
        seed=cfg.seed if mode == "train" else cfg.seed + 991,
        sharding=sharding,
    )


def make_sampler(cfg: Config, modules):
    """context_encoder.py:109-120: 12 val images, center mask; rows
    masked / filled / original stacked vertically, nrow=6."""
    G = modules["generator"]
    val_loader = make_loader(cfg, mode="val", batch_size=12)
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    i0 = (cfg.img_size - cfg.mask_size) // 2

    @jax.jit
    def fill(g_params, g_bs, imgs_u8):
        imgs = normalize_uint8(imgs_u8)
        masked = imgs.at[:, i0 : i0 + cfg.mask_size, i0 : i0 + cfg.mask_size, :].set(1.0)
        gen_mask, _ = apply_mod(G, g_params, g_bs, masked, train=True)
        filled = masked.at[
            :, i0 : i0 + cfg.mask_size, i0 : i0 + cfg.mask_size, :
        ].set(gen_mask)
        return jnp.concatenate([masked, filled, imgs], axis=1)

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        sheet = fill(
            state.params["generator"], state.model_state["generator"], batch[0]
        )
        save_image(
            jax.device_get(sheet),
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=6, normalize=True,
        )

    return sample


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    from tpugan.parallel import auto_sharding, replicate_for

    sharding = auto_sharding(cfg.batch_size)
    state = replicate_for(sharding, state)
    loader = make_loader(cfg, sharding=sharding)
    step = make_step(cfg, modules)
    sampler = make_sampler(cfg, modules)

    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G adv: %f, pixel: %f]"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), float(out["g_adv"]),
                float(out["g_pixel"]),
            )
        )

    return run_training(
        cfg, loader, state, step,
        Callbacks(log=log, sample=sampler),
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
