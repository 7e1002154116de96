"""Context-Conditional GAN (Denton et al. 2016).

Reference: /root/reference/implementations/ccgan/ccgan.py + models.py — a
6-down/5-up U-Net G(masked_img, x_lr) with the quarter-resolution image
concatenated at the d2 feature map (models.py:45-80; bias-free convs, BN
eps 0.8), and the shared context_encoder-style D over the FULL 128px image
(models.py:83-111, patch H/8). Loss: MSE adversarial only — no
reconstruction term (ccgan.py:134,146-148).

Masking happens in-loop with fill value -1 (ccgan.py:84-92); the dual
transform pipeline (full res + 1/4 res, ccgan.py:60-69) becomes an
on-device bilinear downscale. The sample sheet accumulates the FIRST
sample of the first ten batches (persistent across training,
ccgan.py:158-166) and shows masked / generated / original rows, nrow=5.
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
from tpugan.losses import mse
from tpugan.models._common import apply_mod, init_module
from tpugan.models.context_encoder import CEDiscriminator
from tpugan.nn.layers import BatchNorm, Conv, ConvTranspose, Upsample, leaky_relu
from tpugan.ops.image import resize_bilinear
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "ccgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with ccgan.py:23-35.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(8, "size of the batches")
    dataset_name: str = flag("img_align_celeba", "name of the dataset")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(128, "size of each image dimension")
    mask_size: int = flag(32, "size of random mask")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(500, "interval between image sampling")


class _Down(nn.Module):
    features: int
    normalize: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.features, 4, 2, 1, use_bias=False, init_mode="normal02")(x)
        if self.normalize:
            x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
        x = leaky_relu(x, 0.2)
        if self.dropout:
            from tpugan.nn.layers import Dropout

            x = Dropout(self.dropout)(x, train=train)
        return x


class _Up(nn.Module):
    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = ConvTranspose(
            self.features, 4, 2, 1, use_bias=False, init_mode="normal02"
        )(x)
        x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
        x = nn.relu(x)
        if self.dropout:
            from tpugan.nn.layers import Dropout

            x = Dropout(self.dropout)(x, train=train)
        return jnp.concatenate([x, skip], axis=-1)


class CCGANGenerator(nn.Module):
    """models.py:45-80."""

    channels: int

    @nn.compact
    def __call__(self, x, x_lr, train: bool = True):
        d1 = _Down(64, normalize=False)(x, train)
        d2 = _Down(128)(d1, train)
        d2 = jnp.concatenate([d2, x_lr], axis=-1)  # models.py:69
        d3 = _Down(256, dropout=0.5)(d2, train)
        d4 = _Down(512, dropout=0.5)(d3, train)
        d5 = _Down(512, dropout=0.5)(d4, train)
        d6 = _Down(512, dropout=0.5)(d5, train)
        u1 = _Up(512, dropout=0.5)(d6, d5, train)
        u2 = _Up(512, dropout=0.5)(u1, d4, train)
        u3 = _Up(256, dropout=0.5)(u2, d3, train)
        u4 = _Up(128)(u3, d2, train)
        u5 = _Up(64)(u4, d1, train)
        y = Upsample(2)(u5)
        y = Conv(self.channels, 3, 1, 1, init_mode="normal02")(y)
        return jnp.tanh(y)


def build(cfg: Config):
    return {
        "generator": CCGANGenerator(channels=cfg.channels),
        "discriminator": CEDiscriminator(),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    lr_img = jnp.zeros(
        (1, cfg.img_size // 4, cfg.img_size // 4, cfg.channels), jnp.float32
    )
    g_params, g_bs = init_module(modules["generator"], k_g, img, lr_img, train=True)
    d_params, _ = init_module(modules["discriminator"], k_d, img)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"generator": g_bs}
    )


def apply_random_mask(imgs, rng, img_size, mask_size):
    """ccgan.py:84-92: per-sample random square filled with -1."""
    bsz = imgs.shape[0]
    coords = jax.random.randint(rng, (bsz, 2), 0, img_size - mask_size)

    def one(img, yx):
        fill = -jnp.ones((mask_size, mask_size, img.shape[-1]), img.dtype)
        return jax.lax.dynamic_update_slice(img, fill, (yx[0], yx[1], 0))

    return jax.vmap(one)(imgs, coords)


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_u8):
        imgs = normalize_uint8(imgs_u8)
        imgs_lr = resize_bilinear(imgs, (cfg.img_size // 4, cfg.img_size // 4))
        rng, k_mask, k_do1 = jax.random.split(state.rng, 3)
        masked_imgs = apply_random_mask(imgs, k_mask, cfg.img_size, cfg.mask_size)

        # --- G phase (ccgan.py:128-137): adversarial only ---
        def g_loss_fn(g_params):
            gen_imgs, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], masked_imgs,
                imgs_lr, train=True, dropout_rng=k_do1,
            )
            d_out, _ = apply_mod(D, state.params["discriminator"], None, gen_imgs)
            return mse(d_out, 1.0), (gen_imgs, g_bs)

        (g_loss, (gen_imgs, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (ccgan.py:143-151) ---
        gen_d = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(d_params):
            real_out, _ = apply_mod(D, d_params, None, imgs)
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
        out = {
            "d_loss": d_loss, "g_loss": g_loss,
            "imgs": imgs, "masked": masked_imgs, "lowres": imgs_lr,
        }
        return new_state, out

    return step


def make_loader(cfg: Config, batch_size=None, sharding=None):
    imgs, is_real = celeba_images_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.img_size, cfg.img_size,
        mode="train", val_tail=0, synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not is_real:
        print("[tpugan] CelebA not found on disk — using synthetic faces")
    return DeviceLoader(
        [imgs],
        batch_size or cfg.batch_size,
        shuffle=True,
        seed=cfg.seed,
        sharding=sharding,
    )


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    from tpugan.parallel import auto_sharding, replicate_for

    sharding = auto_sharding(cfg.batch_size)
    state = replicate_for(sharding, state)
    loader = make_loader(cfg, sharding=sharding)
    step = make_step(cfg, modules)
    G = modules["generator"]
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)

    # Persistent first-10 preview set (ccgan.py:103,158-166).
    saved_samples: dict = {}

    @jax.jit
    def gen_preview(g_params, g_bs, masked, lowres, rng):
        gen, _ = apply_mod(
            G, g_params, g_bs, masked, lowres, train=True, dropout_rng=rng
        )
        return gen

    def log(epoch, i, bpe, out):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), float(out["g_loss"]),
            )
        )

    def sample(state, out, batches_done):
        _accumulate(out, batches_done)
        gen = gen_preview(
            state.params["generator"], state.model_state["generator"],
            jnp.asarray(saved_samples["masked"]),
            jnp.asarray(saved_samples["lowres"]),
            jax.random.fold_in(state.rng, batches_done),
        )
        sheet = jnp.concatenate(
            [jnp.asarray(saved_samples["masked"]), gen,
             jnp.asarray(saved_samples["imgs"])], axis=1,
        )
        save_image(
            jax.device_get(sheet),
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=5, normalize=True,
        )

    seen_steps = set()

    def _accumulate(out, batches_done):
        # First sample of each of the first ten batches (ccgan.py:158-166);
        # idempotent per step so the log and sample callbacks can both call
        # it without double-adding.
        import numpy as np

        if batches_done in seen_steps or len(seen_steps) >= 10:
            return
        seen_steps.add(batches_done)
        if not saved_samples:
            for k in ("imgs", "masked", "lowres"):
                saved_samples[k] = np.asarray(jax.device_get(out[k][:1]))
        else:
            for k in ("imgs", "masked", "lowres"):
                saved_samples[k] = np.concatenate(
                    [saved_samples[k], np.asarray(jax.device_get(out[k][:1]))]
                )

    def log_and_accumulate(epoch, i, bpe, out):
        _accumulate(out, epoch * bpe + i)
        log(epoch, i, bpe, out)

    return run_training(
        cfg, loader, state, step,
        Callbacks(log=log_and_accumulate, sample=sample),
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
