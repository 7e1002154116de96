"""pix2pix (Isola et al. 2017) — paired image-to-image translation.

Reference: /root/reference/implementations/pix2pix/pix2pix.py + models.py +
datasets.py — 8-down/7-up U-Net generator (models.py:55-101), conditional
PatchGAN D on cat(B_side, A_side) (models.py:109-133, patch = H/16 x W/16,
pix2pix.py:57), MSE GAN + lambda=100 L1 pixel loss (pix2pix.py:50-54,
140-148), batch_size 1 at 256px (pix2pix.py:28,34-35).

Direction quirk kept (pix2pix.py:127-128): the dataset's "A" is the LEFT
half and "B" the RIGHT half of each paired image (datasets.py:19-24), and
training swaps them — ``real_A = batch["B"]`` (the conditioning input),
``real_B = batch["A"]`` (the target). Dropout stays ACTIVE during sampling
(sample_images calls the train-mode generator, pix2pix.py:107-114).

Checkpoints: generator_<E>.pth / discriminator_<E>.pth every
``--checkpoint_interval`` epochs; resume with ``--epoch N``
(pix2pix.py:69-76,204-207).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import joint_hflip_transform, paired_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import l1, mse
from tpugan.models._common import apply_mod, init_module
from tpugan.models._im2im_common import (
    StepObserver,
    EtaLogger,
    checkpoint_epoch,
    maybe_resume,
    out_dirs,
)
from tpugan.nn.im2im import GeneratorUNet, PatchGAN
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "pix2pix"
LAMBDA_PIXEL = 100.0  # pix2pix.py:54


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with pix2pix.py:24-41.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("facades", "name of the dataset")
    batch_size: int = flag(1, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(256, "size of image height")
    img_width: int = flag(256, "size of image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(
        500, "interval between sampling of images from generators"
    )
    checkpoint_interval: int = flag(-1, "interval between model checkpoints")


class _CondD(nn.Module):
    """models.py:109-133: PatchGAN on channel-concat(img_A, img_B); head
    conv bias=False."""

    @nn.compact
    def __call__(self, img_a, img_b, train: bool = True):
        x = jnp.concatenate([img_a, img_b], axis=-1)
        return PatchGAN(head_bias=False, init_mode="normal02")(x, train=train)


def build(cfg: Config):
    return {
        "generator": GeneratorUNet(
            out_channels=cfg.channels, init_mode="normal02"
        ),
        "discriminator": _CondD(),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    g_params, _ = init_module(modules["generator"], k_g, img, train=False)
    d_params, _ = init_module(modules["discriminator"], k_d, img, img)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(params, opt_state, k_state)


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, a_u8, b_u8):
        # Direction swap (pix2pix.py:127-128): condition on the RIGHT half.
        real_a = normalize_uint8(b_u8)
        real_b = normalize_uint8(a_u8)
        rng, k_do1 = jax.random.split(state.rng)

        # --- G phase (pix2pix.py:138-152) ---
        def g_loss_fn(g_params):
            fake_b, _ = apply_mod(
                G, g_params, None, real_a, train=True, dropout_rng=k_do1
            )
            pred_fake, _ = apply_mod(
                D, state.params["discriminator"], None, fake_b, real_a
            )
            loss_gan = mse(pred_fake, 1.0)
            loss_pixel = l1(fake_b, real_b)
            return loss_gan + LAMBDA_PIXEL * loss_pixel, (
                fake_b, loss_gan, loss_pixel,
            )

        (g_loss, (fake_b, loss_gan, loss_pixel)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (pix2pix.py:158-172) ---
        fake_b_d = jax.lax.stop_gradient(fake_b)

        def d_loss_fn(d_params):
            pred_real, _ = apply_mod(D, d_params, None, real_b, real_a)
            pred_fake, _ = apply_mod(D, d_params, None, fake_b_d, real_a)
            return 0.5 * (mse(pred_real, 1.0) + mse(pred_fake, 0.0))

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
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        out = {
            "d_loss": d_loss, "g_loss": g_loss,
            "loss_pixel": loss_pixel, "loss_GAN": loss_gan,
        }
        return new_state, out

    return step


def make_loader(cfg: Config, split="train", batch_size=None, sharding=None):
    a, b, is_real = paired_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.img_height, cfg.img_width,
        split=split, synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not is_real and split == "train":
        print(
            "[tpugan] dataset %r not found on disk — using synthetic pairs"
            % cfg.dataset_name
        )
    return DeviceLoader(
        [a, b],
        batch_size or cfg.batch_size,
        shuffle=True,
        seed=cfg.seed if split == "train" else cfg.seed + 991,
        sharding=sharding,
        host_transform=(
            joint_hflip_transform(cfg.seed) if split == "train" else None
        ),
    )


def make_sampler(cfg: Config, modules):
    """pix2pix.py:107-114: 10 val images, rows real_A / fake_B / real_B
    stacked vertically per sample, nrow=5; train-mode generator."""
    G = modules["generator"]
    val_loader = make_loader(cfg, split="val", batch_size=10)
    imgdir, _ = out_dirs(cfg)

    @jax.jit
    def translate(g_params, a_u8, b_u8, rng):
        real_a = normalize_uint8(b_u8)
        real_b = normalize_uint8(a_u8)
        fake_b, _ = apply_mod(
            G, g_params, None, real_a, train=True, dropout_rng=rng
        )
        return real_a, fake_b, real_b

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        rng = jax.random.fold_in(state.rng, batches_done)
        real_a, fake_b, real_b = translate(
            state.params["generator"], batch[0], batch[1], rng
        )
        stacked = jnp.concatenate([real_a, fake_b, real_b], axis=1)
        save_image(
            jax.device_get(stacked),
            "%s/%s.png" % (imgdir, batches_done),
            nrow=5, normalize=True,
        )

    return sample


def run(cfg: Config):
    modules = build(cfg)
    state = maybe_resume(create_state(cfg, modules), cfg,
                         ["generator", "discriminator"])
    sharding = auto_sharding(cfg.batch_size)
    loader = make_loader(cfg, sharding=sharding)
    state = replicate_for(sharding, state)
    observer = StepObserver(cfg)
    step = jax.jit(make_step(cfg, modules), donate_argnums=0)
    sample = make_sampler(cfg, modules)
    eta = EtaLogger(cfg.n_epochs)

    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    for epoch in range(cfg.epoch, cfg.n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            state, out = step(state, *batch)
            batches_done = epoch * bpe + i
            observer.observe(batches_done, out)
            if cfg.log_interval > 0 and i % cfg.log_interval == 0:
                eta.line(
                    epoch, i, bpe,
                    "[D loss: %f] [G loss: %f, pixel: %f, adv: %f]"
                    % (
                        float(out["d_loss"]), float(out["g_loss"]),
                        float(out["loss_pixel"]), float(out["loss_GAN"]),
                    ),
                )
            if cfg.sample_interval > 0 and batches_done % cfg.sample_interval == 0:
                sample(state, out, batches_done)
        checkpoint_epoch(state, cfg, epoch, ["generator", "discriminator"])
    observer.close()
    return state


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
