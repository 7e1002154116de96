"""SRGAN (Ledig et al. 2017) — photo-realistic 4x super-resolution.

Reference: /root/reference/implementations/srgan/srgan.py + models.py +
datasets.py — SRResNet generator (16 residual blocks, PixelShuffle 4x,
models.py:33-71), 8-conv discriminator (models.py:74-105), VGG19
features[:18] content loss on ImageNet-pretrained features
(models.py:8-15; see tpugan.nn.vgg for this environment's weight policy).
loss_G = content + 1e-3 * adv (MSE), loss_D = MSE real/fake pair
(srgan.py:108-145); torch-default init (no weights_init_normal here).

Data: one CelebA image per sample resized bicubically to (H/4, H/4) and
(H, H) — the reference uses hr_height for BOTH dims (datasets.py:29,36), a
quirk kept; ImageNet mean/std normalization. Downscale happens on-device
from the HR uint8 batch. Samples: [4x-nearest-upsampled LR | SR] vertical
grids, nrow=1 columns side by side (srgan.py:157-163).

Reference quirk (srgan.py:77-78): the resume paths lack the ``% epoch``
format args (crash as written) — fixed to formatted paths here.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import celeba_images_or_synthetic
from tpugan.io.checkpoint import load_modules, save_modules
from tpugan.io.images import make_grid, save_image
from tpugan.losses import l1, mse
from tpugan.models._im2im_common import StepObserver
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.sr import SRDiscriminator, SRGANGenerator
from tpugan.nn.vgg import VGG19Features, imagenet_normalize, load_vgg19_npz
from tpugan.ops.image import upsample_nearest
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "srgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with srgan.py:34-48.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("img_align_celeba", "name of the dataset")
    batch_size: int = flag(4, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    hr_height: int = flag(256, "high res. image height")
    hr_width: int = flag(256, "high res. image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(100, "interval between saving image samples")
    checkpoint_interval: int = flag(-1, "interval between model checkpoints")


def build(cfg: Config):
    return {
        "generator": SRGANGenerator(channels=cfg.channels),
        "discriminator": SRDiscriminator(),
        "vgg": VGG19Features(cut=18),
    }


def _vgg_params(cfg: Config, modules, rng):
    img = jnp.zeros((1, cfg.hr_height, cfg.hr_height, cfg.channels), jnp.float32)
    p, _ = init_module(modules["vgg"], rng, img)
    npz = os.path.join(cfg.data_dir, "vgg19_features.npz")
    if os.path.exists(npz):
        p = load_vgg19_npz(p, npz)
        print("[tpugan] loaded VGG19 weights from %s" % npz)
    else:
        print(
            "[tpugan] vgg19_features.npz not found under --data_dir — using "
            "randomly initialized VGG19 for the perceptual loss"
        )
    return p


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_v, k_state = jax.random.split(rng, 4)
    lr_img = jnp.zeros(
        (1, cfg.hr_height // 4, cfg.hr_height // 4, cfg.channels), jnp.float32
    )
    hr_img = jnp.zeros(
        (1, cfg.hr_height, cfg.hr_height, cfg.channels), jnp.float32
    )
    g_params, g_bs = init_module(modules["generator"], k_g, lr_img, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, hr_img, train=True)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {
        "generator": g_params,
        "discriminator": d_params,
        # Frozen perceptual backbone: carried in params for checkpointing
        # but never updated (feature_extractor.eval(), srgan.py:62).
        "vgg": _vgg_params(cfg, modules, k_v),
    }
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state,
        model_state={"generator": g_bs, "discriminator": d_bs},
    )


def prepare_lr_hr(imgs_u8, hr_size):
    """On-device equivalent of the dataset's dual transform
    (srgan/datasets.py:27-40): bicubic resize to (H/4, H/4) and (H, H),
    then ImageNet normalization."""
    x01 = imgs_u8.astype(jnp.float32) / 255.0
    b, _, _, c = x01.shape
    hr = jax.image.resize(x01, (b, hr_size, hr_size, c), method="bicubic")
    lr = jax.image.resize(
        x01, (b, hr_size // 4, hr_size // 4, c), method="bicubic"
    )
    return imagenet_normalize(lr), imagenet_normalize(hr)


def make_step(cfg: Config, modules=None):
    inner = make_step_pairs(cfg, modules)

    def step(state: TrainState, imgs_u8):
        imgs_lr, imgs_hr = prepare_lr_hr(imgs_u8, cfg.hr_height)
        return inner(state, imgs_lr, imgs_hr)

    return step


def make_step_pairs(cfg: Config, modules=None):
    """The same train step over an explicit (LR, HR) ImageNet-normalized
    pair — the body `make_step` wraps after its on-device dual resize
    (srgan/datasets.py:27-40). Exposed separately for true LR/HR-pair
    datasets and for the head-to-head harness, where both frameworks must
    consume byte-identical host-precomputed pairs
    (scripts/fid_headtohead.py --model srgan64)."""
    modules = modules or build(cfg)
    G, D, V = modules["generator"], modules["discriminator"], modules["vgg"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_lr, imgs_hr):
        rng = jax.random.fold_in(state.rng, 1)

        # --- G phase (srgan.py:112-129) ---
        def g_loss_fn(g_params):
            gen_hr, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], imgs_lr,
                train=True,
            )
            d_out, d_bs = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], gen_hr, train=True,
            )
            loss_gan = mse(d_out, 1.0)
            gen_features, _ = apply_mod(V, state.params["vgg"], None, gen_hr)
            real_features, _ = apply_mod(V, state.params["vgg"], None, imgs_hr)
            loss_content = l1(
                gen_features, jax.lax.stop_gradient(real_features)
            )
            return loss_content + 1e-3 * loss_gan, (gen_hr, g_bs, d_bs)

        (g_loss, (gen_hr, g_bs, d_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params["generator"])
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (srgan.py:135-145) ---
        gen_d = jax.lax.stop_gradient(gen_hr)

        def d_loss_fn(d_params):
            real_out, bs1 = apply_mod(D, d_params, d_bs, imgs_hr, train=True)
            fake_out, bs2 = apply_mod(D, d_params, bs1, gen_d, train=True)
            return (mse(real_out, 1.0) + mse(fake_out, 0.0)) / 2, bs2

        (d_loss, d_bs_final), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params["discriminator"])
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        new_state = state.replace(
            step=state.step + 1,
            params={
                "generator": g_params, "discriminator": d_params,
                "vgg": state.params["vgg"],
            },
            model_state={"generator": g_bs, "discriminator": d_bs_final},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        out = {
            "d_loss": d_loss, "g_loss": g_loss,
            "imgs_lr": imgs_lr, "gen_hr": gen_hr,
        }
        return new_state, out

    return step


def make_loader(cfg: Config, batch_size=None, sharding=None):
    imgs, is_real = celeba_images_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.hr_height, cfg.hr_height,
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


def save_sr_sample(cfg, out, batches_done, denorm=None):
    """srgan.py:157-163: [upsampled LR | SR] side-by-side column grids."""
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    lr_up = upsample_nearest(out["imgs_lr"], 4)
    gen = out["gen_hr"]
    if denorm is not None:
        lr_up, gen = denorm(lr_up), denorm(gen)
        g1 = make_grid(np.asarray(jax.device_get(lr_up)), nrow=1)
        g2 = make_grid(np.asarray(jax.device_get(gen)), nrow=1)
    else:
        g1 = make_grid(np.asarray(jax.device_get(lr_up)), nrow=1, normalize=True)
        g2 = make_grid(np.asarray(jax.device_get(gen)), nrow=1, normalize=True)
    grid = np.concatenate([g1, g2], axis=1)
    save_image(
        grid[None], os.path.join(imgdir, "%d.png" % batches_done),
        nrow=1, normalize=False, padding=0,
    )


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    ckptdir = os.path.join(cfg.output_dir, "saved_models")
    if cfg.epoch != 0:
        params, stats = load_modules(
            {n: state.params[n] for n in ("generator", "discriminator")},
            ckptdir, cfg.epoch,
            {n: (state.model_state or {}).get(n)
             for n in ("generator", "discriminator")},
        )
        state = state.replace(
            params={**state.params, **params},
            model_state={**(state.model_state or {}), **stats},
        )
    sharding = auto_sharding(cfg.batch_size)
    loader = make_loader(cfg, sharding=sharding)
    state = replicate_for(sharding, state)
    observer = StepObserver(cfg)
    step = jax.jit(make_step(cfg, modules), donate_argnums=0)

    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    for epoch in range(cfg.epoch, cfg.n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            state, out = step(state, *batch)
            if cfg.log_interval > 0 and i % cfg.log_interval == 0:
                sys.stdout.write(
                    "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
                    % (
                        epoch, cfg.n_epochs, i, bpe,
                        float(out["d_loss"]), float(out["g_loss"]),
                    )
                )
                sys.stdout.flush()
            batches_done = epoch * bpe + i
            observer.observe(batches_done, out)
            if cfg.sample_interval > 0 and batches_done % cfg.sample_interval == 0:
                save_sr_sample(cfg, out, batches_done)
        if cfg.checkpoint_interval != -1 and epoch % cfg.checkpoint_interval == 0:
            os.makedirs(ckptdir, exist_ok=True)
            save_modules(
                {n: state.params[n] for n in ("generator", "discriminator")},
                ckptdir, epoch,
                {n: (state.model_state or {}).get(n)
                 for n in ("generator", "discriminator")},
            )
    observer.close()
    return state


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
