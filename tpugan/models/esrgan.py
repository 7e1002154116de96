"""ESRGAN (Wang et al. 2018).

Reference: /root/reference/implementations/esrgan/esrgan.py + models.py +
datasets.py + test_on_image.py — RRDB generator (23 residual-in-residual
dense blocks by default via ``--residual_blocks``, no norms, 0.2 residual
scaling, models.py:18-93), the shared SR discriminator, VGG19 features[:35]
("vgg19_54" pre-activation) content loss (models.py:8-15; see
tpugan.nn.vgg for the weight policy here).

Schedule (esrgan.py:95-165): first ``--warmup_batches`` batches train G on
pixel L1 ONLY (logged as "[G pixel: f]"); afterwards
loss_G = content + lambda_adv * RaGAN-BCEWithLogits + lambda_pixel * pixel,
and D trains with relativistic-average real/fake losses. Checkpoints every
``--checkpoint_interval`` BATCHES (default 5000 — the only batch-interval
checkpoint in the zoo, esrgan.py:48,192-195; the reference formats the file
name with ``epoch``, kept). ``infer_image`` reproduces test_on_image.py
(the repo's only standalone inference CLI): sr-<name> written to
images/outputs/ after ImageNet denormalization.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import celeba_images_or_synthetic
from tpugan.io.checkpoint import load_modules, save_modules
from tpugan.io.images import save_image
from tpugan.losses import bce_with_logits, l1
from tpugan.models._common import apply_mod, init_module
from tpugan.models._im2im_common import StepObserver
from tpugan.models.srgan import prepare_lr_hr
from tpugan.nn.sr import ESRGANGenerator, SRDiscriminator
from tpugan.nn.vgg import (
    VGG19Features,
    imagenet_denormalize,
    imagenet_normalize,
    load_vgg19_npz,
)
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "esrgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with esrgan.py:34-52.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("img_align_celeba", "name of the dataset")
    batch_size: int = flag(4, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.9, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    hr_height: int = flag(256, "high res. image height")
    hr_width: int = flag(256, "high res. image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(100, "interval between saving image samples")
    checkpoint_interval: int = flag(
        5000, "batch interval between model checkpoints"
    )
    residual_blocks: int = flag(23, "number of residual blocks in the generator")
    warmup_batches: int = flag(500, "number of batches with pixel-wise loss only")
    lambda_adv: float = flag(5e-3, "adversarial loss weight")
    lambda_pixel: float = flag(1e-2, "pixel-wise loss weight")


def build(cfg: Config):
    return {
        "generator": ESRGANGenerator(
            channels=cfg.channels, filters=64,
            num_res_blocks=cfg.residual_blocks,
        ),
        "discriminator": SRDiscriminator(),
        "vgg": VGG19Features(cut=35),
    }


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
    g_params, _ = init_module(modules["generator"], k_g, lr_img)
    d_params, d_bs = init_module(modules["discriminator"], k_d, hr_img, train=True)
    vimg = jnp.zeros((1, cfg.hr_height, cfg.hr_height, cfg.channels), jnp.float32)
    v_params, _ = init_module(modules["vgg"], k_v, vimg)
    npz = os.path.join(cfg.data_dir, "vgg19_features.npz")
    if os.path.exists(npz):
        v_params = load_vgg19_npz(v_params, npz)
        print("[tpugan] loaded VGG19 weights from %s" % npz)
    else:
        print(
            "[tpugan] vgg19_features.npz not found under --data_dir — using "
            "randomly initialized VGG19 for the perceptual loss"
        )
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {
        "generator": g_params, "discriminator": d_params, "vgg": v_params,
    }
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"discriminator": d_bs}
    )


def make_steps(cfg: Config, modules=None):
    """(warmup_step, full_step): the first --warmup_batches run pixel-L1-only
    G updates (esrgan.py:120-128); after that the full RaGAN step."""
    modules = modules or build(cfg)
    G, D, V = modules["generator"], modules["discriminator"], modules["vgg"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def warmup_step(state: TrainState, imgs_u8):
        imgs_lr, imgs_hr = prepare_lr_hr(imgs_u8, cfg.hr_height)

        def g_loss_fn(g_params):
            gen_hr, _ = apply_mod(G, g_params, None, imgs_lr)
            return l1(gen_hr, imgs_hr)

        loss_pixel, g_grads = jax.value_and_grad(g_loss_fn)(
            state.params["generator"]
        )
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)
        new_state = state.replace(
            step=state.step + 1,
            params={**state.params, "generator": g_params},
            opt_state={**state.opt_state, "generator": g_opt},
        )
        return new_state, {"loss_pixel": loss_pixel}

    def full_step(state: TrainState, imgs_u8):
        imgs_lr, imgs_hr = prepare_lr_hr(imgs_u8, cfg.hr_height)

        # --- G phase (esrgan.py:112-146) ---
        def g_loss_fn(g_params):
            gen_hr, _ = apply_mod(G, g_params, None, imgs_lr)
            loss_pixel = l1(gen_hr, imgs_hr)
            pred_real, bs1 = apply_mod(
                D, state.params["discriminator"],
                state.model_state["discriminator"], imgs_hr, train=True,
            )
            pred_real = jax.lax.stop_gradient(pred_real)
            pred_fake, bs2 = apply_mod(
                D, state.params["discriminator"], bs1, gen_hr, train=True
            )
            loss_gan = bce_with_logits(
                pred_fake - jnp.mean(pred_real, axis=0, keepdims=True), 1.0
            )
            gen_features, _ = apply_mod(V, state.params["vgg"], None, gen_hr)
            real_features, _ = apply_mod(V, state.params["vgg"], None, imgs_hr)
            loss_content = l1(
                gen_features, jax.lax.stop_gradient(real_features)
            )
            loss = (
                loss_content
                + cfg.lambda_adv * loss_gan
                + cfg.lambda_pixel * loss_pixel
            )
            return loss, (gen_hr, loss_content, loss_gan, loss_pixel, bs2)

        (g_loss, (gen_hr, loss_content, loss_gan, loss_pixel, d_bs)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.params["generator"])
        )
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D phase (esrgan.py:152-165) ---
        gen_d = jax.lax.stop_gradient(gen_hr)

        def d_loss_fn(d_params):
            pred_real, bs1 = apply_mod(D, d_params, d_bs, imgs_hr, train=True)
            pred_fake, bs2 = apply_mod(D, d_params, bs1, gen_d, train=True)
            loss_real = bce_with_logits(
                pred_real - jnp.mean(pred_fake, axis=0, keepdims=True), 1.0
            )
            loss_fake = bce_with_logits(
                pred_fake - jnp.mean(pred_real, axis=0, keepdims=True), 0.0
            )
            return (loss_real + loss_fake) / 2, bs2

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
            model_state={"discriminator": d_bs_final},
            opt_state={"generator": g_opt, "discriminator": d_opt},
        )
        out = {
            "d_loss": d_loss, "g_loss": g_loss,
            "loss_content": loss_content, "loss_GAN": loss_gan,
            "loss_pixel": loss_pixel,
            "imgs_lr": imgs_lr, "gen_hr": gen_hr,
        }
        return new_state, out

    return warmup_step, full_step


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


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    ckptdir = os.path.join(cfg.output_dir, "saved_models")
    imgdir = os.path.join(cfg.output_dir, "images", "training")
    os.makedirs(imgdir, exist_ok=True)
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
    warmup_step, full_step = make_steps(cfg, modules)
    warmup_step = jax.jit(warmup_step)
    full_step = jax.jit(full_step)

    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    for epoch in range(cfg.epoch, cfg.n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            batches_done = epoch * bpe + i
            if batches_done < cfg.warmup_batches:
                state, out = warmup_step(state, *batch)
                observer.observe(batches_done, out)
                if cfg.log_interval > 0 and i % cfg.log_interval == 0:
                    print(
                        "[Epoch %d/%d] [Batch %d/%d] [G pixel: %f]"
                        % (
                            epoch, cfg.n_epochs, i, bpe,
                            float(out["loss_pixel"]),
                        )
                    )
                continue
            state, out = full_step(state, *batch)
            observer.observe(batches_done, out)
            if cfg.log_interval > 0 and i % cfg.log_interval == 0:
                print(
                    "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] "
                    "[G loss: %f, content: %f, adv: %f, pixel: %f]"
                    % (
                        epoch, cfg.n_epochs, i, bpe,
                        float(out["d_loss"]), float(out["g_loss"]),
                        float(out["loss_content"]), float(out["loss_GAN"]),
                        float(out["loss_pixel"]),
                    )
                )
            if cfg.sample_interval > 0 and batches_done % cfg.sample_interval == 0:
                # esrgan denormalizes previews (esrgan.py:186-190).
                out2 = dict(out)
                save_sr_sample_to = os.path.join(imgdir, "%d.png" % batches_done)
                from tpugan.ops.image import upsample_nearest

                lr_up = imagenet_denormalize(upsample_nearest(out["imgs_lr"], 4))
                gen = imagenet_denormalize(out["gen_hr"])
                grid = jnp.concatenate([lr_up, gen], axis=2)
                save_image(
                    jax.device_get(grid), save_sr_sample_to, nrow=1,
                    normalize=False,
                )
            if (
                cfg.checkpoint_interval > 0
                and batches_done % cfg.checkpoint_interval == 0
            ):
                os.makedirs(ckptdir, exist_ok=True)
                save_modules(
                    {
                        n: state.params[n]
                        for n in ("generator", "discriminator")
                    },
                    ckptdir, epoch,
                    {
                        n: (state.model_state or {}).get(n)
                        for n in ("generator", "discriminator")
                    },
                )
    observer.close()
    return state


# ---------------------------------------------------------------------------
# Inference CLI (esrgan/test_on_image.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TestOnImageConfig(BaseConfig):
    # Flag parity with test_on_image.py:11-16.
    image_path: str = flag("", "Path to image")
    checkpoint_model: str = flag("", "Path to checkpoint model")
    channels: int = flag(3, "Number of image channels")
    residual_blocks: int = flag(23, "Number of residual blocks in G")


def infer_image(cfg: TestOnImageConfig):
    """test_on_image.py:19-39: load G, normalize input, 4x upsample,
    denormalize, write images/outputs/sr-<name>."""
    from PIL import Image

    assert cfg.image_path and cfg.checkpoint_model, (
        "--image_path and --checkpoint_model are required"
    )
    G = ESRGANGenerator(
        channels=cfg.channels, filters=64, num_res_blocks=cfg.residual_blocks
    )
    img = np.asarray(
        Image.open(cfg.image_path).convert("RGB"), np.float32
    ) / 255.0
    x = imagenet_normalize(jnp.asarray(img))[None]
    template, _ = init_module(G, jax.random.PRNGKey(0), x)
    from tpugan.io.checkpoint import load_module_payload

    params = load_module_payload(template, cfg.checkpoint_model)["params"]
    sr, _ = apply_mod(G, params, None, x)
    sr = imagenet_denormalize(sr)
    outdir = os.path.join(cfg.output_dir, "images", "outputs")
    os.makedirs(outdir, exist_ok=True)
    fn = cfg.image_path.split("/")[-1]
    save_image(jax.device_get(sr), os.path.join(outdir, "sr-%s" % fn), nrow=1)
    return os.path.join(outdir, "sr-%s" % fn)


def main_test_on_image(argv=None):
    infer_image(config_from_args(TestOnImageConfig, argv))


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
