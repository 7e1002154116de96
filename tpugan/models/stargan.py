"""StarGAN (Choi et al. 2018) — multi-domain attribute translation.

Reference: /root/reference/implementations/stargan/stargan.py + models.py +
datasets.py — ResNet G over cat(img, broadcast target-attrs) with affine
InstanceNorm (models.py:35-79), 6-strided D with a 3x3 PatchGAN head and a
full-receptive-field attribute-classification conv head (models.py:87-115,
both bias=False), on 128px CelebA with ``--selected_attrs``.

Losses (stargan.py:72-83,218-264): WGAN-GP (lambda_gp=10) with
classification BCEWithLogits summed/batch (the deprecated
``size_average=False`` path, stargan.py:76-77) at lambda_cls=1 and cycle L1
at lambda_rec=10; D every batch, G every n_critic. ``weights_init_normal``
here touches ONLY conv weights (models.py:6-9) — no bias zeroing, no norm
branch; the affine IN params keep torch defaults.

The reference's InstanceNorms are ``track_running_stats=True``
(models.py:23): training normalizes per-instance while accumulating
running buffers that only eval mode would consume (stargan.py never calls
.eval(), so they are unobservable during training). tpugan tracks them
with torch's exact update rule (nn/layers.py:InstanceNorm
track_running_stats) so checkpoints import/export completely and
eval-mode inference matches torch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import celeba_or_synthetic, resize_crop_flip_transform
from tpugan.io.images import save_image
from tpugan.losses import l1
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.layers import Conv, ConvTranspose, InstanceNorm, leaky_relu
from tpugan.models._im2im_common import StepObserver
from tpugan.ops.penalty import wgan_gp_penalty
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

import datetime
import os
import sys

NAME = "stargan"
LAMBDA_CLS, LAMBDA_REC, LAMBDA_GP = 1.0, 10.0, 10.0  # stargan.py:81-83


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with stargan.py:40-64.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("img_align_celeba", "name of the dataset")
    batch_size: int = flag(16, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(128, "size of image height")
    img_width: int = flag(128, "size of image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(400, "interval between saving generator samples")
    checkpoint_interval: int = flag(-1, "interval between model checkpoints")
    residual_blocks: int = flag(6, "number of residual blocks in generator")
    selected_attrs: List[str] = flag(
        ["Black_Hair", "Blond_Hair", "Brown_Hair", "Male", "Young"],
        "selected attributes for the CelebA dataset",
        short="--list",  # stargan.py:56-62 exposes both spellings
    )
    n_critic: int = flag(
        5, "number of training iterations for WGAN discriminator"
    )


def _tracked_in():
    # models.py:23: InstanceNorm2d(..., affine=True, track_running_stats=True).
    return InstanceNorm(affine=True, track_running_stats=True)


class _ResBlockAffine(nn.Module):
    """models.py:17-32: Conv(3,1,1,bias=False)-affineIN-ReLU-Conv-affineIN."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = Conv(self.features, 3, 1, 1, use_bias=False, init_mode="normal02")(x)
        y = _tracked_in()(y, train=train)
        y = nn.relu(y)
        y = Conv(self.features, 3, 1, 1, use_bias=False, init_mode="normal02")(y)
        y = _tracked_in()(y, train=train)
        return x + y


class StarGenerator(nn.Module):
    """models.py:35-79."""

    channels: int
    res_blocks: int

    @nn.compact
    def __call__(self, x, c, train: bool = True):
        b, h, w, _ = x.shape
        cmap = jnp.broadcast_to(c[:, None, None, :], (b, h, w, c.shape[-1]))
        y = jnp.concatenate([x, cmap], axis=-1)
        y = Conv(64, 7, 1, 3, use_bias=False, init_mode="normal02")(y)
        y = _tracked_in()(y, train=train)
        y = nn.relu(y)
        dim = 64
        for _ in range(2):
            dim *= 2
            y = Conv(dim, 4, 2, 1, use_bias=False, init_mode="normal02")(y)
            y = _tracked_in()(y, train=train)
            y = nn.relu(y)
        for _ in range(self.res_blocks):
            y = _ResBlockAffine(dim)(y, train=train)
        for _ in range(2):
            dim //= 2
            y = ConvTranspose(dim, 4, 2, 1, use_bias=False, init_mode="normal02")(y)
            y = _tracked_in()(y, train=train)
            y = nn.relu(y)
        y = Conv(self.channels, 7, 1, 3, init_mode="normal02")(y)
        return jnp.tanh(y)


class StarDiscriminator(nn.Module):
    """models.py:87-115: 6 stride-2 LeakyReLU(0.01) convs, PatchGAN head +
    attribute head; returns (out_adv, out_cls_flat)."""

    img_size: int
    c_dim: int
    n_strided: int = 6

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = Conv(64, 4, 2, 1, init_mode="normal02")(img)
        x = leaky_relu(x, 0.01)
        dim = 64
        for _ in range(self.n_strided - 1):
            dim *= 2
            x = Conv(dim, 4, 2, 1, init_mode="normal02")(x)
            x = leaky_relu(x, 0.01)
        out_adv = Conv(1, 3, 1, 1, use_bias=False, init_mode="normal02")(x)
        k = self.img_size // 2**self.n_strided
        out_cls = Conv(self.c_dim, k, 1, 0, use_bias=False, init_mode="normal02")(x)
        return out_adv, out_cls.reshape(out_cls.shape[0], -1)


def criterion_cls(logit, target):
    """BCEWithLogits summed over elements / batch (stargan.py:76-77)."""
    per_elt = (
        jnp.maximum(logit, 0.0)
        - logit * target
        + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    )
    return jnp.sum(per_elt) / logit.shape[0]


def build(cfg: Config):
    c_dim = len(cfg.selected_attrs)
    return {
        "generator": StarGenerator(
            channels=cfg.channels, res_blocks=cfg.residual_blocks
        ),
        "discriminator": StarDiscriminator(
            img_size=cfg.img_height, c_dim=c_dim
        ),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    c_dim = len(cfg.selected_attrs)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    c = jnp.zeros((1, c_dim), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, img, c)
    d_params, _ = init_module(modules["discriminator"], k_d, img)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    params = {"generator": g_params, "discriminator": d_params}
    opt_state = {"generator": tx.init(g_params), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"generator": g_bs}
    )


def make_steps(cfg: Config, modules=None):
    """(d_step, g_step) — D every batch, G every n_critic-th
    (stargan.py:218-264). Both consume the SAME sampled_c / fake batch; the
    host passes d_step's fakes along so the G step regenerates identically
    (train-mode IN normalizes per-instance regardless of the running
    buffers, no dropout — the regeneration is exact, matching the
    reference's second generator(imgs, sampled_c) call)."""
    modules = modules or build(cfg)
    G, D = modules["generator"], modules["discriminator"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    c_dim = len(cfg.selected_attrs)

    def d_step(state: TrainState, imgs_u8, labels):
        imgs = normalize_uint8(imgs_u8)
        rng, k_c, k_gp = jax.random.split(state.rng, 3)
        sampled_c = jax.random.randint(
            k_c, (imgs.shape[0], c_dim), 0, 2
        ).astype(jnp.float32)
        # First G application of the reference batch: the IN running
        # buffers advance here (torch updates them on every train-mode
        # forward); train numerics are unaffected (per-instance stats).
        fake_imgs, g_bs = apply_mod(
            G, state.params["generator"], state.model_state["generator"],
            imgs, sampled_c,
        )
        fake_d = jax.lax.stop_gradient(fake_imgs)

        def d_loss_fn(d_params):
            (real_validity, pred_cls), _ = apply_mod(D, d_params, None, imgs)
            (fake_validity, _), _ = apply_mod(D, d_params, None, fake_d)
            gp = wgan_gp_penalty(
                lambda x: apply_mod(D, d_params, None, x)[0][0],
                imgs, fake_d, k_gp,
            )
            loss_adv = (
                -jnp.mean(real_validity)
                + jnp.mean(fake_validity)
                + LAMBDA_GP * gp
            )
            loss_cls = criterion_cls(pred_cls, labels)
            return loss_adv + LAMBDA_CLS * loss_cls, (loss_adv, loss_cls)

        (d_loss, (loss_adv, loss_cls)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params["discriminator"])
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)
        new_state = state.replace(
            step=state.step + 1,
            params={**state.params, "discriminator": d_params},
            model_state={**state.model_state, "generator": g_bs},
            opt_state={**state.opt_state, "discriminator": d_opt},
            rng=rng,
        )
        # sampled_c is re-derived in g_step from the SAME pre-split key, so
        # pass the consumed key forward via out for exact reuse.
        out = {
            "d_adv": loss_adv, "d_cls": loss_cls, "d_loss": d_loss,
            "sampled_c": sampled_c,
        }
        return new_state, out

    def g_step(state: TrainState, imgs_u8, labels, sampled_c):
        imgs = normalize_uint8(imgs_u8)
        rng = state.rng  # d_step already advanced it

        def g_loss_fn(g_params):
            # Two more train-mode G forwards (translate, recover) — chain
            # the IN running buffers through both, matching torch's
            # sequential updates; grads don't flow through the buffers.
            ms = state.model_state["generator"]
            gen_imgs, ms = apply_mod(G, g_params, ms, imgs, sampled_c)
            recov_imgs, ms = apply_mod(G, g_params, ms, gen_imgs, labels)
            (fake_validity, pred_cls), _ = apply_mod(
                D, state.params["discriminator"], None, gen_imgs
            )
            loss_adv = -jnp.mean(fake_validity)
            loss_cls = criterion_cls(pred_cls, sampled_c)
            loss_rec = l1(recov_imgs, imgs)
            loss = loss_adv + LAMBDA_CLS * loss_cls + LAMBDA_REC * loss_rec
            return loss, (loss_adv, loss_cls, loss_rec, ms)

        (g_loss, (loss_adv, loss_cls, loss_rec, g_bs)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.params["generator"]
            )
        )
        g_up, g_opt = tx.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)
        new_state = state.replace(
            params={**state.params, "generator": g_params},
            model_state={
                **state.model_state,
                "generator": jax.lax.stop_gradient(g_bs),
            },
            opt_state={**state.opt_state, "generator": g_opt},
            rng=rng,
        )
        out = {
            "g_loss": g_loss, "g_adv": loss_adv, "g_cls": loss_cls,
            "g_rec": loss_rec,
        }
        return new_state, out

    return d_step, g_step


def make_loader(cfg: Config, mode="train", batch_size=None, sharding=None):
    imgs, labels, is_real = celeba_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.img_height, cfg.img_width,
        cfg.selected_attrs, mode=mode, synthetic=cfg.synthetic_data,
        seed=cfg.seed,
    )
    if not is_real and mode == "train":
        print("[tpugan] CelebA not found on disk — using synthetic attr faces")
    transform = (
        resize_crop_flip_transform(
            cfg.seed, cfg.img_height, cfg.img_width, indices=(0,)
        )
        if mode == "train"
        else None
    )
    return DeviceLoader(
        [imgs, labels],
        batch_size or cfg.batch_size,
        shuffle=True,
        seed=cfg.seed if mode == "train" else cfg.seed + 991,
        sharding=sharding,
        host_transform=transform,
    )


# stargan.py:164-170 — translation sheet spec for the default 5 attrs.
LABEL_CHANGES = [
    ((0, 1), (1, 0), (2, 0)),
    ((0, 0), (1, 1), (2, 0)),
    ((0, 0), (1, 0), (2, 1)),
    ((3, -1),),
    ((4, -1),),
]


def make_sampler(cfg: Config, modules):
    """stargan.py:173-197: 10 val rows, each [original | c_dim translations]."""
    G = modules["generator"]
    c_dim = len(cfg.selected_attrs)
    val_loader = make_loader(cfg, mode="val", batch_size=10)
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    changes = [
        tuple(ch for ch in row if ch[0] < c_dim) for row in LABEL_CHANGES[:c_dim]
    ]

    @jax.jit
    def translate(g_params, g_bs, imgs_u8, labels):
        # ONE batched generator application over all n*c_dim translations
        # (the reference loops per image, stargan.py:179-195 — same values,
        # compile-friendly shape here).
        imgs = normalize_uint8(imgs_u8)
        n = imgs.shape[0]
        rep_imgs = jnp.repeat(imgs, c_dim, axis=0)  # (n*c_dim, H, W, C)
        lab = jnp.repeat(labels, c_dim, axis=0).reshape(n, c_dim, c_dim)
        for sample_i, chs in enumerate(changes):
            for col, val in chs:
                if val == -1:
                    lab = lab.at[:, sample_i, col].set(
                        1.0 - lab[:, sample_i, col]
                    )
                else:
                    lab = lab.at[:, sample_i, col].set(float(val))
        # Train-mode application like the reference's sampling (stargan.py
        # never .eval()s); the IN buffer advance from sampling is discarded
        # (the reference's sampling does advance torch's buffers — an
        # unobservable-in-training deviation, documented here).
        gen, _ = apply_mod(
            G, g_params, g_bs, rep_imgs, lab.reshape(n * c_dim, c_dim)
        )
        gen = gen.reshape(n, c_dim, *gen.shape[1:])
        # Row per sample: [original | c_dim translations] along width.
        rows = jnp.concatenate(
            [imgs[:, None]] + [gen[:, j : j + 1] for j in range(c_dim)],
            axis=1,
        )  # (n, c_dim+1, H, W, C)
        rows = jnp.concatenate(
            [rows[:, k] for k in range(c_dim + 1)], axis=2
        )  # (n, H, W*(c_dim+1), C)
        return jnp.concatenate([rows[k] for k in range(n)], axis=0)

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        sheet = translate(
            state.params["generator"], state.model_state["generator"],
            batch[0], batch[1],
        )
        save_image(
            jax.device_get(sheet)[None],
            os.path.join(imgdir, "%s.png" % batches_done),
            nrow=1, normalize=True, padding=2,
        )

    return sample


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    if cfg.epoch != 0:
        # stargan checkpoints live in saved_models/ directly (stargan.py:96-97).
        from tpugan.io.checkpoint import load_modules

        ckptdir = os.path.join(cfg.output_dir, "saved_models")
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
    d_step, g_step = make_steps(cfg, modules)
    d_step = jax.jit(d_step)
    g_step = jax.jit(g_step)
    sample = make_sampler(cfg, modules)

    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    start_time = time.time()
    for epoch in range(cfg.epoch, cfg.n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            state, d_out = d_step(state, *batch)
            if i % cfg.n_critic != 0:
                observer.observe(epoch * bpe + i, d_out)
            else:
                state, g_out = g_step(state, *batch, d_out["sampled_c"])
                observer.observe(epoch * bpe + i, {**d_out, **g_out})
                batches_done = epoch * bpe + i
                batches_left = cfg.n_epochs * bpe - batches_done
                time_left = datetime.timedelta(
                    seconds=batches_left
                    * (time.time() - start_time)
                    / (batches_done + 1)
                )
                if cfg.log_interval > 0:
                    sys.stdout.write(
                        "\r[Epoch %d/%d] [Batch %d/%d] [D adv: %f, aux: %f] "
                        "[G loss: %f, adv: %f, aux: %f, cycle: %f] ETA: %s"
                        % (
                            epoch, cfg.n_epochs, i, bpe,
                            float(d_out["d_adv"]), float(d_out["d_cls"]),
                            float(g_out["g_loss"]), float(g_out["g_adv"]),
                            float(g_out["g_cls"]), float(g_out["g_rec"]),
                            time_left,
                        )
                    )
                    sys.stdout.flush()
                if (
                    cfg.sample_interval > 0
                    and batches_done % cfg.sample_interval == 0
                ):
                    sample(state, d_out, batches_done)
        # stargan saves under saved_models/ directly (no dataset subdir,
        # stargan.py:297-300) — reuse the shared helper with dataset_name "".
        if (
            cfg.checkpoint_interval != -1
            and epoch % cfg.checkpoint_interval == 0
        ):
            from tpugan.io.checkpoint import save_modules

            ckptdir = os.path.join(cfg.output_dir, "saved_models")
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
