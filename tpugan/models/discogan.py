"""DiscoGAN (Kim et al. 2017).

Reference: /root/reference/implementations/discogan/discogan.py + models.py —
two 6-down/5-up U-Nets (convs WITH bias, models.py:20-86) and two 3-block
PatchGAN Ds (patch H/8, models.py:94-120) at 64px on paired data read from
the pix2pix-style split-image layout (datasets.py). Losses
(discogan.py:150-167): MSE GAN + cycle L1 + **pixelwise L1 to the opposite
domain** (fake_A vs real_A, fake_B vs real_B), all unweighted sums. One Adam
over both Gs, one per D (discogan.py:83-87); fakes for the D step are the
G-phase batch detached (no replay buffer here).
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
from tpugan.nn.im2im import PatchGAN, UNetDown, UNetUp, zero_pad_lt
from tpugan.nn.layers import Conv, Upsample
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "discogan"
MODULES = ("G_AB", "G_BA", "D_A", "D_B")


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with discogan.py:24-37.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("edges2shoes", "name of the dataset")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(64, "size of image height")
    img_width: int = flag(64, "size of image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(100, "interval between saving generator samples")
    checkpoint_interval: int = flag(-1, "interval between model checkpoints")


class DiscoGenerator(nn.Module):
    """models.py:51-86: 6-down/5-up U-Net, biased convs."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(use_bias=True, init_mode="normal02")
        d1 = UNetDown(64, normalize=False, **kw)(x, train)
        d2 = UNetDown(128, **kw)(d1, train)
        d3 = UNetDown(256, dropout=0.5, **kw)(d2, train)
        d4 = UNetDown(512, dropout=0.5, **kw)(d3, train)
        d5 = UNetDown(512, dropout=0.5, **kw)(d4, train)
        d6 = UNetDown(512, dropout=0.5, normalize=False, **kw)(d5, train)
        u1 = UNetUp(512, dropout=0.5, **kw)(d6, d5, train)
        u2 = UNetUp(512, dropout=0.5, **kw)(u1, d4, train)
        u3 = UNetUp(256, dropout=0.5, **kw)(u2, d3, train)
        u4 = UNetUp(128, **kw)(u3, d2, train)
        u5 = UNetUp(64, **kw)(u4, d1, train)
        y = Upsample(2)(u5)
        y = zero_pad_lt(y)
        y = Conv(self.channels, 4, 1, 1, init_mode="normal02")(y)
        return jnp.tanh(y)


def build(cfg: Config):
    g = lambda: DiscoGenerator(channels=cfg.channels)
    d = lambda: PatchGAN(
        filters=(64, 128, 256), head_bias=True, init_mode="normal02"
    )
    return {"G_AB": g(), "G_BA": g(), "D_A": d(), "D_B": d()}


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, 5)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    params = {}
    for k, name in zip(keys[:4], MODULES):
        p, _ = init_module(modules[name], k, img, train=False)
        params[name] = p
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    g_tree = {"G_AB": params["G_AB"], "G_BA": params["G_BA"]}
    opt_state = {
        "G": tx.init(g_tree),
        "D_A": tx.init(params["D_A"]),
        "D_B": tx.init(params["D_B"]),
    }
    return TrainState.create(params, opt_state, keys[4])


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    D_A, D_B = modules["D_A"], modules["D_B"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, a_u8, b_u8):
        real_a = normalize_uint8(a_u8)
        real_b = normalize_uint8(b_u8)
        rng, k1, k2, k3, k4 = jax.random.split(state.rng, 5)

        # --- G phase (discogan.py:145-170) ---
        def g_loss_fn(g_tree):
            fake_b, _ = apply_mod(
                G_AB, g_tree["G_AB"], None, real_a, train=True, dropout_rng=k1
            )
            pred_b, _ = apply_mod(D_B, state.params["D_B"], None, fake_b)
            fake_a, _ = apply_mod(
                G_BA, g_tree["G_BA"], None, real_b, train=True, dropout_rng=k2
            )
            pred_a, _ = apply_mod(D_A, state.params["D_A"], None, fake_a)
            loss_gan = (mse(pred_b, 1.0) + mse(pred_a, 1.0)) / 2
            loss_pixelwise = (l1(fake_a, real_a) + l1(fake_b, real_b)) / 2
            recov_a, _ = apply_mod(
                G_BA, g_tree["G_BA"], None, fake_b, train=True, dropout_rng=k3
            )
            recov_b, _ = apply_mod(
                G_AB, g_tree["G_AB"], None, fake_a, train=True, dropout_rng=k4
            )
            loss_cycle = (l1(recov_a, real_a) + l1(recov_b, real_b)) / 2
            loss = loss_gan + loss_cycle + loss_pixelwise
            return loss, (fake_a, fake_b, loss_gan, loss_pixelwise, loss_cycle)

        g_tree = {"G_AB": state.params["G_AB"], "G_BA": state.params["G_BA"]}
        (g_loss, (fake_a, fake_b, loss_gan, loss_pixelwise, loss_cycle)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(g_tree)
        )
        g_up, g_opt = tx.update(g_grads, state.opt_state["G"], g_tree)
        g_tree = optax.apply_updates(g_tree, g_up)

        fake_a_d = jax.lax.stop_gradient(fake_a)
        fake_b_d = jax.lax.stop_gradient(fake_b)

        # --- D_A / D_B phases (discogan.py:176-203) ---
        def da_loss_fn(d_params):
            pred_real, _ = apply_mod(D_A, d_params, None, real_a)
            pred_fake, _ = apply_mod(D_A, d_params, None, fake_a_d)
            return (mse(pred_real, 1.0) + mse(pred_fake, 0.0)) / 2

        loss_d_a, da_grads = jax.value_and_grad(da_loss_fn)(state.params["D_A"])
        da_up, da_opt = tx.update(
            da_grads, state.opt_state["D_A"], state.params["D_A"]
        )
        da_params = optax.apply_updates(state.params["D_A"], da_up)

        def db_loss_fn(d_params):
            pred_real, _ = apply_mod(D_B, d_params, None, real_b)
            pred_fake, _ = apply_mod(D_B, d_params, None, fake_b_d)
            return (mse(pred_real, 1.0) + mse(pred_fake, 0.0)) / 2

        loss_d_b, db_grads = jax.value_and_grad(db_loss_fn)(state.params["D_B"])
        db_up, db_opt = tx.update(
            db_grads, state.opt_state["D_B"], state.params["D_B"]
        )
        db_params = optax.apply_updates(state.params["D_B"], db_up)

        new_state = state.replace(
            step=state.step + 1,
            params={**g_tree, "D_A": da_params, "D_B": db_params},
            opt_state={"G": g_opt, "D_A": da_opt, "D_B": db_opt},
            rng=rng,
        )
        out = {
            "d_loss": 0.5 * (loss_d_a + loss_d_b),
            "g_loss": g_loss,
            "loss_GAN": loss_gan,
            "loss_pixelwise": loss_pixelwise,
            "loss_cycle": loss_cycle,
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
    """discogan.py:112-122: 16 val pairs -> rows real_A/fake_B/real_B/fake_A
    stacked on the batch axis, nrow=8; eval-mode Gs (dropout off)."""
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    val_loader = make_loader(cfg, split="val", batch_size=16)
    imgdir, _ = out_dirs(cfg)

    @jax.jit
    def translate(params, a_u8, b_u8):
        real_a = normalize_uint8(a_u8)
        real_b = normalize_uint8(b_u8)
        fake_b, _ = apply_mod(G_AB, params["G_AB"], None, real_a, train=False)
        fake_a, _ = apply_mod(G_BA, params["G_BA"], None, real_b, train=False)
        return real_a, fake_b, real_b, fake_a

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        parts = translate(state.params, batch[0], batch[1])
        stacked = jnp.concatenate(parts, axis=0)
        save_image(
            jax.device_get(stacked),
            "%s/%s.png" % (imgdir, batches_done),
            nrow=8, normalize=True,
        )

    return sample


def run(cfg: Config):
    modules = build(cfg)
    state = maybe_resume(create_state(cfg, modules), cfg, MODULES)
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
                    "[D loss: %f] [G loss: %f, adv: %f, pixel: %f, cycle: %f]"
                    % (
                        float(out["d_loss"]), float(out["g_loss"]),
                        float(out["loss_GAN"]), float(out["loss_pixelwise"]),
                        float(out["loss_cycle"]),
                    ),
                )
            if cfg.sample_interval > 0 and batches_done % cfg.sample_interval == 0:
                sample(state, out, batches_done)
        checkpoint_epoch(state, cfg, epoch, MODULES)
    observer.close()
    return state


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
