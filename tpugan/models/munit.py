"""MUNIT (Huang et al. 2018) — multimodal unsupervised translation.

Reference: /root/reference/implementations/munit/munit.py + models.py — per
domain an Encoder (content + style, models.py:33-42) and an AdaIN Decoder
(models.py:50-105) plus a 3-scale MultiDiscriminator (models.py:197-235),
at 128px on the paired-file layout (used as two unaligned-ish domains via
the A|B split; munit's ImageDataset is the paired split loader).

G loss (munit.py:185-232): multi-scale MSE adv + 10*L1 image identity +
1*L1 style recon (vs the SAMPLED style) + 1*L1 content recon (vs detached
encoder content) (+0*cycle — disabled by default, lambda_cyc=0,
munit.py:93,202-203 — not computed here either). One Adam over
Enc1/Dec1/Enc2/Dec2; per-D Adams; LambdaLR decay. Style codes ~ N(0,1)
(B, style_dim) (munit.py:178-179, shape (B,S,1,1) in torch — flattened
here; the MLP flattens regardless, models.py:189). Checkpoints
Enc1/Dec1/Enc2/Dec2/D1/D2_<E>.pth (munit.py:283-288).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import joint_hflip_transform, paired_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import l1
from tpugan.models._common import apply_mod, init_module
from tpugan.models._im2im_common import (
    StepObserver,
    EtaLogger,
    checkpoint_epoch,
    maybe_resume,
    out_dirs,
)
from tpugan.nn.style import (
    ContentEncoder,
    MultiDiscriminator,
    MunitDecoder,
    StyleEncoder,
    multi_d_loss,
)
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch, linear_decay_schedule
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

import flax.linen as nn

NAME = "munit"
MODULES = ("Enc1", "Dec1", "Enc2", "Dec2", "D1", "D2")
LAMBDA_GAN, LAMBDA_ID, LAMBDA_STYLE, LAMBDA_CONT = 1.0, 10.0, 1.0, 1.0


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with munit.py:24-43.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("edges2shoes", "name of the dataset")
    batch_size: int = flag(1, "size of the batches")
    lr: float = flag(0.0001, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(128, "size of image height")
    img_width: int = flag(128, "size of image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(400, "interval saving generator samples")
    checkpoint_interval: int = flag(-1, "interval between saving model checkpoints")
    n_downsample: int = flag(2, "number downsampling layers in encoder")
    n_residual: int = flag(3, "number of residual blocks in encoder / decoder")
    dim: int = flag(64, "number of filters in first encoder layer")
    style_dim: int = flag(8, "dimensionality of the style code")


class MunitEncoder(nn.Module):
    """models.py:33-42: (content_code, style_code)."""

    dim: int
    n_residual: int
    n_downsample: int
    style_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        content = ContentEncoder(
            dim=self.dim, n_residual=self.n_residual,
            n_downsample=self.n_downsample,
        )(x)
        style = StyleEncoder(
            dim=self.dim, n_downsample=self.n_downsample,
            style_dim=self.style_dim,
        )(x)
        return content, style


def build(cfg: Config):
    enc = lambda: MunitEncoder(
        dim=cfg.dim, n_residual=cfg.n_residual,
        n_downsample=cfg.n_downsample, style_dim=cfg.style_dim,
    )
    dec = lambda: MunitDecoder(
        out_channels=cfg.channels, dim=cfg.dim, n_residual=cfg.n_residual,
        n_upsample=cfg.n_downsample, style_dim=cfg.style_dim,
    )
    return {
        "Enc1": enc(), "Dec1": dec(), "Enc2": enc(), "Dec2": dec(),
        "D1": MultiDiscriminator(), "D2": MultiDiscriminator(),
    }


def create_state(cfg: Config, modules=None, steps_per_epoch: int = 1) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, 7)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    content = jnp.zeros(
        (
            1,
            cfg.img_height // 2**cfg.n_downsample,
            cfg.img_width // 2**cfg.n_downsample,
            cfg.dim * 2**cfg.n_downsample,
        ),
        jnp.float32,
    )
    style = jnp.zeros((1, cfg.style_dim), jnp.float32)
    params = {}
    for k, name in zip(keys[:6], MODULES):
        if name.startswith("Dec"):
            p, _ = init_module(modules[name], k, content, style)
        else:
            p, _ = init_module(modules[name], k, img)
        params[name] = p
    sched = linear_decay_schedule(
        cfg.lr, cfg.n_epochs, cfg.decay_epoch, steps_per_epoch, offset=cfg.epoch
    )
    tx = adam_torch(sched, cfg.b1, cfg.b2)
    g_names = ("Enc1", "Dec1", "Enc2", "Dec2")
    g_tree = {n: params[n] for n in g_names}
    opt_state = {
        "G": tx.init(g_tree),
        "D1": tx.init(params["D1"]),
        "D2": tx.init(params["D2"]),
    }
    return TrainState.create(params, opt_state, keys[6])


def make_step(cfg: Config, modules=None, steps_per_epoch: int = 1):
    modules = modules or build(cfg)
    sched = linear_decay_schedule(
        cfg.lr, cfg.n_epochs, cfg.decay_epoch, steps_per_epoch, offset=cfg.epoch
    )
    tx = adam_torch(sched, cfg.b1, cfg.b2)
    Enc1, Dec1 = modules["Enc1"], modules["Dec1"]
    Enc2, Dec2 = modules["Enc2"], modules["Dec2"]
    D1, D2 = modules["D1"], modules["D2"]
    g_names = ("Enc1", "Dec1", "Enc2", "Dec2")

    def step(state: TrainState, a_u8, b_u8):
        x1 = normalize_uint8(a_u8)
        x2 = normalize_uint8(b_u8)
        rng, k_s1, k_s2 = jax.random.split(state.rng, 3)
        style_1 = jax.random.normal(k_s1, (x1.shape[0], cfg.style_dim))
        style_2 = jax.random.normal(k_s2, (x1.shape[0], cfg.style_dim))

        # --- G phase (munit.py:185-232) ---
        def g_loss_fn(g_tree):
            (c1, s1), _ = apply_mod(Enc1, g_tree["Enc1"], None, x1)
            (c2, s2), _ = apply_mod(Enc2, g_tree["Enc2"], None, x2)
            x11, _ = apply_mod(Dec1, g_tree["Dec1"], None, c1, s1)
            x22, _ = apply_mod(Dec2, g_tree["Dec2"], None, c2, s2)
            x21, _ = apply_mod(Dec1, g_tree["Dec1"], None, c2, style_1)
            x12, _ = apply_mod(Dec2, g_tree["Dec2"], None, c1, style_2)
            (c21, s21), _ = apply_mod(Enc1, g_tree["Enc1"], None, x21)
            (c12, s12), _ = apply_mod(Enc2, g_tree["Enc2"], None, x12)

            d1_outs, _ = apply_mod(D1, state.params["D1"], None, x21)
            d2_outs, _ = apply_mod(D2, state.params["D2"], None, x12)
            loss = (
                LAMBDA_GAN * multi_d_loss(d1_outs, 1.0)
                + LAMBDA_GAN * multi_d_loss(d2_outs, 1.0)
                + LAMBDA_ID * l1(x11, x1)
                + LAMBDA_ID * l1(x22, x2)
                + LAMBDA_STYLE * l1(s21, style_1)
                + LAMBDA_STYLE * l1(s12, style_2)
                + LAMBDA_CONT * l1(c12, jax.lax.stop_gradient(c1))
                + LAMBDA_CONT * l1(c21, jax.lax.stop_gradient(c2))
            )
            return loss, (x21, x12)

        g_tree = {n: state.params[n] for n in g_names}
        (g_loss, (x21, x12)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_tree)
        g_up, g_opt = tx.update(g_grads, state.opt_state["G"], g_tree)
        g_tree = optax.apply_updates(g_tree, g_up)

        x21_d = jax.lax.stop_gradient(x21)
        x12_d = jax.lax.stop_gradient(x12)

        # --- D phases (munit.py:238-254) ---
        def d1_loss_fn(d_params):
            real_outs, _ = apply_mod(D1, d_params, None, x1)
            fake_outs, _ = apply_mod(D1, d_params, None, x21_d)
            return multi_d_loss(real_outs, 1.0) + multi_d_loss(fake_outs, 0.0)

        loss_d1, d1_grads = jax.value_and_grad(d1_loss_fn)(state.params["D1"])
        d1_up, d1_opt = tx.update(
            d1_grads, state.opt_state["D1"], state.params["D1"]
        )
        d1_params = optax.apply_updates(state.params["D1"], d1_up)

        def d2_loss_fn(d_params):
            real_outs, _ = apply_mod(D2, d_params, None, x2)
            fake_outs, _ = apply_mod(D2, d_params, None, x12_d)
            return multi_d_loss(real_outs, 1.0) + multi_d_loss(fake_outs, 0.0)

        loss_d2, d2_grads = jax.value_and_grad(d2_loss_fn)(state.params["D2"])
        d2_up, d2_opt = tx.update(
            d2_grads, state.opt_state["D2"], state.params["D2"]
        )
        d2_params = optax.apply_updates(state.params["D2"], d2_up)

        new_state = state.replace(
            step=state.step + 1,
            params={**g_tree, "D1": d1_params, "D2": d2_params},
            opt_state={"G": g_opt, "D1": d1_opt, "D2": d2_opt},
            rng=rng,
        )
        out = {"d_loss": loss_d1 + loss_d2, "g_loss": g_loss}
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
    """munit.py:139-158: per val-A image, a row [original | style_dim
    translations with U(-1,1) style codes], rows stacked vertically."""
    Enc1, Dec2 = modules["Enc1"], modules["Dec2"]
    val_loader = make_loader(cfg, split="val", batch_size=5)
    imgdir, _ = out_dirs(cfg)
    s = cfg.style_dim

    @jax.jit
    def translate(params, a_u8, rng):
        # ONE batched Enc/Dec application over all n*s translations
        # (munit.py:143-157 loops per image — same values, smaller graph).
        x = normalize_uint8(a_u8)
        n = x.shape[0]
        rep = jnp.repeat(x, s, axis=0)
        s_code = jax.random.uniform(
            rng, (n * s, s), minval=-1.0, maxval=1.0
        )
        (c1, _), _ = apply_mod(Enc1, params["Enc1"], None, rep)
        x12, _ = apply_mod(Dec2, params["Dec2"], None, c1, s_code)
        x12 = x12.reshape(n, s, *x12.shape[1:])
        rows = jnp.concatenate(
            [x[:, None], *(x12[:, j : j + 1] for j in range(s))], axis=1
        )
        rows = jnp.concatenate([rows[:, k] for k in range(s + 1)], axis=2)
        return jnp.concatenate([rows[k] for k in range(n)], axis=0)

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        rng = jax.random.fold_in(state.rng, batches_done)
        sheet = translate(state.params, batch[0], rng)
        save_image(
            jax.device_get(sheet)[None],
            "%s/%s.png" % (imgdir, batches_done),
            nrow=1, normalize=True,
        )

    return sample


def run(cfg: Config):
    modules = build(cfg)
    sharding = auto_sharding(cfg.batch_size)
    loader = make_loader(cfg, sharding=sharding)
    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    state = maybe_resume(
        create_state(cfg, modules, steps_per_epoch=bpe), cfg, MODULES
    )
    state = replicate_for(sharding, state)
    observer = StepObserver(cfg)
    step = jax.jit(make_step(cfg, modules, steps_per_epoch=bpe), donate_argnums=0)
    sample = make_sampler(cfg, modules)
    eta = EtaLogger(cfg.n_epochs)

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
                    "[D loss: %f] [G loss: %f]"
                    % (float(out["d_loss"]), float(out["g_loss"])),
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
