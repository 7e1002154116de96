"""UNIT (Liu et al. 2017) — unsupervised image-to-image translation with a
shared latent space.

Reference: /root/reference/implementations/unit/unit.py + models.py — two
Encoders (ReflectionPad c7 + 2x down + 3 residual + SHARED residual block,
models.py:53-90) and two Generators (SHARED residual block + 3 residual +
2x up + c7, models.py:93-122) with VAE reparameterization z = mu + N(0,1)
(models.py:81-84); two 4-down PatchGAN Ds with a plain 3x3 head — no
ZeroPad trick here (models.py:145-151). Weight sharing: ``shared_E`` /
``shared_G`` residual blocks are single modules referenced by both domains
(unit.py:60-65) — carried here as their own param entries applied inside
both encoders/generators.

Loss (unit.py:96-101,189-236): 10*MSE GAN + 0.1*KL(mean mu^2) on encoded +
100*L1 identity + 0.1*KL on cycle-encoded + 100*L1 cycle, one Adam over
E1 U E2 U G1 U G2; per-D Adams; LambdaLR decay from --decay_epoch.
Checkpoints E1/E2/G1/G2/D1/D2_<E>.pth (+ shared_E/shared_G, an addition —
the reference stores shared params duplicated inside E1/E2 state dicts).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import UnpairedLoader
from tpugan.data.im2im import (
    resize_crop_flip_transform,
    unpaired_or_synthetic,
)
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
from tpugan.nn.im2im import ResidualBlockIN, reflection_pad
from tpugan.nn.layers import Conv, ConvTranspose, InstanceNorm, leaky_relu
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch, linear_decay_schedule
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "unit"
MODULES = ("shared_E", "E1", "E2", "shared_G", "G1", "G2", "D1", "D2")
# unit.py:96-101
L0, L1_KL, L2_ID, L3_KL, L4_CYC = 10.0, 0.1, 100.0, 0.1, 100.0


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with unit.py:24-41.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("apple2orange", "name of the dataset")
    batch_size: int = flag(1, "size of the batches")
    lr: float = flag(0.0001, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(256, "size of image height")
    img_width: int = flag(256, "size of image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(100, "interval between saving generator samples")
    checkpoint_interval: int = flag(-1, "interval between saving model checkpoints")
    n_downsample: int = flag(2, "number downsampling layers in encoder")
    dim: int = flag(64, "number of filters in first encoder layer")


class UnitEncoderTrunk(nn.Module):
    """models.py:53-78 without the shared block: c7 + n_down stride-2 +
    3 residual."""

    channels: int
    dim: int
    n_downsample: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        y = reflection_pad(x, 3)
        y = Conv(self.dim, 7, 1, 0, init_mode="normal02")(y)
        y = InstanceNorm()(y)
        y = leaky_relu(y, 0.2)
        d = self.dim
        for _ in range(self.n_downsample):
            d *= 2
            y = Conv(d, 4, 2, 1, init_mode="normal02")(y)
            y = InstanceNorm()(y)
            y = nn.relu(y)
        for _ in range(3):
            y = ResidualBlockIN(d, init_mode="normal02")(y)
        return y


class UnitGeneratorTrunk(nn.Module):
    """models.py:93-122 after the shared block: 3 residual + n_up up + c7."""

    out_channels: int
    dim: int
    n_upsample: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        d = self.dim * 2**self.n_upsample
        y = x
        for _ in range(3):
            y = ResidualBlockIN(d, init_mode="normal02")(y)
        for _ in range(self.n_upsample):
            d //= 2
            y = ConvTranspose(d, 4, 2, 1, init_mode="normal02")(y)
            y = InstanceNorm()(y)
            y = leaky_relu(y, 0.2)
        y = reflection_pad(y, 3)
        y = Conv(self.out_channels, 7, 1, 0, init_mode="normal02")(y)
        return jnp.tanh(y)


class UnitDiscriminator(nn.Module):
    """models.py:130-154: 4 stride-2 blocks + plain Conv(512->1, 3, p1)."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = img
        for i, f in enumerate((64, 128, 256, 512)):
            x = Conv(f, 4, 2, 1, init_mode="normal02")(x)
            if i > 0:
                x = InstanceNorm()(x)
            x = leaky_relu(x, 0.2)
        return Conv(1, 3, 1, 1, init_mode="normal02")(x)


def build(cfg: Config):
    shared_dim = cfg.dim * 2**cfg.n_downsample
    return {
        "shared_E": ResidualBlockIN(shared_dim, init_mode="normal02"),
        "shared_G": ResidualBlockIN(shared_dim, init_mode="normal02"),
        "E1": UnitEncoderTrunk(cfg.channels, cfg.dim, cfg.n_downsample),
        "E2": UnitEncoderTrunk(cfg.channels, cfg.dim, cfg.n_downsample),
        "G1": UnitGeneratorTrunk(cfg.channels, cfg.dim, cfg.n_downsample),
        "G2": UnitGeneratorTrunk(cfg.channels, cfg.dim, cfg.n_downsample),
        "D1": UnitDiscriminator(),
        "D2": UnitDiscriminator(),
    }


def create_state(cfg: Config, modules=None, steps_per_epoch: int = 1) -> TrainState:
    modules = modules or build(cfg)
    shared_dim = cfg.dim * 2**cfg.n_downsample
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, 9)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    feat = jnp.zeros(
        (
            1,
            cfg.img_height // 2**cfg.n_downsample,
            cfg.img_width // 2**cfg.n_downsample,
            shared_dim,
        ),
        jnp.float32,
    )
    params = {}
    for k, name in zip(keys[:8], MODULES):
        arg = img if name in ("E1", "E2", "D1", "D2") else feat
        p, _ = init_module(modules[name], k, arg)
        params[name] = p
    sched = linear_decay_schedule(
        cfg.lr, cfg.n_epochs, cfg.decay_epoch, steps_per_epoch, offset=cfg.epoch
    )
    tx = adam_torch(sched, cfg.b1, cfg.b2)
    ge_names = ("shared_E", "E1", "E2", "shared_G", "G1", "G2")
    ge_tree = {n: params[n] for n in ge_names}
    opt_state = {
        "G": tx.init(ge_tree),
        "D1": tx.init(params["D1"]),
        "D2": tx.init(params["D2"]),
    }
    return TrainState.create(params, opt_state, keys[8])


def _encode(modules, params, which, x, rng):
    """E_i: trunk -> shared block -> mu; z = mu + N(0,1) (models.py:81-90)."""
    trunk, _ = apply_mod(modules[which], params[which], None, x)
    mu, _ = apply_mod(modules["shared_E"], params["shared_E"], None, trunk)
    z = mu + jax.random.normal(rng, mu.shape)
    return mu, z


def _generate(modules, params, which, z):
    """G_i: shared block -> trunk (models.py:119-122)."""
    h, _ = apply_mod(modules["shared_G"], params["shared_G"], None, z)
    out, _ = apply_mod(modules[which], params[which], None, h)
    return out


def make_step(cfg: Config, modules=None, steps_per_epoch: int = 1):
    modules = modules or build(cfg)
    sched = linear_decay_schedule(
        cfg.lr, cfg.n_epochs, cfg.decay_epoch, steps_per_epoch, offset=cfg.epoch
    )
    tx = adam_torch(sched, cfg.b1, cfg.b2)
    D1, D2 = modules["D1"], modules["D2"]
    ge_names = ("shared_E", "E1", "E2", "shared_G", "G1", "G2")

    def step(state: TrainState, a_u8, b_u8):
        x1 = normalize_uint8(a_u8)
        x2 = normalize_uint8(b_u8)
        rng, k1, k2, k3, k4 = jax.random.split(state.rng, 5)

        # --- E+G phase (unit.py:189-236) ---
        def g_loss_fn(ge_tree):
            p = {**state.params, **ge_tree}
            mu1, z1 = _encode(modules, p, "E1", x1, k1)
            mu2, z2 = _encode(modules, p, "E2", x2, k2)
            recon_x1 = _generate(modules, p, "G1", z1)
            recon_x2 = _generate(modules, p, "G2", z2)
            fake_x1 = _generate(modules, p, "G1", z2)
            fake_x2 = _generate(modules, p, "G2", z1)
            mu1_, z1_ = _encode(modules, p, "E1", fake_x1, k3)
            mu2_, z2_ = _encode(modules, p, "E2", fake_x2, k4)
            cycle_x1 = _generate(modules, p, "G1", z2_)
            cycle_x2 = _generate(modules, p, "G2", z1_)

            d1_out, _ = apply_mod(D1, state.params["D1"], None, fake_x1)
            d2_out, _ = apply_mod(D2, state.params["D2"], None, fake_x2)
            loss = (
                L0 * mse(d1_out, 1.0)
                + L0 * mse(d2_out, 1.0)
                + L1_KL * jnp.mean(mu1**2)
                + L1_KL * jnp.mean(mu2**2)
                + L2_ID * l1(recon_x1, x1)
                + L2_ID * l1(recon_x2, x2)
                + L3_KL * jnp.mean(mu1_**2)
                + L3_KL * jnp.mean(mu2_**2)
                + L4_CYC * l1(cycle_x1, x1)
                + L4_CYC * l1(cycle_x2, x2)
            )
            return loss, (fake_x1, fake_x2)

        ge_tree = {n: state.params[n] for n in ge_names}
        (g_loss, (fake_x1, fake_x2)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(ge_tree)
        g_up, g_opt = tx.update(g_grads, state.opt_state["G"], ge_tree)
        ge_tree = optax.apply_updates(ge_tree, g_up)

        fake_x1_d = jax.lax.stop_gradient(fake_x1)
        fake_x2_d = jax.lax.stop_gradient(fake_x2)

        # --- D phases (unit.py:242-258) ---
        def d1_loss_fn(d_params):
            real_out, _ = apply_mod(D1, d_params, None, x1)
            fake_out, _ = apply_mod(D1, d_params, None, fake_x1_d)
            return mse(real_out, 1.0) + mse(fake_out, 0.0)

        loss_d1, d1_grads = jax.value_and_grad(d1_loss_fn)(state.params["D1"])
        d1_up, d1_opt = tx.update(
            d1_grads, state.opt_state["D1"], state.params["D1"]
        )
        d1_params = optax.apply_updates(state.params["D1"], d1_up)

        def d2_loss_fn(d_params):
            real_out, _ = apply_mod(D2, d_params, None, x2)
            fake_out, _ = apply_mod(D2, d_params, None, fake_x2_d)
            return mse(real_out, 1.0) + mse(fake_out, 0.0)

        loss_d2, d2_grads = jax.value_and_grad(d2_loss_fn)(state.params["D2"])
        d2_up, d2_opt = tx.update(
            d2_grads, state.opt_state["D2"], state.params["D2"]
        )
        d2_params = optax.apply_updates(state.params["D2"], d2_up)

        new_state = state.replace(
            step=state.step + 1,
            params={**ge_tree, "D1": d1_params, "D2": d2_params},
            opt_state={"G": g_opt, "D1": d1_opt, "D2": d2_opt},
            rng=rng,
        )
        out = {"d_loss": loss_d1 + loss_d2, "g_loss": g_loss}
        return new_state, out

    return step


def make_loader(cfg: Config, split="train", batch_size=None, sharding=None):
    a, b, is_real = unpaired_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.img_height, cfg.img_width,
        split=split, synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not is_real and split == "train":
        print(
            "[tpugan] dataset %r not found on disk — using synthetic domains"
            % cfg.dataset_name
        )
    # Jitter on the train split only (the reference applies the same
    # transforms_ to both, unit.py:126-147, but its test sheets come from
    # PIL-cropped val files; plain resized images here match the intent of
    # a test sheet — deviation documented).
    transform = (
        resize_crop_flip_transform(
            cfg.seed, cfg.img_height, cfg.img_width, indices=(0, 1)
        )
        if split == "train"
        else None
    )
    return UnpairedLoader(
        a, b,
        batch_size or cfg.batch_size,
        seed=cfg.seed if split == "train" else cfg.seed + 991,
        sharding=sharding,
        host_transform=transform,
    )


def make_sampler(cfg: Config, modules):
    """unit.py:150-160: X1 / fake_X2 / X2 / fake_X1 on the batch axis,
    nrow=5, from the test split."""
    val_loader = make_loader(cfg, split="test", batch_size=5)
    imgdir, _ = out_dirs(cfg)

    @jax.jit
    def translate(params, a_u8, b_u8, rng):
        k1, k2 = jax.random.split(rng)
        x1 = normalize_uint8(a_u8)
        x2 = normalize_uint8(b_u8)
        _, z1 = _encode(modules, params, "E1", x1, k1)
        _, z2 = _encode(modules, params, "E2", x2, k2)
        fake_x1 = _generate(modules, params, "G1", z2)
        fake_x2 = _generate(modules, params, "G2", z1)
        return jnp.concatenate([x1, fake_x2, x2, fake_x1], axis=0)

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        rng = jax.random.fold_in(state.rng, batches_done)
        grid = translate(state.params, batch[0], batch[1], rng)
        save_image(
            jax.device_get(grid),
            "%s/%s.png" % (imgdir, batches_done),
            nrow=5, normalize=True,
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
