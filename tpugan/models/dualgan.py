"""DualGAN (Yi et al. 2017).

Reference: /root/reference/implementations/dualgan/dualgan.py + models.py —
two 7-down/6-up U-Nets with affine InstanceNorm and a ConvTranspose final
(models.py:22-94), two BatchNorm(eps 0.8) discriminators with an unpadded
4x4 head after ZeroPad2d((1,0,1,0)) (models.py:102-123), at 128px on paired
split-image data. WGAN-GP per domain (lambda_gp=10, dualgan.py:116-135,
179-194); D trains every batch on freshly generated detached fakes, G every
``n_critic``-th batch with loss -mean(D_A(fake_A)) - mean(D_B(fake_B)) +
10 * cycle L1 (dualgan.py:200-224). Both D optimizers step from one fused
backward (grads computed at the same pre-update params).
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
from tpugan.losses import l1
from tpugan.models._common import apply_mod, init_module
from tpugan.models._im2im_common import (
    StepObserver,
    EtaLogger,
    checkpoint_epoch,
    maybe_resume,
    out_dirs,
)
from tpugan.nn.im2im import PatchGAN, UNetDown, UNetUp
from tpugan.nn.layers import ConvTranspose
from tpugan.ops.penalty import wgan_gp_penalty
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "dualgan"
MODULES = ("G_AB", "G_BA", "D_A", "D_B")
LAMBDA_ADV, LAMBDA_CYCLE, LAMBDA_GP = 1.0, 10.0, 10.0  # dualgan.py:56-58


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with dualgan.py:28-41.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(8, "size of the batches")
    dataset_name: str = flag("edges2shoes", "name of the dataset")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_size: int = flag(128, "size of each image dimension")
    channels: int = flag(3, "number of image channels")
    n_critic: int = flag(5, "number of training steps for discriminator per iter")
    sample_interval: int = flag(200, "interval betwen image samples")
    checkpoint_interval: int = flag(-1, "interval between model checkpoints")


class DualGenerator(nn.Module):
    """models.py:57-94: 7-down/6-up, affine IN, ConvTranspose final."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(affine=True, init_mode="normal02")
        d1 = UNetDown(64, normalize=False, **kw)(x, train)
        d2 = UNetDown(128, **kw)(d1, train)
        d3 = UNetDown(256, **kw)(d2, train)
        d4 = UNetDown(512, dropout=0.5, **kw)(d3, train)
        d5 = UNetDown(512, dropout=0.5, **kw)(d4, train)
        d6 = UNetDown(512, dropout=0.5, **kw)(d5, train)
        d7 = UNetDown(512, dropout=0.5, normalize=False, **kw)(d6, train)
        u1 = UNetUp(512, dropout=0.5, **kw)(d7, d6, train)
        u2 = UNetUp(512, dropout=0.5, **kw)(u1, d5, train)
        u3 = UNetUp(512, dropout=0.5, **kw)(u2, d4, train)
        u4 = UNetUp(256, **kw)(u3, d3, train)
        u5 = UNetUp(128, **kw)(u4, d2, train)
        u6 = UNetUp(64, **kw)(u5, d1, train)
        y = ConvTranspose(self.channels, 4, 2, 1, init_mode="normal02")(u6)
        return jnp.tanh(y)


def build(cfg: Config):
    g = lambda: DualGenerator(channels=cfg.channels)
    d = lambda: PatchGAN(
        filters=(64, 128, 256), norm="batch08", head_bias=True,
        head_padding=0, init_mode="normal02",
    )
    return {"G_AB": g(), "G_BA": g(), "D_A": d(), "D_B": d()}


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, 5)
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    params, model_state = {}, {}
    for k, name in zip(keys[:4], MODULES):
        p, bs = init_module(modules[name], k, img, train=True)
        params[name] = p
        model_state[name] = bs
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    g_tree = {"G_AB": params["G_AB"], "G_BA": params["G_BA"]}
    opt_state = {
        "G": tx.init(g_tree),
        "D_A": tx.init(params["D_A"]),
        "D_B": tx.init(params["D_B"]),
    }
    return TrainState.create(
        params, opt_state, keys[4], model_state=model_state
    )


def make_steps(cfg: Config, modules=None):
    """(d_step, g_step): D trains every batch, G every n_critic batches
    (dualgan.py:158-224) — driven by the host loop."""
    modules = modules or build(cfg)
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    D_A, D_B = modules["D_A"], modules["D_B"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def d_step(state: TrainState, a_u8, b_u8):
        imgs_a = normalize_uint8(a_u8)
        imgs_b = normalize_uint8(b_u8)
        rng, k1, k2, kgp_a, kgp_b = jax.random.split(state.rng, 5)

        fake_a_raw, _ = apply_mod(
            G_BA, state.params["G_BA"], None, imgs_b, train=True, dropout_rng=k1
        )
        fake_b_raw, _ = apply_mod(
            G_AB, state.params["G_AB"], None, imgs_a, train=True, dropout_rng=k2
        )
        fake_a = jax.lax.stop_gradient(fake_a_raw)
        fake_b = jax.lax.stop_gradient(fake_b_raw)

        def d_loss_fn(d_tree):
            # BatchNorm stats threaded per reference call order: GP interp
            # forward, then real, then fake (dualgan.py:180-191).
            def apply_da(x, bs):
                return apply_mod(D_A, d_tree["D_A"], bs, x, train=True)

            def apply_db(x, bs):
                return apply_mod(D_B, d_tree["D_B"], bs, x, train=True)

            gp_a = wgan_gp_penalty(
                lambda x: apply_da(x, state.model_state["D_A"])[0],
                imgs_a, fake_a, kgp_a,
            )
            da_real, bs_a1 = apply_da(imgs_a, state.model_state["D_A"])
            da_fake, bs_a2 = apply_da(fake_a, bs_a1)
            loss_a = -jnp.mean(da_real) + jnp.mean(da_fake) + LAMBDA_GP * gp_a

            gp_b = wgan_gp_penalty(
                lambda x: apply_db(x, state.model_state["D_B"])[0],
                imgs_b, fake_b, kgp_b,
            )
            db_real, bs_b1 = apply_db(imgs_b, state.model_state["D_B"])
            db_fake, bs_b2 = apply_db(fake_b, bs_b1)
            loss_b = -jnp.mean(db_real) + jnp.mean(db_fake) + LAMBDA_GP * gp_b
            return loss_a + loss_b, (bs_a2, bs_b2)

        d_tree = {"D_A": state.params["D_A"], "D_B": state.params["D_B"]}
        (d_loss, (bs_a, bs_b)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_tree)
        da_up, da_opt = tx.update(
            d_grads["D_A"], state.opt_state["D_A"], state.params["D_A"]
        )
        db_up, db_opt = tx.update(
            d_grads["D_B"], state.opt_state["D_B"], state.params["D_B"]
        )
        new_params = dict(state.params)
        new_params["D_A"] = optax.apply_updates(state.params["D_A"], da_up)
        new_params["D_B"] = optax.apply_updates(state.params["D_B"], db_up)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state={**state.model_state, "D_A": bs_a, "D_B": bs_b},
            opt_state={**state.opt_state, "D_A": da_opt, "D_B": db_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss}

    def g_step(state: TrainState, a_u8, b_u8):
        imgs_a = normalize_uint8(a_u8)
        imgs_b = normalize_uint8(b_u8)
        rng, k1, k2, k3, k4 = jax.random.split(state.rng, 5)

        def g_loss_fn(g_tree):
            fake_a, _ = apply_mod(
                G_BA, g_tree["G_BA"], None, imgs_b, train=True, dropout_rng=k1
            )
            fake_b, _ = apply_mod(
                G_AB, g_tree["G_AB"], None, imgs_a, train=True, dropout_rng=k2
            )
            recov_a, _ = apply_mod(
                G_BA, g_tree["G_BA"], None, fake_b, train=True, dropout_rng=k3
            )
            recov_b, _ = apply_mod(
                G_AB, g_tree["G_AB"], None, fake_a, train=True, dropout_rng=k4
            )
            da_out, bs_a = apply_mod(
                D_A, state.params["D_A"], state.model_state["D_A"], fake_a,
                train=True,
            )
            db_out, bs_b = apply_mod(
                D_B, state.params["D_B"], state.model_state["D_B"], fake_b,
                train=True,
            )
            g_adv = -jnp.mean(da_out) - jnp.mean(db_out)
            g_cycle = l1(recov_a, imgs_a) + l1(recov_b, imgs_b)
            loss = LAMBDA_ADV * g_adv + LAMBDA_CYCLE * g_cycle
            return loss, (g_adv, g_cycle, bs_a, bs_b)

        g_tree = {"G_AB": state.params["G_AB"], "G_BA": state.params["G_BA"]}
        (g_loss, (g_adv, g_cycle, bs_a, bs_b)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_tree)
        g_up, g_opt = tx.update(g_grads, state.opt_state["G"], g_tree)
        g_tree = optax.apply_updates(g_tree, g_up)
        new_state = state.replace(
            params={**state.params, **g_tree},
            model_state={**state.model_state, "D_A": bs_a, "D_B": bs_b},
            opt_state={**state.opt_state, "G": g_opt},
            rng=rng,
        )
        return new_state, {"g_adv": g_adv, "g_cycle": g_cycle, "g_loss": g_loss}

    return d_step, g_step


def make_loader(cfg: Config, split="train", batch_size=None, sharding=None):
    a, b, is_real = paired_or_synthetic(
        cfg.data_dir, cfg.dataset_name, cfg.img_size, cfg.img_size,
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
    """dualgan.py:138-148: 16 val pairs -> per-sample vertical stacks AB and
    BA concatenated on batch axis, nrow=8; train-mode Gs (no eval switch)."""
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    val_loader = make_loader(cfg, split="val", batch_size=16)
    imgdir, _ = out_dirs(cfg)

    @jax.jit
    def translate(params, a_u8, b_u8, rng):
        k1, k2 = jax.random.split(rng)
        real_a = normalize_uint8(a_u8)
        real_b = normalize_uint8(b_u8)
        fake_b, _ = apply_mod(
            G_AB, params["G_AB"], None, real_a, train=True, dropout_rng=k1
        )
        fake_a, _ = apply_mod(
            G_BA, params["G_BA"], None, real_b, train=True, dropout_rng=k2
        )
        ab = jnp.concatenate([real_a, fake_b], axis=1)
        ba = jnp.concatenate([real_b, fake_a], axis=1)
        return jnp.concatenate([ab, ba], axis=0)

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        rng = jax.random.fold_in(state.rng, batches_done)
        grid = translate(state.params, batch[0], batch[1], rng)
        save_image(
            jax.device_get(grid),
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
    d_step, g_step = make_steps(cfg, modules)
    d_step = jax.jit(d_step)
    g_step = jax.jit(g_step)
    sample = make_sampler(cfg, modules)
    eta = EtaLogger(cfg.n_epochs)

    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    batches_done = cfg.epoch * bpe
    g_out = {"g_adv": float("nan"), "g_cycle": float("nan")}
    for epoch in range(cfg.epoch, cfg.n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            state, out = d_step(state, *batch)
            if i % cfg.n_critic != 0:
                observer.observe(batches_done, out)
            else:
                state, g_out = g_step(state, *batch)
                observer.observe(batches_done, {**out, **g_out})
                if cfg.log_interval > 0:
                    eta.line(
                        epoch, i, bpe,
                        "[D loss: %f] [G loss: %f, cycle: %f]"
                        % (
                            float(out["d_loss"]), float(g_out["g_adv"]),
                            float(g_out["g_cycle"]),
                        ),
                    )
            if cfg.sample_interval > 0 and batches_done % cfg.sample_interval == 0:
                sample(state, out, batches_done)
            batches_done += 1
        checkpoint_epoch(state, cfg, epoch, MODULES)
    observer.close()
    return state


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
