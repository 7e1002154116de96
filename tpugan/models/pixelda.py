"""PixelDA (Bousmalis et al. 2017) — pixel-level domain adaptation.

Reference: /root/reference/implementations/pixelda/pixelda.py — residual
translator G(img, z) where z enters via a Linear expanded to image-shaped
channels and concatenated (pixelda.py:70-92), a PatchGAN-style D with
InstanceNorm after LeakyReLU (pixelda.py:95-117), and a task Classifier
sharing the same block design with a Softmax head (pixelda.py:120-142).

G and the classifier share ONE Adam (itertools.chain, pixelda.py:204-206)
minimizing lambda_adv*MSE(D(fake_B), 1) + lambda_task*0.5*(CE(clf(fake_B),
y_A) + CE(clf(A), y_A)) (pixelda.py:241-256) — CE on Softmax outputs, the
double-softmax quirk kept (pixelda.py:136,147). D trains on real MNIST-M vs
detached translations (pixelda.py:262-270). The script reports rolling
100-batch classification accuracy on translated A and on B
(pixelda.py:272-303; README.md:583-586 quotes 95% on MNIST->MNIST-M);
accuracies are computed in-jit and the rolling window lives in the log
callback here.
"""

from __future__ import annotations

import dataclasses
import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.data import DeviceLoader, ZipLoader, mnist_or_synthetic, mnistm_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import cross_entropy_on_softmax, mse
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.layers import BatchNorm, Conv, InstanceNorm, Linear, leaky_relu
from tpugan.train.loop import Callbacks, run_training
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "pixelda"
LAMBDA_ADV, LAMBDA_TASK = 1.0, 0.1  # pixelda.py:149-151


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with pixelda.py:22-34.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    n_residual_blocks: int = flag(6, "number of residual blocks in generator")
    latent_dim: int = flag(10, "dimensionality of the noise input")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(3, "number of image channels")
    n_classes: int = flag(10, "number of classes in the dataset")
    sample_interval: int = flag(300, "interval betwen image samples")


class _ResidualBlock(nn.Module):
    """pixelda.py:54-67: Conv-BN-ReLU-Conv-BN with identity skip; default BN
    eps (no 0.8 here), BN scale ~ N(1,0.02) via the all-BatchNorm name match
    (pixelda.py:45-51)."""

    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = Conv(self.features, 3, 1, 1, init_mode="normal02")(x)
        y = BatchNorm(init_mode="normal02")(y, train=train)
        y = nn.relu(y)
        y = Conv(self.features, 3, 1, 1, init_mode="normal02")(y)
        y = BatchNorm(init_mode="normal02")(y, train=train)
        return x + y


class PixelDAGenerator(nn.Module):
    """pixelda.py:70-92."""

    img_size: int
    channels: int
    latent_dim: int
    n_residual_blocks: int

    @nn.compact
    def __call__(self, img, z, train: bool = True):
        # fc is a Linear — NOT matched by this script's init filter -> torch.
        noise_map = Linear(self.channels * self.img_size**2, init_mode="torch")(z)
        from tpugan.nn.layers import unflatten_nchw

        # torch self.fc(z).view(*img.shape) is NCHW order (pixelda.py:87).
        noise_map = unflatten_nchw(
            noise_map, self.channels, self.img_size, self.img_size
        )
        x = jnp.concatenate([img, noise_map], axis=-1)
        x = Conv(64, 3, 1, 1, init_mode="normal02")(x)
        x = nn.relu(x)
        for _ in range(self.n_residual_blocks):
            x = _ResidualBlock()(x, train=train)
        x = Conv(self.channels, 3, 1, 1, init_mode="normal02")(x)
        return jnp.tanh(x)


class _Blocks(nn.Module):
    """Shared conv stack of D and the classifier (pixelda.py:99-110,124-133):
    Conv(3,s2,p1) -> LReLU(0.2) -> [InstanceNorm], filters 64/128/256/512,
    no norm on the first block."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = img
        for i, f in enumerate((64, 128, 256, 512)):
            x = Conv(f, 3, 2, 1, init_mode="normal02")(x)
            x = leaky_relu(x, 0.2)
            if i > 0:
                x = InstanceNorm()(x)
        return x


class PixelDADiscriminator(nn.Module):
    """pixelda.py:95-117: blocks + Conv(512->1, 3,1,1) patch head."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = _Blocks()(img)
        return Conv(1, 3, 1, 1, init_mode="normal02")(x)


class PixelDAClassifier(nn.Module):
    """pixelda.py:120-142: blocks + Linear + Softmax."""

    n_classes: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        from tpugan.nn.layers import flatten_nchw

        x = _Blocks()(img)
        x = flatten_nchw(x)
        x = Linear(self.n_classes, init_mode="torch")(x)
        return jax.nn.softmax(x, axis=-1)


def build(cfg: Config):
    return {
        "generator": PixelDAGenerator(
            img_size=cfg.img_size, channels=cfg.channels,
            latent_dim=cfg.latent_dim,
            n_residual_blocks=cfg.n_residual_blocks,
        ),
        "discriminator": PixelDADiscriminator(),
        "classifier": PixelDAClassifier(n_classes=cfg.n_classes),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_c, k_state = jax.random.split(rng, 4)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, img, z, train=True)
    d_params, _ = init_module(modules["discriminator"], k_d, img)
    c_params, _ = init_module(modules["classifier"], k_c, img)
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    # One optimizer over G U classifier (pixelda.py:204-206).
    g_tree = {"generator": g_params, "classifier": c_params}
    params = {**g_tree, "discriminator": d_params}
    opt_state = {"g": tx.init(g_tree), "discriminator": tx.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"generator": g_bs}
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, D, C = modules["generator"], modules["discriminator"], modules["classifier"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, imgs_a_u8, labels_a, imgs_b_u8, labels_b):
        imgs_a = normalize_uint8(imgs_a_u8)
        imgs_b = normalize_uint8(imgs_b_u8)
        rng, k_z = jax.random.split(state.rng)
        bsz = imgs_a.shape[0]
        z = jax.random.uniform(
            k_z, (bsz, cfg.latent_dim), minval=-1.0, maxval=1.0
        )

        # --- G + classifier phase (pixelda.py:238-256) ---
        def g_loss_fn(g_tree):
            fake_b, g_bs = apply_mod(
                G, g_tree["generator"], state.model_state["generator"],
                imgs_a, z, train=True,
            )
            label_pred, _ = apply_mod(C, g_tree["classifier"], None, fake_b)
            pred_a, _ = apply_mod(C, g_tree["classifier"], None, imgs_a)
            task = (
                cross_entropy_on_softmax(label_pred, labels_a)
                + cross_entropy_on_softmax(pred_a, labels_a)
            ) / 2
            d_out, _ = apply_mod(D, state.params["discriminator"], None, fake_b)
            loss = LAMBDA_ADV * mse(d_out, 1.0) + LAMBDA_TASK * task
            return loss, (fake_b, label_pred, g_bs)

        g_tree = {
            "generator": state.params["generator"],
            "classifier": state.params["classifier"],
        }
        (g_loss, (fake_b, label_pred, g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_tree)
        g_up, g_opt = tx.update(g_grads, state.opt_state["g"], g_tree)
        g_tree = optax.apply_updates(g_tree, g_up)

        # --- D phase (pixelda.py:262-270) ---
        fake_b_d = jax.lax.stop_gradient(fake_b)

        def d_loss_fn(d_params):
            real_out, _ = apply_mod(D, d_params, None, imgs_b)
            fake_out, _ = apply_mod(D, d_params, None, fake_b_d)
            return (mse(real_out, 1.0) + mse(fake_out, 0.0)) / 2

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"]
        )
        d_up, d_opt = tx.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        # --- telemetry (pixelda.py:277-287): pre-update classifier on
        # translated A (label_pred from the G phase) and post-step on B —
        # the reference evaluates clf(imgs_B) after both optimizer steps. ---
        acc = jnp.mean(
            (jnp.argmax(label_pred, axis=1) == labels_a).astype(jnp.float32)
        )
        pred_b, _ = apply_mod(C, g_tree["classifier"], None, imgs_b)
        target_acc = jnp.mean(
            (jnp.argmax(pred_b, axis=1) == labels_b).astype(jnp.float32)
        )

        new_state = state.replace(
            step=state.step + 1,
            params={**g_tree, "discriminator": d_params},
            model_state={"generator": g_bs},
            opt_state={"g": g_opt, "discriminator": d_opt},
            rng=rng,
        )
        out = {
            "d_loss": d_loss, "g_loss": g_loss,
            "acc": acc, "target_acc": target_acc,
            "imgs_a": imgs_a, "fake_b": fake_b, "imgs_b": imgs_b,
        }
        return new_state, out

    return step


def make_loader(cfg: Config, sharding=None) -> ZipLoader:
    ds_a, is_real_a = mnist_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size, channels=1,
        synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    imgs_a = np.repeat(ds_a.images, cfg.channels, axis=-1)  # pixelda.py:230
    ds_b, is_real_b = mnistm_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size,
        synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not (is_real_a and is_real_b):
        print("[tpugan] MNIST/MNIST-M not found on disk — using synthetic data")
    return ZipLoader(
        DeviceLoader([imgs_a, ds_a.labels], cfg.batch_size, shuffle=True,
                     seed=cfg.seed, sharding=sharding),
        DeviceLoader([ds_b.images, ds_b.labels], cfg.batch_size, shuffle=True,
                     seed=cfg.seed + 1, sharding=sharding),
    )


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    from tpugan.parallel import auto_sharding, replicate_for

    sharding = auto_sharding(cfg.batch_size)
    state = replicate_for(sharding, state)
    loader = make_loader(cfg, sharding=sharding)
    step = make_step(cfg, modules)
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)

    # Rolling 100-measurement windows (pixelda.py:216-218,277-287).
    task_performance: list = []
    target_performance: list = []

    def log(epoch, i, bpe, out):
        acc, target_acc = float(out["acc"]), float(out["target_acc"])
        task_performance.append(acc)
        if len(task_performance) > 100:
            task_performance.pop(0)
        target_performance.append(target_acc)
        if len(target_performance) > 100:
            target_performance.pop(0)
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f] "
            "[CLF acc: %3d%% (%3d%%), target_acc: %3d%% (%3d%%)]"
            % (
                epoch, cfg.n_epochs, i, bpe,
                float(out["d_loss"]), float(out["g_loss"]),
                100 * acc, 100 * np.mean(task_performance),
                100 * target_acc, 100 * np.mean(target_performance),
            )
        )

    def sample(state, out, batches_done):
        # pixelda.py:305-308: rows of A / translated / B, 5 samples each.
        grid = jnp.concatenate(
            [out["imgs_a"][:5], out["fake_b"][:5], out["imgs_b"][:5]], axis=1
        )  # vertical concat per column (torch cat dim=-2)
        save_image(
            jax.device_get(grid),
            os.path.join(imgdir, "%d.png" % batches_done),
            nrow=int(math.sqrt(cfg.batch_size)), normalize=True,
        )

    return run_training(
        cfg, loader, state, step,
        Callbacks(log=log, sample=sample),
        n_epochs=cfg.n_epochs,
        sample_interval=cfg.sample_interval,
    )


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
