"""BicycleGAN (Zhu et al. 2017) — multimodal paired translation.

Reference: /root/reference/implementations/bicyclegan/bicyclegan.py +
models.py — U-Net G(img, z) with z injected as a Linear-projected extra
channel (models.py:52-94; 3x3 stride-2 downs with BatchNorm eps 0.8),
ResNet18-based VAE Encoder (random init, models.py:102-118), and two
3-scale MultiDiscriminators with BatchNorm(0.8) towers (models.py:126-165).

Two-phase update parity (bicyclegan.py:152-199): one backward of
loss_GE = cVAE adv + cLR adv + 10*pixel + 0.01*KL steps the ENCODER;
the generator then steps on the ACCUMULATED grad_G(loss_GE) +
grad_G(0.5*L1(enc_new(_fake_B).mu, sampled_z)) where the latent loss's
encoder forward uses the freshly UPDATED encoder params — reproduced
exactly below. D_VAE/D_LR train on real_B vs the respective detached fakes.

Reference quirk (fixed, SURVEY.md §5 item 4): MultiDiscriminator's
``nn.AvgPool2d(in_channels, ...)`` references an undefined name
(models.py:153, NameError as written); the sibling munit implementation
passes its channel count (3) as the kernel — the same working behavior
(AvgPool k3 s2 p1 count_include_pad=False) is used here.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader
from tpugan.data.im2im import paired_or_synthetic
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
from tpugan.nn.layers import BatchNorm, Conv, Linear, Upsample, leaky_relu
from tpugan.nn.resnet import ResNet18Trunk
from tpugan.ops.image import avg_pool
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "bicyclegan"
MODULES = ("generator", "encoder", "D_VAE", "D_LR")


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with bicyclegan.py:24-41.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("edges2shoes", "name of the dataset")
    batch_size: int = flag(8, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(128, "size of image height")
    img_width: int = flag(128, "size of image width")
    channels: int = flag(3, "number of image channels")
    latent_dim: int = flag(8, "number of latent codes")
    sample_interval: int = flag(400, "interval between saving generator samples")
    checkpoint_interval: int = flag(-1, "interval between model checkpoints")
    lambda_pixel: float = flag(10.0, "pixelwise loss weight")
    lambda_latent: float = flag(0.5, "latent loss weight")
    lambda_kl: float = flag(0.01, "kullback-leibler loss weight")


class _BiDown(nn.Module):
    """models.py:23-33: Conv(3,2,1,bias=False) -> [BN(0.8)] -> LReLU."""

    features: int
    normalize: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.features, 3, 2, 1, use_bias=False, init_mode="normal02")(x)
        if self.normalize:
            x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
        return leaky_relu(x, 0.2)


class _BiUp(nn.Module):
    """models.py:36-49: Upsample -> Conv(3,1,1,bias=False) -> BN(0.8) -> ReLU
    -> cat skip."""

    features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = Upsample(2)(x)
        x = Conv(self.features, 3, 1, 1, use_bias=False, init_mode="normal02")(x)
        x = BatchNorm(eps=0.8, init_mode="normal02")(x, train=train)
        x = nn.relu(x)
        return jnp.concatenate([x, skip], axis=-1)


class BicycleGenerator(nn.Module):
    """models.py:52-94: 7-down/6-up U-Net over cat(img, fc(z) as channel)."""

    channels: int
    img_height: int
    img_width: int

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        zmap = Linear(self.img_height * self.img_width, init_mode="torch")(z)
        # torch view(B, 1, H, W) == NHWC (B, H, W, 1) for a single channel.
        zmap = zmap.reshape(z.shape[0], self.img_height, self.img_width, 1)
        y = jnp.concatenate([x, zmap], axis=-1)
        d1 = _BiDown(64, normalize=False)(y, train)
        d2 = _BiDown(128)(d1, train)
        d3 = _BiDown(256)(d2, train)
        d4 = _BiDown(512)(d3, train)
        d5 = _BiDown(512)(d4, train)
        d6 = _BiDown(512)(d5, train)
        d7 = _BiDown(512, normalize=False)(d6, train)
        u1 = _BiUp(512)(d7, d6, train)
        u2 = _BiUp(512)(u1, d5, train)
        u3 = _BiUp(512)(u2, d4, train)
        u4 = _BiUp(256)(u3, d3, train)
        u5 = _BiUp(128)(u4, d2, train)
        u6 = _BiUp(64)(u5, d1, train)
        y = Upsample(2)(u6)
        y = Conv(self.channels, 3, 1, 1, init_mode="normal02")(y)
        return jnp.tanh(y)


class BicycleEncoder(nn.Module):
    """models.py:102-118: ResNet18 trunk -> AvgPool(8) -> (mu, logvar)."""

    latent_dim: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        feat = ResNet18Trunk()(img, train=train)
        feat = avg_pool(feat, 8, 8, 0)
        feat = feat.reshape(feat.shape[0], -1)
        mu = Linear(self.latent_dim, init_mode="torch")(feat)
        logvar = Linear(self.latent_dim, init_mode="torch")(feat)
        return mu, logvar


class BicycleMultiD(nn.Module):
    """models.py:126-165: 3 towers of 4 Conv(4,2,1)+BN(0.8)+LReLU blocks +
    3x3 head, AvgPool pyramid between towers (see module docstring re the
    in_channels NameError fix)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        outputs = []
        for _ in range(3):
            y = x
            for i, f in enumerate((64, 128, 256, 512)):
                y = Conv(f, 4, 2, 1, init_mode="normal02")(y)
                if i > 0:
                    y = BatchNorm(eps=0.8, init_mode="normal02")(y, train=train)
                y = leaky_relu(y, 0.2)
            outputs.append(Conv(1, 3, 1, 1, init_mode="normal02")(y))
            x = avg_pool(x, 3, 2, 1, count_include_pad=False)
        return outputs


def _multi_loss(outputs, gt):
    return sum(jnp.mean((o - gt) ** 2) for o in outputs)


def build(cfg: Config):
    return {
        "generator": BicycleGenerator(
            channels=cfg.channels, img_height=cfg.img_height,
            img_width=cfg.img_width,
        ),
        "encoder": BicycleEncoder(latent_dim=cfg.latent_dim),
        "D_VAE": BicycleMultiD(),
        "D_LR": BicycleMultiD(),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, 5)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    z = jnp.zeros((1, cfg.latent_dim), jnp.float32)
    params, model_state = {}, {}
    g_params, g_bs = init_module(modules["generator"], keys[0], img, z, train=True)
    e_params, e_bs = init_module(modules["encoder"], keys[1], img, train=True)
    dv_params, dv_bs = init_module(modules["D_VAE"], keys[2], img, train=True)
    dl_params, dl_bs = init_module(modules["D_LR"], keys[3], img, train=True)
    params = {
        "generator": g_params, "encoder": e_params,
        "D_VAE": dv_params, "D_LR": dl_params,
    }
    model_state = {
        "generator": g_bs, "encoder": e_bs, "D_VAE": dv_bs, "D_LR": dl_bs,
    }
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)
    opt_state = {n: tx.init(params[n]) for n in MODULES}
    return TrainState.create(
        params, opt_state, keys[4], model_state=model_state
    )


def make_step(cfg: Config, modules=None):
    modules = modules or build(cfg)
    G, E = modules["generator"], modules["encoder"]
    D_VAE, D_LR = modules["D_VAE"], modules["D_LR"]
    tx = adam_torch(cfg.lr, cfg.b1, cfg.b2)

    def step(state: TrainState, a_u8, b_u8):
        real_a = normalize_uint8(a_u8)
        real_b = normalize_uint8(b_u8)
        rng, k_eps, k_z = jax.random.split(state.rng, 3)
        bsz = real_a.shape[0]
        eps = jax.random.normal(k_eps, (bsz, cfg.latent_dim))
        sampled_z = jax.random.normal(k_z, (bsz, cfg.latent_dim))

        # --- Phase 1: loss_GE over encoder U generator (bicyclegan.py:152-188)
        def ge_loss_fn(eg_tree):
            (mu, logvar), e_bs = apply_mod(
                E, eg_tree["encoder"], state.model_state["encoder"], real_b,
                train=True,
            )
            encoded_z = eps * jnp.exp(logvar / 2) + mu
            fake_b, g_bs1 = apply_mod(
                G, eg_tree["generator"], state.model_state["generator"],
                real_a, encoded_z, train=True,
            )
            loss_pixel = l1(fake_b, real_b)
            loss_kl = 0.5 * jnp.sum(
                jnp.exp(logvar) + mu**2 - logvar - 1.0
            )
            dv_outs, dv_bs = apply_mod(
                D_VAE, state.params["D_VAE"], state.model_state["D_VAE"],
                fake_b, train=True,
            )
            loss_vae_gan = _multi_loss(dv_outs, 1.0)

            _fake_b, g_bs2 = apply_mod(
                G, eg_tree["generator"], g_bs1, real_a, sampled_z, train=True
            )
            dl_outs, dl_bs = apply_mod(
                D_LR, state.params["D_LR"], state.model_state["D_LR"],
                _fake_b, train=True,
            )
            loss_lr_gan = _multi_loss(dl_outs, 1.0)

            loss_ge = (
                loss_vae_gan
                + loss_lr_gan
                + cfg.lambda_pixel * loss_pixel
                + cfg.lambda_kl * loss_kl
            )
            aux = (fake_b, _fake_b, loss_pixel, loss_kl, e_bs, g_bs2, dv_bs, dl_bs)
            return loss_ge, aux

        eg_tree = {
            "encoder": state.params["encoder"],
            "generator": state.params["generator"],
        }
        (loss_ge, aux), eg_grads = jax.value_and_grad(
            ge_loss_fn, has_aux=True
        )(eg_tree)
        fake_b, _fake_b, loss_pixel, loss_kl, e_bs, g_bs, dv_bs, dl_bs = aux

        # Encoder steps on grad_E(loss_GE) alone (optimizer_E.step, :188).
        e_up, e_opt = tx.update(
            eg_grads["encoder"], state.opt_state["encoder"],
            state.params["encoder"],
        )
        e_params = optax.apply_updates(state.params["encoder"], e_up)

        # --- Phase 2 (bicyclegan.py:190-199): latent L1 through the UPDATED
        # encoder; G steps on the ACCUMULATED grads (the _fake_B graph is
        # re-derived from the pre-update g_params inside the closure). ---
        def latent_loss_fn(g_params):
            fb, _ = apply_mod(
                G, g_params, state.model_state["generator"], real_a,
                sampled_z, train=True,
            )
            (mu2, _), e_bs2 = apply_mod(E, e_params, e_bs, fb, train=True)
            return cfg.lambda_latent * l1(mu2, sampled_z), e_bs2

        (loss_latent, e_bs_final), g_grads_2 = jax.value_and_grad(
            latent_loss_fn, has_aux=True
        )(state.params["generator"])
        g_grads_total = jax.tree_util.tree_map(
            lambda a, b: a + b, eg_grads["generator"], g_grads_2
        )
        g_up, g_opt = tx.update(
            g_grads_total, state.opt_state["generator"],
            state.params["generator"],
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)

        # --- D_VAE phase (bicyclegan.py:205-210) ---
        fake_b_d = jax.lax.stop_gradient(fake_b)
        _fake_b_d = jax.lax.stop_gradient(_fake_b)

        def dvae_loss_fn(d_params):
            real_outs, bs1 = apply_mod(D_VAE, d_params, dv_bs, real_b, train=True)
            fake_outs, bs2 = apply_mod(D_VAE, d_params, bs1, fake_b_d, train=True)
            return _multi_loss(real_outs, 1.0) + _multi_loss(fake_outs, 0.0), bs2

        (loss_d_vae, dv_bs_final), dv_grads = jax.value_and_grad(
            dvae_loss_fn, has_aux=True
        )(state.params["D_VAE"])
        dv_up, dv_opt = tx.update(
            dv_grads, state.opt_state["D_VAE"], state.params["D_VAE"]
        )
        dv_params = optax.apply_updates(state.params["D_VAE"], dv_up)

        # --- D_LR phase (bicyclegan.py:216-221) ---
        def dlr_loss_fn(d_params):
            real_outs, bs1 = apply_mod(D_LR, d_params, dl_bs, real_b, train=True)
            fake_outs, bs2 = apply_mod(D_LR, d_params, bs1, _fake_b_d, train=True)
            return _multi_loss(real_outs, 1.0) + _multi_loss(fake_outs, 0.0), bs2

        (loss_d_lr, dl_bs_final), dl_grads = jax.value_and_grad(
            dlr_loss_fn, has_aux=True
        )(state.params["D_LR"])
        dl_up, dl_opt = tx.update(
            dl_grads, state.opt_state["D_LR"], state.params["D_LR"]
        )
        dl_params = optax.apply_updates(state.params["D_LR"], dl_up)

        new_state = state.replace(
            step=state.step + 1,
            params={
                "generator": g_params, "encoder": e_params,
                "D_VAE": dv_params, "D_LR": dl_params,
            },
            model_state={
                "generator": g_bs, "encoder": e_bs_final,
                "D_VAE": dv_bs_final, "D_LR": dl_bs_final,
            },
            opt_state={
                "generator": g_opt, "encoder": e_opt,
                "D_VAE": dv_opt, "D_LR": dl_opt,
            },
            rng=rng,
        )
        out = {
            "loss_D_VAE": loss_d_vae, "loss_D_LR": loss_d_lr,
            "g_loss": loss_ge, "loss_pixel": loss_pixel,
            "loss_kl": loss_kl, "loss_latent": loss_latent,
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
    )


def make_sampler(cfg: Config, modules):
    """bicyclegan.py:102-122: per val-A image, [original | latent_dim
    samples] rows; eval-mode generator (BN running stats)."""
    G = modules["generator"]
    val_loader = make_loader(cfg, split="val", batch_size=8)
    imgdir, _ = out_dirs(cfg)
    n = cfg.latent_dim

    @jax.jit
    def translate(params, g_bs, a_u8, rng):
        # ONE batched generator application over all rows*n samples
        # (bicyclegan.py:107-120 loops per image — same values).
        x = normalize_uint8(a_u8)
        m = x.shape[0]
        rep = jnp.repeat(x, n, axis=0)
        z = jax.random.normal(rng, (m * n, n))
        fb, _ = apply_mod(G, params, g_bs, rep, z, train=False)
        fb = fb.reshape(m, n, *fb.shape[1:])
        rows = jnp.concatenate(
            [x[:, None], *(fb[:, j : j + 1] for j in range(n))], axis=1
        )
        rows = jnp.concatenate([rows[:, k] for k in range(n + 1)], axis=2)
        return jnp.concatenate([rows[k] for k in range(m)], axis=0)

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        rng = jax.random.fold_in(state.rng, batches_done)
        sheet = translate(
            state.params["generator"], state.model_state["generator"],
            batch[0], rng,
        )
        save_image(
            jax.device_get(sheet)[None],
            "%s/%s.png" % (imgdir, batches_done),
            nrow=1, normalize=True,
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
                    "[D VAE_loss: %f, LR_loss: %f] "
                    "[G loss: %f, pixel: %f, kl: %f, latent: %f]"
                    % (
                        float(out["loss_D_VAE"]), float(out["loss_D_LR"]),
                        float(out["g_loss"]), float(out["loss_pixel"]),
                        float(out["loss_kl"]), float(out["loss_latent"]),
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
