"""ClusterGAN (Mukherjee et al. 2019).

Reference: /root/reference/implementations/cluster_gan/clustergan.py —
Generator_CNN (FC1024_BR -> FC7x7x128_BR -> 2x ConvTranspose2d -> Sigmoid,
clustergan.py:143-193), Encoder_CNN (mirror conv stack -> (zn, softmax zc),
clustergan.py:196-245), Discriminator_CNN (conv stack -> Linear -> 1 [+
Sigmoid unless --wass_flag], clustergan.py:248-297). Latent =
(0.75*N(0,1) zn30, one-hot zc10) (clustergan.py:41-68). All
Conv/ConvTranspose/Linear weights ~ N(0, 0.02) with ZERO bias
(initialize_weights, clustergan.py:106-116); BatchNorms keep torch defaults.

Schedule (clustergan.py:398-475): every batch trains D; every ``n_critic``-th
batch also trains G+E jointly first (one Adam over the chained params with
weight_decay 2.5e-5, clustergan.py:380-384; betas (0.5, 0.9)). GE loss =
adv(D(gen)) + 10*MSE(enc_zn, zn) + 10*CE(enc_zc_logits, zc_idx); adv is
BCE(D_gen, 1) or, with --wass_flag, mean(D_gen). D loss = BCE pair, or
mean(D_real) - mean(D_gen) + GP(1e-12-norm variant, clustergan.py:70-102).
The D loss consumes the SAME D_real/D_gen tensors computed before the GE
update (clustergan.py:428-429,465) — reproduced by evaluating both losses
at the pre-update parameters. The reference is CUDA-hardcoded
(clustergan.py:45-63); behavior here is device-agnostic.

Data is MNIST with ToTensor only — NO 0.5 normalization (clustergan.py:356),
so inputs live in [0,1] and G ends in Sigmoid. Per-epoch test-set cycle
metrics + three sample sheets (cycle_reg / gen / gen_classes,
clustergan.py:483-566) run in the epoch_end callback.
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.data import DeviceLoader, mnist_or_synthetic
from tpugan.io.images import save_image
from tpugan.losses import bce, cross_entropy_logits, mse
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.layers import BatchNorm, Conv, ConvTranspose, Linear, leaky_relu
from tpugan.models._im2im_common import StepObserver
from tpugan.ops.penalty import wgan_gp_penalty
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch
from tpugan.train.state import TrainState
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "cluster_gan"
N_C = 10  # clustergan.py:317
BETA_N = 10.0  # clustergan.py:318
BETA_C = 10.0  # clustergan.py:319
B1, B2 = 0.5, 0.9  # clustergan.py:306-307
DECAY = 2.5e-5  # clustergan.py:308
GP_LAMBDA = 10.0  # clustergan.py:72


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with clustergan.py:30-36 (short flags omitted; the dests
    # and defaults match).
    n_epochs: int = flag(200, "Number of epochs", short="-n")
    batch_size: int = flag(64, "Batch size", short="-b")
    img_size: int = flag(28, "Size of image dimension", short="-i")
    latent_dim: int = flag(30, "Dimension of latent space", short="-d")
    lr: float = flag(0.0001, "Learning rate", short="-l")
    n_critic: int = flag(
        5, "Number of training steps for discriminator per iter", short="-c"
    )
    wass_flag: bool = flag(False, "Flag for Wasserstein metric", short="-w")


class GeneratorCNN(nn.Module):
    """clustergan.py:143-193."""

    latent_dim: int
    n_c: int
    img_size: int

    @nn.compact
    def __call__(self, zn, zc, train: bool = True):
        x = jnp.concatenate([zn, zc], axis=1)
        x = Linear(1024, init_mode="normal02zero")(x)
        x = BatchNorm(init_mode="torch")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = Linear(128 * 7 * 7, init_mode="normal02zero")(x)
        x = BatchNorm(init_mode="torch")(x, train=train)
        x = leaky_relu(x, 0.2)
        # torch Reshape((128, 7, 7)) element order (clustergan.py:171).
        from tpugan.nn.layers import unflatten_nchw

        x = unflatten_nchw(x, 128, 7, 7)
        x = ConvTranspose(64, 4, 2, 1, init_mode="normal02zero")(x)
        x = BatchNorm(init_mode="torch")(x, train=train)
        x = leaky_relu(x, 0.2)
        x = ConvTranspose(1, 4, 2, 1, init_mode="normal02zero")(x)
        return jax.nn.sigmoid(x)


class _ConvTrunk(nn.Module):
    """Shared E/D conv stack (clustergan.py:214-227,268-281): two
    VALID-padded stride-2 4x4 convs then Linear 1024."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = Conv(64, 4, 2, 0, init_mode="normal02zero")(img)
        x = leaky_relu(x, 0.2)
        x = Conv(128, 4, 2, 0, init_mode="normal02zero")(x)
        x = leaky_relu(x, 0.2)
        from tpugan.nn.layers import flatten_nchw

        x = flatten_nchw(x)  # torch Reshape((128*5*5,)) order
        x = Linear(1024, init_mode="normal02zero")(x)
        return leaky_relu(x, 0.2)


class EncoderCNN(nn.Module):
    """clustergan.py:196-245: returns (zn, zc, zc_logits)."""

    latent_dim: int
    n_c: int

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = _ConvTrunk()(img)
        z = Linear(self.latent_dim + self.n_c, init_mode="normal02zero")(x)
        zn = z[:, : self.latent_dim]
        zc_logits = z[:, self.latent_dim :]
        return zn, jax.nn.softmax(zc_logits, axis=1), zc_logits


class DiscriminatorCNN(nn.Module):
    """clustergan.py:248-297."""

    wass_metric: bool

    @nn.compact
    def __call__(self, img, train: bool = True):
        del train
        x = _ConvTrunk()(img)
        x = Linear(1, init_mode="normal02zero")(x)
        if not self.wass_metric:
            x = jax.nn.sigmoid(x)
        return x


def sample_z(rng, shape, latent_dim, n_c, fix_class=-1):
    """clustergan.py:41-68: zn = 0.75*N(0,1); zc one-hot (random or fixed)."""
    k_zn, k_zc = jax.random.split(rng)
    zn = 0.75 * jax.random.normal(k_zn, (shape, latent_dim))
    if fix_class == -1:
        zc_idx = jax.random.randint(k_zc, (shape,), 0, n_c)
    else:
        zc_idx = jnp.full((shape,), fix_class, jnp.int32)
    zc = jax.nn.one_hot(zc_idx, n_c, dtype=jnp.float32)
    return zn, zc, zc_idx


def build(cfg: Config):
    return {
        "generator": GeneratorCNN(
            latent_dim=cfg.latent_dim, n_c=N_C, img_size=cfg.img_size
        ),
        "encoder": EncoderCNN(latent_dim=cfg.latent_dim, n_c=N_C),
        "discriminator": DiscriminatorCNN(wass_metric=cfg.wass_flag),
    }


def create_state(cfg: Config, modules=None) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_e, k_d, k_state = jax.random.split(rng, 4)
    zn = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    zc = jnp.zeros((2, N_C), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, 1), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, zn, zc, train=True)
    e_params, _ = init_module(modules["encoder"], k_e, img)
    d_params, _ = init_module(modules["discriminator"], k_d, img)
    tx_ge = adam_torch(cfg.lr, B1, B2, weight_decay=DECAY)
    tx_d = adam_torch(cfg.lr, B1, B2)
    ge_tree = {"generator": g_params, "encoder": e_params}
    params = {**ge_tree, "discriminator": d_params}
    opt_state = {"ge": tx_ge.init(ge_tree), "discriminator": tx_d.init(d_params)}
    return TrainState.create(
        params, opt_state, k_state, model_state={"generator": g_bs}
    )


def _adv_and_d_losses(cfg, D, d_params, gen, real, gp_rng):
    """Forward D on gen/real and produce (ge_adv_loss, d_loss) per the
    metric flag. Both losses are evaluated at the same (pre-update) params,
    matching the shared-graph semantics (clustergan.py:428-429,443-448,
    460-472)."""
    d_gen, _ = apply_mod(D, d_params, None, gen)
    d_real, _ = apply_mod(D, d_params, None, real)
    if cfg.wass_flag:
        ge_adv = jnp.mean(d_gen)
        gp = wgan_gp_penalty(
            lambda x: apply_mod(D, d_params, None, x)[0],
            jax.lax.stop_gradient(real), jax.lax.stop_gradient(gen),
            gp_rng, norm_eps=1e-12,
        )
        d_loss = jnp.mean(d_real) - jnp.mean(d_gen) + GP_LAMBDA * gp
    else:
        ge_adv = bce(d_gen, 1.0)
        d_loss = (bce(d_real, 1.0) + bce(d_gen, 0.0)) / 2
    return ge_adv, d_loss


def make_steps(cfg: Config, modules=None):
    """Returns (full_step, d_step): the host loop calls full_step on batches
    where i % n_critic == 0 (GE + D updates) and d_step otherwise (D only),
    mirroring clustergan.py:432-475."""
    modules = modules or build(cfg)
    G, E, D = modules["generator"], modules["encoder"], modules["discriminator"]
    tx_ge = adam_torch(cfg.lr, B1, B2, weight_decay=DECAY)
    tx_d = adam_torch(cfg.lr, B1, B2)

    def _d_update(d_loss, d_grads, state):
        d_up, d_opt = tx_d.update(
            d_grads, state.opt_state["discriminator"],
            state.params["discriminator"],
        )
        return optax.apply_updates(state.params["discriminator"], d_up), d_opt

    def full_step(state: TrainState, imgs_u8, labels):
        del labels
        real = imgs_u8.astype(jnp.float32) / 255.0  # ToTensor only
        rng, k_z, k_gp = jax.random.split(state.rng, 3)
        zn, zc, zc_idx = sample_z(k_z, real.shape[0], cfg.latent_dim, N_C)

        # --- GE phase (clustergan.py:417-451) ---
        def ge_loss_fn(ge_tree):
            gen, g_bs = apply_mod(
                G, ge_tree["generator"], state.model_state["generator"],
                zn, zc, train=True,
            )
            ge_adv, _ = _adv_and_d_losses(
                cfg, D, state.params["discriminator"], gen, real, k_gp
            )
            enc_zn, _, enc_zc_logits = apply_mod(
                E, ge_tree["encoder"], None, gen
            )[0]
            zn_loss = mse(enc_zn, zn)
            zc_loss = cross_entropy_logits(enc_zc_logits, zc_idx)
            loss = ge_adv + BETA_N * zn_loss + BETA_C * zc_loss
            return loss, (gen, g_bs)

        ge_tree = {
            "generator": state.params["generator"],
            "encoder": state.params["encoder"],
        }
        (ge_loss, (gen, g_bs)), ge_grads = jax.value_and_grad(
            ge_loss_fn, has_aux=True
        )(ge_tree)
        ge_up, ge_opt = tx_ge.update(ge_grads, state.opt_state["ge"], ge_tree)
        ge_tree = optax.apply_updates(ge_tree, ge_up)

        # --- D phase at PRE-update params w.r.t. the same gen batch ---
        gen_d = jax.lax.stop_gradient(gen)

        def d_loss_fn(d_params):
            _, d_loss = _adv_and_d_losses(cfg, D, d_params, gen_d, real, k_gp)
            return d_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"]
        )
        d_params, d_opt = _d_update(d_loss, d_grads, state)

        new_state = state.replace(
            step=state.step + 1,
            params={**ge_tree, "discriminator": d_params},
            model_state={"generator": g_bs},
            opt_state={"ge": ge_opt, "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "ge_loss": ge_loss, "gen_imgs": gen}

    def d_step(state: TrainState, imgs_u8, labels):
        del labels
        real = imgs_u8.astype(jnp.float32) / 255.0
        rng, k_z, k_gp = jax.random.split(state.rng, 3)
        zn, zc, _ = sample_z(k_z, real.shape[0], cfg.latent_dim, N_C)
        gen, g_bs = apply_mod(
            G, state.params["generator"], state.model_state["generator"],
            zn, zc, train=True,
        )
        gen_d = jax.lax.stop_gradient(gen)

        def d_loss_fn(d_params):
            _, d_loss = _adv_and_d_losses(cfg, D, d_params, gen_d, real, k_gp)
            return d_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"]
        )
        d_params, d_opt = _d_update(d_loss, d_grads, state)
        new_state = state.replace(
            step=state.step + 1,
            params={**{k: state.params[k] for k in ("generator", "encoder")},
                    "discriminator": d_params},
            model_state={"generator": g_bs},
            opt_state={"ge": state.opt_state["ge"], "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "gen_imgs": gen}

    return full_step, d_step


def make_loader(cfg: Config, sharding=None, train=True) -> DeviceLoader:
    ds, is_real = mnist_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size, channels=1,
        synthetic=cfg.synthetic_data, seed=cfg.seed,
    )
    if not is_real and train:
        print("[tpugan] MNIST not found on disk — using synthetic dataset")
    return DeviceLoader(
        [ds.images, ds.labels], cfg.batch_size, shuffle=True, seed=cfg.seed,
        sharding=sharding,
    )


def make_epoch_eval(cfg: Config, modules):
    """Epoch-end cycle metrics + sample sheets (clustergan.py:483-566)."""
    G, E = modules["generator"], modules["encoder"]
    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    n_sqrt_samp = 5
    n_samp = n_sqrt_samp * n_sqrt_samp

    # Fixed test batch (clustergan.py:364-378).
    ds, _ = mnist_or_synthetic(
        cfg.data_dir, img_size=cfg.img_size, channels=1,
        synthetic=cfg.synthetic_data, seed=cfg.seed + 1,
    )
    test_imgs = jnp.asarray(
        ds.images[: cfg.batch_size].astype(np.float32) / 255.0
    )

    @jax.jit
    def evaluate(params, g_bs, rng):
        # Eval mode: BatchNorm running stats (generator.eval()).
        k1, k2 = jax.random.split(rng)
        e_tzn, e_tzc, _ = apply_mod(E, params["encoder"], None, test_imgs)[0]
        teg_imgs, _ = apply_mod(
            G, params["generator"], g_bs, e_tzn, e_tzc, train=False
        )
        img_mse_loss = mse(test_imgs, teg_imgs)

        zn_samp, zc_samp, zc_idx = sample_z(k1, n_samp, cfg.latent_dim, N_C)
        gen_samp, _ = apply_mod(
            G, params["generator"], g_bs, zn_samp, zc_samp, train=False
        )
        zn_e, _, zc_e_logits = apply_mod(E, params["encoder"], None, gen_samp)[0]
        lat_mse_loss = mse(zn_e, zn_samp)
        lat_xe_loss = cross_entropy_logits(zc_e_logits, zc_idx)

        # Class-conditioned sheet: n_c rows of n_c fixed-class samples.
        rows = []
        for idx in range(N_C):
            kr = jax.random.fold_in(k2, idx)
            zn_c, zc_c, _ = sample_z(kr, N_C, cfg.latent_dim, N_C, fix_class=idx)
            row, _ = apply_mod(
                G, params["generator"], g_bs, zn_c, zc_c, train=False
            )
            rows.append(row)
        stack_imgs = jnp.concatenate(rows, axis=0)

        # Cycle real -> enc -> gen on the test head (clustergan.py:523-525).
        r_imgs = test_imgs[:n_samp]
        e_zn, e_zc, _ = apply_mod(E, params["encoder"], None, r_imgs)[0]
        reg_imgs, _ = apply_mod(
            G, params["generator"], g_bs, e_zn, e_zc, train=False
        )
        return img_mse_loss, lat_mse_loss, lat_xe_loss, reg_imgs, gen_samp, stack_imgs

    def epoch_end(state, epoch):
        rng = jax.random.fold_in(state.rng, 10_000 + epoch)
        (img_mse, lat_mse, lat_xe, reg_imgs, gen_samp, stack_imgs) = evaluate(
            state.params, state.model_state["generator"], rng
        )
        save_image(
            jax.device_get(reg_imgs[:n_samp]),
            os.path.join(imgdir, "cycle_reg_%06i.png" % epoch),
            nrow=n_sqrt_samp, normalize=True,
        )
        save_image(
            jax.device_get(gen_samp[:n_samp]),
            os.path.join(imgdir, "gen_%06i.png" % epoch),
            nrow=n_sqrt_samp, normalize=True,
        )
        save_image(
            jax.device_get(stack_imgs),
            os.path.join(imgdir, "gen_classes_%06i.png" % epoch),
            nrow=N_C, normalize=True,
        )
        print(
            "\tCycle Losses: [x: %f] [z_n: %f] [z_c: %f]"
            % (float(img_mse), float(lat_mse), float(lat_xe))
        )
        return None

    return epoch_end


def run(cfg: Config):
    modules = build(cfg)
    state = create_state(cfg, modules)
    sharding = auto_sharding(cfg.batch_size)
    loader = make_loader(cfg, sharding=sharding)
    state = replicate_for(sharding, state)
    observer = StepObserver(cfg)
    full_step, d_step = make_steps(cfg, modules)
    full_step = jax.jit(full_step)
    d_step = jax.jit(d_step)
    epoch_end = make_epoch_eval(cfg, modules)

    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    print("\nBegin training session with %i epochs...\n" % cfg.n_epochs)
    ge_loss = d_loss = float("nan")
    for epoch in range(cfg.n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            if i % cfg.n_critic == 0:
                state, out = full_step(state, *batch)
                ge_loss = float(out["ge_loss"])
            else:
                state, out = d_step(state, *batch)
            observer.observe(epoch * bpe + i, out)
            d_loss = float(out["d_loss"])
        print(
            "[Epoch %d/%d] \n\tModel Losses: [D: %f] [GE: %f]"
            % (epoch, cfg.n_epochs, d_loss, ge_loss)
        )
        epoch_end(state, epoch)
    observer.close()
    return state


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
