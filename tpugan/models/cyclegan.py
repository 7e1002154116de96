"""CycleGAN (Zhu et al. 2017) — unpaired image-to-image translation.

Reference: /root/reference/implementations/cyclegan/cyclegan.py + models.py +
utils.py + datasets.py — two ReflectionPad ResNet generators (c7s1-64,
2x down, 9 residual, 2x up, models.py:40-87), two PatchGAN discriminators
(models.py:95-122), MSE GAN + lambda_cyc=10 cycle L1 + lambda_id=5 identity
L1 (cyclegan.py:40-41,179-202), one Adam over both generators + one per D
(cyclegan.py:87-91), LambdaLR linear decay from --decay_epoch stepped per
epoch on all three (cyclegan.py:93-102,274-277), and 50-image replay
buffers feeding the D updates (cyclegan.py:107-108,216,233; utils.py:13-33).
This is the 256px throughput benchmark config (BASELINE.json).

Train transforms: resize 1.12x -> random crop -> random h-flip per domain
(cyclegan.py:111-117), unpaired random-B (datasets.py:29-33) — applied by
loader host transforms here. Samples: 4 make_grid rows (real_A / fake_B /
real_B / fake_A) from the test split, nrow=5 (cyclegan.py:135-151).
Checkpoints G_AB/G_BA/D_A/D_B_<E>.pth (cyclegan.py:279-284).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugan.data import UnpairedLoader
from tpugan.data.im2im import (
    resize_crop_flip_transform,
    unpaired_or_synthetic,
)
from tpugan.io.images import make_grid, save_image
from tpugan.losses import l1, mse
from tpugan.models._common import apply_mod, init_module
from tpugan.models._im2im_common import (
    StepObserver,
    EtaLogger,
    checkpoint_epoch,
    maybe_resume,
    out_dirs,
)
from tpugan.nn.im2im import GeneratorResNet, PatchGAN
from tpugan.parallel import auto_sharding, replicate_for
from tpugan.train.optim import adam_torch, linear_decay_schedule
from tpugan.train.replay import replay_init, replay_push_and_pop
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "cyclegan"
MODULES = ("G_AB", "G_BA", "D_A", "D_B")


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with cyclegan.py:24-42.
    epoch: int = flag(0, "epoch to start training from")
    n_epochs: int = flag(200, "number of epochs of training")
    dataset_name: str = flag("monet2photo", "name of the dataset")
    batch_size: int = flag(1, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    decay_epoch: int = flag(100, "epoch from which to start lr decay")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    img_height: int = flag(256, "size of image height")
    img_width: int = flag(256, "size of image width")
    channels: int = flag(3, "number of image channels")
    sample_interval: int = flag(100, "interval between saving generator outputs")
    checkpoint_interval: int = flag(-1, "interval between saving model checkpoints")
    n_residual_blocks: int = flag(9, "number of residual blocks in generator")
    lambda_cyc: float = flag(10.0, "cycle loss weight")
    lambda_id: float = flag(5.0, "identity loss weight")


def build(cfg: Config):
    g = lambda: GeneratorResNet(
        channels=cfg.channels,
        num_residual_blocks=cfg.n_residual_blocks,
        init_mode="normal02zero",  # cyclegan zeroes conv biases, models.py:6-14
    )
    d = lambda: PatchGAN(head_bias=True, init_mode="normal02zero")
    return {"G_AB": g(), "G_BA": g(), "D_A": d(), "D_B": d()}


def _schedules(cfg: Config, steps_per_epoch: int):
    # LambdaLR decay; offset = start epoch (cyclegan.py:94-102, utils.py:36-44).
    return linear_decay_schedule(
        cfg.lr, cfg.n_epochs, cfg.decay_epoch, steps_per_epoch, offset=cfg.epoch
    )


def create_state(cfg: Config, modules=None, steps_per_epoch: int = 1) -> TrainState:
    modules = modules or build(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, 5)
    img = jnp.zeros(
        (1, cfg.img_height, cfg.img_width, cfg.channels), jnp.float32
    )
    params = {}
    for k, name in zip(keys[:4], MODULES):
        p, _ = init_module(modules[name], k, img)
        params[name] = p
    sched = _schedules(cfg, steps_per_epoch)
    tx_g = adam_torch(sched, cfg.b1, cfg.b2)
    tx_d = adam_torch(sched, cfg.b1, cfg.b2)
    g_tree = {"G_AB": params["G_AB"], "G_BA": params["G_BA"]}
    opt_state = {
        "G": tx_g.init(g_tree),
        "D_A": tx_d.init(params["D_A"]),
        "D_B": tx_d.init(params["D_B"]),
    }
    item = (cfg.img_height, cfg.img_width, cfg.channels)
    aux = {"buf_A": replay_init(50, item), "buf_B": replay_init(50, item)}
    return TrainState.create(params, opt_state, keys[4], aux=aux)


def make_step(cfg: Config, modules=None, steps_per_epoch: int = 1):
    modules = modules or build(cfg)
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    D_A, D_B = modules["D_A"], modules["D_B"]
    sched = _schedules(cfg, steps_per_epoch)
    tx_g = adam_torch(sched, cfg.b1, cfg.b2)
    tx_d = adam_torch(sched, cfg.b1, cfg.b2)

    def step(state: TrainState, a_u8, b_u8):
        real_a = normalize_uint8(a_u8)
        real_b = normalize_uint8(b_u8)
        rng, k_buf_a, k_buf_b = jax.random.split(state.rng, 3)

        # --- G phase (cyclegan.py:177-205) ---
        # The adversarial and identity applications of each generator are
        # batched into ONE forward (G_AB sees [real_a; real_b], G_BA sees
        # [real_b; real_a]): every norm in this model is per-sample
        # InstanceNorm, so the batched pass is mathematically identical to
        # the reference's separate calls while doubling MXU occupancy at
        # the reference's batch_size=1 (tests/test_im2im_core.py pins
        # equality against the unbatched composition).
        n = real_a.shape[0]

        def g_loss_fn(g_tree):
            ab_out, _ = apply_mod(
                G_AB, g_tree["G_AB"], None,
                jnp.concatenate([real_a, real_b], axis=0),
            )
            fake_b, id_b = ab_out[:n], ab_out[n:]
            ba_out, _ = apply_mod(
                G_BA, g_tree["G_BA"], None,
                jnp.concatenate([real_b, real_a], axis=0),
            )
            fake_a, id_a = ba_out[:n], ba_out[n:]
            loss_identity = (l1(id_a, real_a) + l1(id_b, real_b)) / 2

            pred_b, _ = apply_mod(D_B, state.params["D_B"], None, fake_b)
            pred_a, _ = apply_mod(D_A, state.params["D_A"], None, fake_a)
            loss_gan = (mse(pred_b, 1.0) + mse(pred_a, 1.0)) / 2

            recov_a, _ = apply_mod(G_BA, g_tree["G_BA"], None, fake_b)
            recov_b, _ = apply_mod(G_AB, g_tree["G_AB"], None, fake_a)
            loss_cycle = (l1(recov_a, real_a) + l1(recov_b, real_b)) / 2

            loss = (
                loss_gan
                + cfg.lambda_cyc * loss_cycle
                + cfg.lambda_id * loss_identity
            )
            return loss, (fake_a, fake_b, loss_gan, loss_cycle, loss_identity)

        g_tree = {"G_AB": state.params["G_AB"], "G_BA": state.params["G_BA"]}
        (g_loss, (fake_a, fake_b, loss_gan, loss_cycle, loss_identity)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(g_tree)
        )
        g_up, g_opt = tx_g.update(g_grads, state.opt_state["G"], g_tree)
        g_tree = optax.apply_updates(g_tree, g_up)

        # --- Replay buffers (cyclegan.py:216,233) ---
        buf_a, fake_a_pool = replay_push_and_pop(
            state.aux["buf_A"], jax.lax.stop_gradient(fake_a), k_buf_a
        )
        buf_b, fake_b_pool = replay_push_and_pop(
            state.aux["buf_B"], jax.lax.stop_gradient(fake_b), k_buf_b
        )

        # --- D_A phase (cyclegan.py:211-222) ---
        # real and buffered-fake batched into one forward (InstanceNorm D,
        # per-sample — same rationale as the G phase above).
        def da_loss_fn(d_params):
            pred, _ = apply_mod(
                D_A, d_params, None,
                jnp.concatenate([real_a, fake_a_pool], axis=0),
            )
            return (mse(pred[:n], 1.0) + mse(pred[n:], 0.0)) / 2

        loss_d_a, da_grads = jax.value_and_grad(da_loss_fn)(state.params["D_A"])
        da_up, da_opt = tx_d.update(
            da_grads, state.opt_state["D_A"], state.params["D_A"]
        )
        da_params = optax.apply_updates(state.params["D_A"], da_up)

        # --- D_B phase (cyclegan.py:228-239) ---
        def db_loss_fn(d_params):
            pred, _ = apply_mod(
                D_B, d_params, None,
                jnp.concatenate([real_b, fake_b_pool], axis=0),
            )
            return (mse(pred[:n], 1.0) + mse(pred[n:], 0.0)) / 2

        loss_d_b, db_grads = jax.value_and_grad(db_loss_fn)(state.params["D_B"])
        db_up, db_opt = tx_d.update(
            db_grads, state.opt_state["D_B"], state.params["D_B"]
        )
        db_params = optax.apply_updates(state.params["D_B"], db_up)

        new_state = state.replace(
            step=state.step + 1,
            params={**g_tree, "D_A": da_params, "D_B": db_params},
            opt_state={"G": g_opt, "D_A": da_opt, "D_B": db_opt},
            rng=rng,
            aux={"buf_A": buf_a, "buf_B": buf_b},
        )
        out = {
            "d_loss": (loss_d_a + loss_d_b) / 2,
            "g_loss": g_loss,
            "loss_GAN": loss_gan,
            "loss_cycle": loss_cycle,
            "loss_identity": loss_identity,
        }
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
    """cyclegan.py:135-151: 4 stacked make_grid rows from the test split."""
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    val_loader = make_loader(cfg, split="test", batch_size=5)
    imgdir, _ = out_dirs(cfg)

    @jax.jit
    def translate(params, a_u8, b_u8):
        real_a = normalize_uint8(a_u8)
        real_b = normalize_uint8(b_u8)
        fake_b, _ = apply_mod(G_AB, params["G_AB"], None, real_a)
        fake_a, _ = apply_mod(G_BA, params["G_BA"], None, real_b)
        return real_a, fake_b, real_b, fake_a

    def sample(state, out, batches_done):
        batch = next(iter(val_loader.epoch(int(batches_done))))
        rows = translate(state.params, batch[0], batch[1])
        grids = [
            make_grid(jax.device_get(r), nrow=5, normalize=True) for r in rows
        ]
        image_grid = np.concatenate(grids, axis=0)  # stack along height
        save_image(
            image_grid[None],
            "%s/%s.png" % (imgdir, batches_done),
            nrow=1, normalize=False, padding=0,
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
                    "[D loss: %f] [G loss: %f, adv: %f, cycle: %f, identity: %f]"
                    % (
                        float(out["d_loss"]), float(out["g_loss"]),
                        float(out["loss_GAN"]), float(out["loss_cycle"]),
                        float(out["loss_identity"]),
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
