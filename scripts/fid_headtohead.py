#!/usr/bin/env python
"""Head-to-head FID: reference-semantics torch DCGAN vs tpugan DCGAN.

BASELINE.json's acceptance criterion is "FID within 5%" of the reference.
The reference publishes no FID numbers (BASELINE.md), so this script
measures both sides under an identical protocol:

- dataset: the deterministic synthetic glyph set
  (tpugan.data.sources.synthetic_image_dataset, n=4096, 32px, seed 0) —
  both frameworks train on byte-identical images;
- training: DCGAN reference semantics
  (/root/reference/implementations/dcgan/dcgan.py:103-183 — G step with a
  fresh z then D step on real + detached fakes, BCE, Adam(2e-4, 0.5,
  0.999), weights_init_normal, batch 64) for 640 steps (10 epochs), the
  BASELINE.md trajectory protocol;
- scoring: 1024 samples per side, both generated in EVAL mode (torch
  g.eval() / tpugan train=False over torch-parity running BN stats), vs
  the SAME 1024 held-out reals (seed 1) through the SAME feature
  extractor (tpugan.metrics.fid.VGGFeatureModel, deterministic He-random
  features, PRNGKey(0)).

Phases (separable so the torch CPU run and the TPU run never share the
machine):

    python scripts/fid_headtohead.py --train_torch   # ~20 min, CPU only
    python scripts/fid_headtohead.py --train_tpugan  # ~1 min on the chip
    python scripts/fid_headtohead.py --score         # JSON verdict line

``--model gan`` switches to the template-A MLP config (gan/gan.py:38-81
architectures, same loop semantics; ~4 min of torch CPU). ``--model
lsgan`` runs the lsgan.py:45-99 variant (no leading G BatchNorm,
logit-head D, MSE loss — the other half of BASELINE.json's
"DCGAN + LSGAN ... FID within 5%" row). ``--model dcgan_cifar`` is the
CIFAR-class leg: the same dcgan.py semantics at the CIFAR shape
(3 channels x 32px, dcgan.py:27,32 with --channels 3) on a 3-channel
synthetic set — covers the "CIFAR" word in BASELINE.json's
"FID within 5% on MNIST/CIFAR/facades". ``--model cyclegan64`` is the
im2im (facades-config) leg: full CycleGAN reference semantics
(cyclegan/cyclegan.py:160-239 — joint G update with identity+adv+cycle,
per-domain replay-buffer D updates, Adam(2e-4, 0.5, 0.999),
weights_init_normal with zeroed conv bias) at a torch-CPU-feasible scale
(64px, 3 residual blocks, batch 4 — cyclegan.py:33-39 defaults scaled
down), trained unpaired on byte-identical synthetic scene domains
(data/im2im.py:synthetic_scene_pairs) and scored by FID of G_AB(A_test)
vs held-out B reals PLUS paired L1 to the structurally-corresponding
B target (the synthetic domains are aligned even though training is
unpaired).

Artifacts land in --out_dir (default /tmp/fid_h2h):
<model>_<side>_samples.npy, float32 NHWC in [-1, 1].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, LATENT, STEPS, N_EVAL = 64, 100, 640, 1024


def _tag(seed):
    return "" if seed == 0 else f"_s{seed}"
# dcgan.py:27 / gan.py:27 / lsgan.py:27 img_size defaults; dcgan_cifar is
# dcgan.py at the CIFAR shape (32px, --channels 3); cyclegan64 is the
# reduced im2im config (see module docstring).
IMG_BY_MODEL = {"dcgan": 32, "gan": 28, "lsgan": 32, "dcgan_cifar": 32,
                "cyclegan64": 64, "srgan64": 64}
CH_BY_MODEL = {"dcgan": 1, "gan": 1, "lsgan": 1, "dcgan_cifar": 3,
               "cyclegan64": 3, "srgan64": 3}
# cyclegan64 protocol constants (reduced template-C scale).
CYC_STEPS, CYC_BATCH, CYC_RES, CYC_N_TRAIN = 400, 4, 3, 1024
# srgan64 protocol constants (reduced SR scale: HR 64px -> LR 16px, 4
# residual blocks instead of srgan/models.py:34's 16; same 400-step /
# batch-4 budget as the cyclegan64 leg).
SR_STEPS, SR_BATCH, SR_RES, SR_HR, SR_N_TRAIN = 400, 4, 4, 64, 1024


def _img(model):
    return IMG_BY_MODEL[model]


def _dataset(model):
    from tpugan.data.sources import synthetic_image_dataset

    return synthetic_image_dataset(4096, _img(model), CH_BY_MODEL[model], seed=0)


def _scene_domains(model, seed, n):
    """Byte-identical unpaired-training / paired-eval domains (cyclegan64)."""
    from tpugan.data.im2im import synthetic_scene_pairs

    return synthetic_scene_pairs(n, _img(model), _img(model), seed=seed)


def _build_torch_gan(img):
    """Template-A MLP G/D (gan/gan.py:38-81); NO weights_init_normal —
    gan.py keeps torch defaults."""
    import torch.nn as nn

    class G(nn.Module):
        def __init__(self):
            super().__init__()

            def block(i, o, normalize=True):
                layers = [nn.Linear(i, o)]
                if normalize:
                    layers.append(nn.BatchNorm1d(o, 0.8))
                layers.append(nn.LeakyReLU(0.2, inplace=True))
                return layers

            self.model = nn.Sequential(
                *block(LATENT, 128, normalize=False),
                *block(128, 256),
                *block(256, 512),
                *block(512, 1024),
                nn.Linear(1024, img * img),
                nn.Tanh(),
            )
            self.img = img

        def forward(self, z):
            return self.model(z).view(z.shape[0], 1, self.img, self.img)

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(
                nn.Linear(img * img, 512),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Linear(512, 256),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Linear(256, 1),
                nn.Sigmoid(),
            )

        def forward(self, x):
            return self.model(x.view(x.shape[0], -1))

    return G(), D()


def train_torch(model: str, out_dir: str, seed: int = 0) -> None:
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    IMG = _img(model)
    CH = CH_BY_MODEL[model]
    lsgan = model == "lsgan"

    # Reference dcgan.py:45-99 architectures at img_size=32 (init_size 8,
    # D downsample 32/2^4 = 2). lsgan.py:45-99 is the same template with
    # two deltas: G's conv stack has NO leading BatchNorm2d(128), and D's
    # head is a bare Linear (no Sigmoid — MSE on logits).
    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.init_size = IMG // 4
            self.l1 = nn.Sequential(nn.Linear(LATENT, 128 * self.init_size**2))
            head = [] if lsgan else [nn.BatchNorm2d(128)]
            self.conv_blocks = nn.Sequential(
                *head,
                nn.Upsample(scale_factor=2),
                nn.Conv2d(128, 128, 3, stride=1, padding=1),
                nn.BatchNorm2d(128, 0.8),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Upsample(scale_factor=2),
                nn.Conv2d(128, 64, 3, stride=1, padding=1),
                nn.BatchNorm2d(64, 0.8),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(64, CH, 3, stride=1, padding=1),
                nn.Tanh(),
            )

        def forward(self, z):
            out = self.l1(z).view(z.shape[0], 128, self.init_size, self.init_size)
            return self.conv_blocks(out)

    class D(nn.Module):
        def __init__(self):
            super().__init__()

            def block(i, o, bn=True):
                layers = [
                    nn.Conv2d(i, o, 3, 2, 1),
                    nn.LeakyReLU(0.2, inplace=True),
                    nn.Dropout2d(0.25),
                ]
                if bn:
                    layers.append(nn.BatchNorm2d(o, 0.8))
                return layers

            self.model = nn.Sequential(
                *block(CH, 16, bn=False), *block(16, 32), *block(32, 64),
                *block(64, 128),
            )
            ds = IMG // 2**4
            head = [nn.Linear(128 * ds**2, 1)]
            if not lsgan:
                head.append(nn.Sigmoid())
            self.adv_layer = nn.Sequential(*head)

        def forward(self, img):
            # reshape, not view: the CH=3 conv stack yields a non-contiguous
            # output on CPU (dcgan.py:84 uses view on contiguous CUDA memory).
            out = self.model(img).reshape(img.shape[0], -1)
            return self.adv_layer(out)

    def weights_init_normal(m):  # dcgan.py:36-42
        name = m.__class__.__name__
        if name.find("Conv") != -1:
            nn.init.normal_(m.weight.data, 0.0, 0.02)
        elif name.find("BatchNorm2d") != -1:
            nn.init.normal_(m.weight.data, 1.0, 0.02)
            nn.init.constant_(m.bias.data, 0.0)

    if model == "gan":
        g, d = _build_torch_gan(IMG)
    else:
        g, d = G(), D()
        g.apply(weights_init_normal)  # dcgan.py:108-109; gan.py has no init
        d.apply(weights_init_normal)
    # lsgan.py:103: "Minimizes MSE instead of BCE"; same 1/0 targets.
    adversarial_loss = nn.MSELoss() if lsgan else nn.BCELoss()
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))

    ds = _dataset(model)
    # (N, 1, IMG, IMG) in [-1, 1] — transforms.Normalize([0.5], [0.5]) on /255.
    data = (ds.images.astype(np.float32) / 255.0 - 0.5) / 0.5
    data = np.transpose(data, (0, 3, 1, 2))
    shuffle_rng = np.random.default_rng(seed)

    step, t0 = 0, time.time()
    while step < STEPS:
        order = shuffle_rng.permutation(len(data))
        for i in range(0, len(data) - BATCH + 1, BATCH):
            real = torch.from_numpy(data[order[i : i + BATCH]])
            valid = torch.ones(BATCH, 1)
            fake = torch.zeros(BATCH, 1)
            # dcgan.py:143-183: G step then D step, fresh z, detached fakes.
            opt_g.zero_grad()
            z = torch.randn(BATCH, LATENT)
            gen = g(z)
            g_loss = adversarial_loss(d(gen), valid)
            g_loss.backward()
            opt_g.step()
            opt_d.zero_grad()
            d_loss = 0.5 * (
                adversarial_loss(d(real), valid)
                + adversarial_loss(d(gen.detach()), fake)
            )
            d_loss.backward()
            opt_d.step()
            step += 1
            if step % 64 == 0:
                print(
                    f"[torch] step {step}/{STEPS} d={d_loss.item():.4f} "
                    f"g={g_loss.item():.4f} ({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if step >= STEPS:
                break

    g.eval()
    with torch.no_grad():
        outs = []
        eval_rng = torch.Generator().manual_seed(123)
        for i in range(0, N_EVAL, 256):
            z = torch.randn(min(256, N_EVAL - i), LATENT, generator=eval_rng)
            outs.append(g(z).numpy())
    samples = np.transpose(np.concatenate(outs), (0, 2, 3, 1))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{model}_torch_samples{_tag(seed)}.npy")
    np.save(path, samples)
    print(f"[torch] wrote {samples.shape} to {path}")


def train_tpugan(model: str, out_dir: str, seed: int = 0, cpu: bool = False) -> None:
    import importlib

    import jax
    import jax.numpy as jnp

    from tpugan.data import DeviceLoader
    from tpugan.models._common import apply_mod

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    IMG = _img(model)
    recipe_name = "dcgan" if model == "dcgan_cifar" else model
    recipe = importlib.import_module(f"tpugan.models.{recipe_name}")
    cfg = recipe.Config(img_size=IMG, channels=CH_BY_MODEL[model],
                        batch_size=BATCH, seed=seed, synthetic_data=True)
    modules = recipe.build(cfg)
    state = recipe.create_state(cfg, modules)
    step_fn = jax.jit(recipe.make_step(cfg, modules), donate_argnums=0)

    ds = _dataset(model)
    loader = DeviceLoader([ds.images, ds.labels], BATCH, shuffle=True, seed=seed)
    t0, n = time.time(), 0
    for epoch in range(10**9):
        for batch in loader.epoch(epoch):
            state, out = step_fn(state, *batch)
            n += 1
            if n % 64 == 0:
                print(
                    f"[tpugan] step {n}/{STEPS} d={float(out['d_loss']):.4f} "
                    f"g={float(out['g_loss']):.4f} ({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if n >= STEPS:
                break
        if n >= STEPS:
            break

    G = modules["generator"]

    @jax.jit
    def gen(params, g_bs, z):
        # Eval-mode sampling (running-stat BN) to mirror the torch side's
        # g.eval() exactly — symmetric protocol. tpugan's BatchNorm stores
        # torch-parity UNBIASED running variance (nn/layers.py), so the
        # two sides' eval semantics match.
        out, _ = apply_mod(G, params, g_bs, z, train=False)
        return out

    rng = jax.random.PRNGKey(123)
    outs = []
    for i in range(0, N_EVAL, 256):
        z = jax.random.normal(jax.random.fold_in(rng, i), (min(256, N_EVAL - i), LATENT))
        outs.append(
            np.asarray(
                jax.device_get(
                    gen(state.params["generator"], state.model_state["generator"], z)
                )
            )
        )
    samples = np.concatenate(outs)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{model}_tpugan_samples{_tag(seed)}.npy")
    np.save(path, samples)
    print(f"[tpugan] wrote {samples.shape} to {path}")


def _feature_model(backbone: str):
    """Backbone-sensitivity switch for the score phases: 'vgg' is the
    default He-random VGG19 extractor every recorded table used; 'inception'
    is the in-tree flax InceptionV3 (tpugan/metrics/inception.py, He-random
    without data/inception_v3.npz) — an architecturally independent second
    opinion on the same stored sample sets."""
    from tpugan.metrics.fid import InceptionFeatureModel, VGGFeatureModel

    if backbone == "inception":
        return InceptionFeatureModel()
    return VGGFeatureModel()


def score(model: str, out_dir: str, seed: int = 0,
          backbone: str = "vgg") -> None:
    import jax.numpy as jnp

    from tpugan.data.sources import synthetic_image_dataset
    from tpugan.metrics.fid import fid_from_features

    IMG = _img(model)
    reals = synthetic_image_dataset(N_EVAL, IMG, CH_BY_MODEL[model], seed=1)
    real_x = (reals.images.astype(np.float32) / 255.0) * 2.0 - 1.0

    fm = _feature_model(backbone)
    real_f = fm([jnp.asarray(real_x[i : i + 256]) for i in range(0, N_EVAL, 256)])
    result = {"protocol": f"{model} {IMG}px b{BATCH} {STEPS} steps, "
                          f"{N_EVAL} samples vs held-out reals",
              "backbone": backbone,
              "seed": seed}
    for side in ("torch", "tpugan"):
        path = os.path.join(out_dir, f"{model}_{side}_samples{_tag(seed)}.npy")
        if not os.path.exists(path):  # pre-rename dcgan artifacts
            path = os.path.join(out_dir, f"{side}_samples.npy")
        if not os.path.exists(path):
            result[side] = None
            continue
        s = np.load(path)
        f = fm([jnp.asarray(s[i : i + 256]) for i in range(0, N_EVAL, 256)])
        result[side] = round(fid_from_features(real_f, f), 3)
    if result.get("torch") and result.get("tpugan"):
        result["tpugan_vs_torch_pct"] = round(
            100.0 * (result["tpugan"] - result["torch"]) / result["torch"], 2
        )
    print(json.dumps(result))


# ---------------------------------------------------------------------------
# cyclegan64 — the im2im (facades-config) leg of the acceptance table.
# ---------------------------------------------------------------------------


def _build_torch_cyclegan(img: int, channels: int, n_res: int):
    """Reference CycleGAN module classes (cyclegan/models.py:22-122) rebuilt
    in torch: ResNet G (ReflectionPad c7s1-64, 2x stride-2 down, n_res
    residual blocks with ReflectionPad+InstanceNorm, 2x Upsample+conv up,
    ReflectionPad c7s1-C Tanh — note models.py:49 pads by `channels`) and
    the 4-down InstanceNorm PatchGAN with the asymmetric
    ZeroPad2d((1,0,1,0)) head (models.py:95-122)."""
    import torch.nn as nn

    class Residual(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.body = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3),
                nn.InstanceNorm2d(ch), nn.ReLU(inplace=True),
                nn.ReflectionPad2d(1), nn.Conv2d(ch, ch, 3),
                nn.InstanceNorm2d(ch),
            )

        def forward(self, x):
            return x + self.body(x)

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            layers = [
                nn.ReflectionPad2d(channels), nn.Conv2d(channels, 64, 7),
                nn.InstanceNorm2d(64), nn.ReLU(inplace=True),
            ]
            ch = 64
            for _ in range(2):
                layers += [
                    nn.Conv2d(ch, ch * 2, 3, stride=2, padding=1),
                    nn.InstanceNorm2d(ch * 2), nn.ReLU(inplace=True),
                ]
                ch *= 2
            layers += [Residual(ch) for _ in range(n_res)]
            for _ in range(2):
                layers += [
                    nn.Upsample(scale_factor=2),
                    nn.Conv2d(ch, ch // 2, 3, stride=1, padding=1),
                    nn.InstanceNorm2d(ch // 2), nn.ReLU(inplace=True),
                ]
                ch //= 2
            layers += [
                nn.ReflectionPad2d(channels), nn.Conv2d(ch, channels, 7),
                nn.Tanh(),
            ]
            self.net = nn.Sequential(*layers)

        def forward(self, x):
            return self.net(x)

    class D(nn.Module):
        def __init__(self):
            super().__init__()

            def blk(i, o, norm=True):
                out = [nn.Conv2d(i, o, 4, stride=2, padding=1)]
                if norm:
                    out.append(nn.InstanceNorm2d(o))
                out.append(nn.LeakyReLU(0.2, inplace=True))
                return out

            self.net = nn.Sequential(
                *blk(channels, 64, norm=False), *blk(64, 128),
                *blk(128, 256), *blk(256, 512),
                nn.ZeroPad2d((1, 0, 1, 0)), nn.Conv2d(512, 1, 4, padding=1),
            )

        def forward(self, x):
            return self.net(x)

    return G, D


def _norm_nchw(u8):
    x = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    return np.transpose(x, (0, 3, 1, 2))


def train_torch_cyclegan(out_dir: str, seed: int = 0) -> None:
    """Reference loop semantics (cyclegan/cyclegan.py:160-239): joint G
    update (identity + adv + cycle, lambda_cyc=10, lambda_id=5), then per-
    domain D updates on real + 50-slot replay-buffer fakes (utils.py:13-33,
    python `random` module), Adam(2e-4, 0.5, 0.999), weights_init_normal
    with zeroed conv bias (models.py:6-14). No LR decay inside this short
    run (decay_epoch=100 never reached — cyclegan.py:93-102)."""
    import itertools
    import random

    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    random.seed(seed)  # pins the ReplayBuffer swap stream (utils.py:27-29)
    IMG, CH = _img("cyclegan64"), CH_BY_MODEL["cyclegan64"]
    Gc, Dc = _build_torch_cyclegan(IMG, CH, CYC_RES)
    g_ab, g_ba, d_a, d_b = Gc(), Gc(), Dc(), Dc()

    def init_normal(m):  # cyclegan/models.py:6-14
        if m.__class__.__name__.find("Conv") != -1:
            nn.init.normal_(m.weight.data, 0.0, 0.02)
            if getattr(m, "bias", None) is not None:
                nn.init.constant_(m.bias.data, 0.0)

    for m in (g_ab, g_ba, d_a, d_b):
        m.apply(init_normal)

    crit_gan, crit_l1 = nn.MSELoss(), nn.L1Loss()
    opt_g = torch.optim.Adam(
        itertools.chain(g_ab.parameters(), g_ba.parameters()),
        lr=2e-4, betas=(0.5, 0.999),
    )
    opt_da = torch.optim.Adam(d_a.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_db = torch.optim.Adam(d_b.parameters(), lr=2e-4, betas=(0.5, 0.999))

    class Buffer:  # utils.py:13-33 semantics
        def __init__(self):
            self.items = []

        def push_and_pop(self, batch):
            out = []
            for el in batch.detach():
                el = el.unsqueeze(0)
                if len(self.items) < 50:
                    self.items.append(el)
                    out.append(el)
                elif random.uniform(0, 1) > 0.5:
                    j = random.randint(0, 49)
                    out.append(self.items[j].clone())
                    self.items[j] = el
                else:
                    out.append(el)
            return torch.cat(out)

    buf_a, buf_b = Buffer(), Buffer()

    a_u8, b_u8 = _scene_domains("cyclegan64", 0, CYC_N_TRAIN)
    a, b = _norm_nchw(a_u8), _norm_nchw(b_u8)
    order_rng = np.random.default_rng(seed)

    patch = (1, IMG // 2 ** 4, IMG // 2 ** 4)  # models.py:103
    valid = torch.ones(CYC_BATCH, *patch)
    fake = torch.zeros(CYC_BATCH, *patch)
    step, t0 = 0, time.time()
    while step < CYC_STEPS:
        order = order_rng.permutation(len(a))
        for i in range(0, len(a) - CYC_BATCH + 1, CYC_BATCH):
            real_a = torch.from_numpy(a[order[i : i + CYC_BATCH]])
            # unpaired: B drawn uniformly at random (cyclegan/datasets.py:31)
            real_b = torch.from_numpy(
                b[order_rng.integers(0, len(b), CYC_BATCH)]
            )
            opt_g.zero_grad()  # cyclegan.py:174-205
            loss_id = (
                crit_l1(g_ba(real_a), real_a) + crit_l1(g_ab(real_b), real_b)
            ) / 2
            fake_b, fake_a = g_ab(real_a), g_ba(real_b)
            loss_gan = (
                crit_gan(d_b(fake_b), valid) + crit_gan(d_a(fake_a), valid)
            ) / 2
            loss_cyc = (
                crit_l1(g_ba(fake_b), real_a) + crit_l1(g_ab(fake_a), real_b)
            ) / 2
            (loss_gan + 10.0 * loss_cyc + 5.0 * loss_id).backward()
            opt_g.step()
            opt_da.zero_grad()  # cyclegan.py:211-222
            lda = (
                crit_gan(d_a(real_a), valid)
                + crit_gan(d_a(buf_a.push_and_pop(fake_a)), fake)
            ) / 2
            lda.backward()
            opt_da.step()
            opt_db.zero_grad()  # cyclegan.py:228-239
            ldb = (
                crit_gan(d_b(real_b), valid)
                + crit_gan(d_b(buf_b.push_and_pop(fake_b)), fake)
            ) / 2
            ldb.backward()
            opt_db.step()
            step += 1
            if step % 20 == 0:
                print(
                    f"[torch] step {step}/{CYC_STEPS} "
                    f"d={(lda.item() + ldb.item()) / 2:.4f} "
                    f"adv={loss_gan.item():.4f} cyc={loss_cyc.item():.4f} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if step >= CYC_STEPS:
                break

    g_ab.eval()  # InstanceNorm is stat-free; eval() kept for symmetry
    a_test, _ = _scene_domains("cyclegan64", 1, N_EVAL)
    at = _norm_nchw(a_test)
    with torch.no_grad():
        outs = [
            g_ab(torch.from_numpy(at[i : i + 64])).numpy()
            for i in range(0, N_EVAL, 64)
        ]
    samples = np.transpose(np.concatenate(outs), (0, 2, 3, 1))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"cyclegan64_torch_samples{_tag(seed)}.npy")
    np.save(path, samples)
    print(f"[torch] wrote {samples.shape} to {path}")


def train_tpugan_cyclegan(out_dir: str, seed: int = 0, cpu: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from tpugan.data.loader import UnpairedLoader
    from tpugan.models import cyclegan as recipe
    from tpugan.models._common import apply_mod

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    IMG = _img("cyclegan64")
    cfg = recipe.Config(
        img_height=IMG, img_width=IMG, n_residual_blocks=CYC_RES,
        batch_size=CYC_BATCH, seed=seed, synthetic_data=True,
    )
    modules = recipe.build(cfg)
    # steps_per_epoch must describe the loader actually driven below: the
    # default (1) makes the LambdaLR schedule read each STEP as an epoch,
    # so lr crossed ZERO at step (n_epochs - decay_epoch) + decay_epoch
    # = 200 and went negative — measured deterministic blow-up at step
    # ~220 on every seed before this fix (train/optim.py now also floors
    # the schedule at 0).
    bpe = CYC_N_TRAIN // CYC_BATCH
    state = recipe.create_state(cfg, modules, steps_per_epoch=bpe)
    step_fn = jax.jit(
        recipe.make_step(cfg, modules, steps_per_epoch=bpe), donate_argnums=0
    )

    a_u8, b_u8 = _scene_domains("cyclegan64", 0, CYC_N_TRAIN)
    loader = UnpairedLoader(a_u8, b_u8, CYC_BATCH, seed=seed)
    n, t0 = 0, time.time()
    for epoch in range(10 ** 9):
        for batch in loader.epoch(epoch):
            state, out = step_fn(state, *batch)
            n += 1
            if n % 20 == 0:
                print(
                    f"[tpugan] step {n}/{CYC_STEPS} "
                    f"d={float(out['d_loss']):.4f} "
                    f"adv={float(out['loss_GAN']):.4f} "
                    f"cyc={float(out['loss_cycle']):.4f} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if n >= CYC_STEPS:
                break
        if n >= CYC_STEPS:
            break

    G_AB = modules["G_AB"]

    @jax.jit
    def gen(params, x):
        out, _ = apply_mod(G_AB, params, None, x, train=False)
        return out

    a_test, _ = _scene_domains("cyclegan64", 1, N_EVAL)
    at = (a_test.astype(np.float32) / 255.0 - 0.5) / 0.5
    outs = [
        np.asarray(
            jax.device_get(gen(state.params["G_AB"], jnp.asarray(at[i : i + 64])))
        )
        for i in range(0, N_EVAL, 64)
    ]
    samples = np.concatenate(outs)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"cyclegan64_tpugan_samples{_tag(seed)}.npy")
    np.save(path, samples)
    print(f"[tpugan] wrote {samples.shape} to {path}")


def score_cyclegan(out_dir: str, seed: int = 0, backbone: str = "vgg") -> None:
    import jax.numpy as jnp

    from tpugan.metrics.fid import fid_from_features

    _, b_test = _scene_domains("cyclegan64", 1, N_EVAL)
    b_real = (b_test.astype(np.float32) / 255.0) * 2.0 - 1.0
    fm = _feature_model(backbone)
    real_f = fm([jnp.asarray(b_real[i : i + 256]) for i in range(0, N_EVAL, 256)])
    result = {
        "protocol": (
            f"cyclegan64 {CYC_RES}res b{CYC_BATCH} {CYC_STEPS} steps, "
            f"{N_EVAL} translated held-out A vs held-out B reals "
            f"(+ paired L1 to the aligned B target)"
        ),
        "backbone": backbone,
        "seed": seed,
    }
    for side in ("torch", "tpugan"):
        path = os.path.join(out_dir, f"cyclegan64_{side}_samples{_tag(seed)}.npy")
        if not os.path.exists(path):
            result[side] = None
            continue
        s = np.load(path)
        f = fm([jnp.asarray(s[i : i + 256]) for i in range(0, N_EVAL, 256)])
        result[side] = round(fid_from_features(real_f, f), 3)
        result[side + "_pair_l1"] = round(float(np.abs(s - b_real).mean()), 4)
    if result.get("torch") and result.get("tpugan"):
        result["tpugan_vs_torch_pct"] = round(
            100.0 * (result["tpugan"] - result["torch"]) / result["torch"], 2
        )
    print(json.dumps(result))


# --------------------------------------------------------------------------
# srgan64: the SR acceptance-table row (BASELINE.md "PSNR/visual parity"),
# reference srgan semantics (srgan/srgan.py:97-145: G step on content +
# 1e-3 adv MSE, then D on real + detached SR, Adam(2e-4, 0.5, 0.999),
# torch-default init — srgan has no weights_init_normal) at a torch-CPU-
# feasible scale. Both sides consume BYTE-IDENTICAL host-precomputed uint8
# LR/HR pairs (PIL-convention bicubic 64->16, tpugan.native.resize_bicubic)
# and the SAME He-random VGG19[:18] content weights (numpy-generated,
# platform-independent — the reference's ImageNet weights are unavailable
# here, BASELINE.md standing caveat). Scored on held-out pairs with PSNR
# (backbone-free, the acceptance row's own metric) + FID of SR outputs vs
# held-out HR reals.
# --------------------------------------------------------------------------


def _sr_pairs(data_seed: int, n: int):
    """(lr_u8, hr_u8): HR = domain-B photo scenes (speckle + sharp rect
    edges — non-trivial 4x SR content), LR = PIL-bit-exact bicubic 16px."""
    from tpugan.data.im2im import synthetic_scene_pairs
    from tpugan.native import resize_bicubic

    _, hr = synthetic_scene_pairs(n, SR_HR, SR_HR, seed=data_seed)
    lr = resize_bicubic(hr, SR_HR // 4, SR_HR // 4)
    return lr, hr


_SR_MEAN = np.array([0.485, 0.456, 0.406], np.float32)  # srgan/datasets.py:12
_SR_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _sr_norm(u8):
    """uint8 NHWC -> ImageNet-normalized float32 NHWC (identical arithmetic
    on both sides so the framework inputs are bit-equal)."""
    return ((u8.astype(np.float32) / 255.0) - _SR_MEAN) / _SR_STD


def _sr_vgg_weights():
    """Deterministic He-normal VGG19[:18] conv weights, generated in numpy
    so both frameworks load BIT-IDENTICAL content-loss features (flax init
    is backend-ulp-sensitive; numpy is not). Keys match the
    load_vgg19_npz convention: conv<torch_idx>_kernel (HWIO) / _bias."""
    from tpugan.nn.vgg import VGG19_LAYOUT

    rng = np.random.default_rng(0)
    weights, in_c = {}, 3
    for idx, spec in VGG19_LAYOUT:
        if idx >= 18:
            break
        if spec == "M":
            continue
        fan_in = in_c * 9
        std = float(np.sqrt(2.0 / fan_in))  # kaiming-normal, relu gain
        weights[f"conv{idx}_kernel"] = rng.normal(
            0.0, std, size=(3, 3, in_c, spec)
        ).astype(np.float32)
        weights[f"conv{idx}_bias"] = np.zeros((spec,), np.float32)
        in_c = spec
    return weights


def _build_torch_srgan():
    """Reference SRGAN module classes (srgan/models.py:18-105) rebuilt in
    torch at SR_RES blocks: SRResNet G (c9s1-64+PReLU, res blocks
    conv-BN(eps=0.8)-PReLU-conv-BN(eps=0.8)+skip, conv3-BN(0.8) global
    skip, 2x [conv3-256, BN, PixelShuffle(2), PReLU], c9s1-3 Tanh) and the
    8-conv BN discriminator; plus the VGG19[:18] feature stack wired to
    the shared He-random weights."""
    import torch
    import torch.nn as nn

    from tpugan.nn.vgg import VGG19_LAYOUT

    class Res(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = nn.Sequential(
                nn.Conv2d(64, 64, 3, 1, 1), nn.BatchNorm2d(64, 0.8),
                nn.PReLU(),
                nn.Conv2d(64, 64, 3, 1, 1), nn.BatchNorm2d(64, 0.8),
            )

        def forward(self, x):
            return x + self.body(x)

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Sequential(nn.Conv2d(3, 64, 9, 1, 4), nn.PReLU())
            self.res = nn.Sequential(*[Res() for _ in range(SR_RES)])
            self.conv2 = nn.Sequential(
                nn.Conv2d(64, 64, 3, 1, 1), nn.BatchNorm2d(64, 0.8)
            )
            up = []
            for _ in range(2):
                up += [
                    nn.Conv2d(64, 256, 3, 1, 1), nn.BatchNorm2d(256),
                    nn.PixelShuffle(2), nn.PReLU(),
                ]
            self.up = nn.Sequential(*up)
            self.conv3 = nn.Sequential(nn.Conv2d(64, 3, 9, 1, 4), nn.Tanh())

        def forward(self, x):
            o1 = self.conv1(x)
            o2 = self.conv2(self.res(o1))
            return self.conv3(self.up(o1 + o2))

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            layers, in_f = [], 3
            for i, out_f in enumerate([64, 128, 256, 512]):
                layers.append(nn.Conv2d(in_f, out_f, 3, 1, 1))
                if i != 0:
                    layers.append(nn.BatchNorm2d(out_f))
                layers += [
                    nn.LeakyReLU(0.2, inplace=True),
                    nn.Conv2d(out_f, out_f, 3, 2, 1),
                    nn.BatchNorm2d(out_f),
                    nn.LeakyReLU(0.2, inplace=True),
                ]
                in_f = out_f
            layers.append(nn.Conv2d(512, 1, 3, 1, 1))
            self.model = nn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    def vgg18():
        layers, in_c = [], 3
        for idx, spec in VGG19_LAYOUT:
            if idx >= 18:
                break
            if spec == "M":
                layers.append(nn.MaxPool2d(2, 2))
                continue
            layers.append(nn.Conv2d(in_c, spec, 3, 1, 1))
            in_c = spec
            if idx + 1 < 18:
                layers.append(nn.ReLU(inplace=True))
        fe = nn.Sequential(*layers)
        w = _sr_vgg_weights()
        ci = 0
        for idx, spec in VGG19_LAYOUT:
            if idx >= 18 or spec == "M":
                continue
            conv = [m for m in fe if isinstance(m, nn.Conv2d)][ci]
            conv.weight.data = torch.from_numpy(
                w[f"conv{idx}_kernel"].transpose(3, 2, 0, 1).copy()
            )
            conv.bias.data = torch.from_numpy(w[f"conv{idx}_bias"].copy())
            ci += 1
        for p in fe.parameters():
            p.requires_grad_(False)
        return fe

    return G, D, vgg18


def train_torch_srgan(out_dir: str, seed: int = 0) -> None:
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    Gc, Dc, vgg18 = _build_torch_srgan()
    g, d, fe = Gc(), Dc(), vgg18()
    fe.eval()  # srgan.py:62
    crit_gan, crit_content = nn.MSELoss(), nn.L1Loss()
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))

    lr_u8, hr_u8 = _sr_pairs(0, SR_N_TRAIN)
    lrs = np.transpose(_sr_norm(lr_u8), (0, 3, 1, 2))
    hrs = np.transpose(_sr_norm(hr_u8), (0, 3, 1, 2))
    order_rng = np.random.default_rng(seed)

    patch = SR_HR // 2 ** 4  # models.py:80
    valid = torch.ones(SR_BATCH, 1, patch, patch)
    fake = torch.zeros(SR_BATCH, 1, patch, patch)
    step, t0 = 0, time.time()
    while step < SR_STEPS:
        order = order_rng.permutation(SR_N_TRAIN)
        for i in range(0, SR_N_TRAIN - SR_BATCH + 1, SR_BATCH):
            imgs_lr = torch.from_numpy(lrs[order[i : i + SR_BATCH]])
            imgs_hr = torch.from_numpy(hrs[order[i : i + SR_BATCH]])
            opt_g.zero_grad()  # srgan.py:112-129
            gen_hr = g(imgs_lr)
            loss_gan = crit_gan(d(gen_hr), valid)
            loss_content = crit_content(fe(gen_hr), fe(imgs_hr).detach())
            loss_g = loss_content + 1e-3 * loss_gan
            loss_g.backward()
            opt_g.step()
            opt_d.zero_grad()  # srgan.py:135-145
            loss_d = (
                crit_gan(d(imgs_hr), valid)
                + crit_gan(d(gen_hr.detach()), fake)
            ) / 2
            loss_d.backward()
            opt_d.step()
            step += 1
            if step % 40 == 0:
                print(
                    f"[torch] step {step}/{SR_STEPS} d={loss_d.item():.4f} "
                    f"g={loss_g.item():.4f} ({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if step >= SR_STEPS:
                break

    g.eval()  # running-BN-stat sampling, mirrored by tpugan train=False
    lr_t, _ = _sr_pairs(1, N_EVAL)
    lt = np.transpose(_sr_norm(lr_t), (0, 3, 1, 2))
    with torch.no_grad():
        outs = [
            g(torch.from_numpy(lt[i : i + 64])).numpy()
            for i in range(0, N_EVAL, 64)
        ]
    sr = np.transpose(np.concatenate(outs), (0, 2, 3, 1))
    sr01 = np.clip(sr * _SR_STD + _SR_MEAN, 0.0, 1.0)
    samples = sr01 * 2.0 - 1.0
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"srgan64_torch_samples{_tag(seed)}.npy")
    np.save(path, samples.astype(np.float32))
    print(f"[torch] wrote {samples.shape} to {path}")


def train_tpugan_srgan(out_dir: str, seed: int = 0, cpu: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from tpugan.models import srgan as recipe
    from tpugan.models._common import apply_mod
    from tpugan.nn.sr import SRDiscriminator, SRGANGenerator
    from tpugan.nn.vgg import VGG19Features, load_vgg19_npz

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    cfg = recipe.Config(
        batch_size=SR_BATCH, hr_height=SR_HR, hr_width=SR_HR, seed=seed,
        synthetic_data=True,
    )
    modules = {
        "generator": SRGANGenerator(channels=3, n_residual_blocks=SR_RES),
        "discriminator": SRDiscriminator(),
        "vgg": VGG19Features(cut=18),
    }
    state = recipe.create_state(cfg, modules)
    # Overlay the SHARED numpy-deterministic He VGG weights (same arrays
    # the torch side loads) over the recipe's own random init.
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **_sr_vgg_weights())
        vgg_params = load_vgg19_npz(state.params["vgg"], f.name)
    state = state.replace(params={**state.params, "vgg": vgg_params})
    step_fn = jax.jit(recipe.make_step_pairs(cfg, modules), donate_argnums=0)

    lr_u8, hr_u8 = _sr_pairs(0, SR_N_TRAIN)
    lrs, hrs = _sr_norm(lr_u8), _sr_norm(hr_u8)
    order_rng = np.random.default_rng(seed)
    n, t0 = 0, time.time()
    while n < SR_STEPS:
        order = order_rng.permutation(SR_N_TRAIN)
        for i in range(0, SR_N_TRAIN - SR_BATCH + 1, SR_BATCH):
            state, out = step_fn(
                state,
                jnp.asarray(lrs[order[i : i + SR_BATCH]]),
                jnp.asarray(hrs[order[i : i + SR_BATCH]]),
            )
            n += 1
            if n % 40 == 0:
                print(
                    f"[tpugan] step {n}/{SR_STEPS} "
                    f"d={float(out['d_loss']):.4f} "
                    f"g={float(out['g_loss']):.4f} ({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if n >= SR_STEPS:
                break

    G = modules["generator"]

    @jax.jit
    def gen(params, bs, x):
        out, _ = apply_mod(G, params, bs, x, train=False)
        return out

    lr_t, _ = _sr_pairs(1, N_EVAL)
    lt = _sr_norm(lr_t)
    outs = [
        np.asarray(
            jax.device_get(
                gen(
                    state.params["generator"],
                    state.model_state["generator"],
                    jnp.asarray(lt[i : i + 64]),
                )
            )
        )
        for i in range(0, N_EVAL, 64)
    ]
    sr = np.concatenate(outs)
    sr01 = np.clip(sr * _SR_STD + _SR_MEAN, 0.0, 1.0)
    samples = sr01 * 2.0 - 1.0
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"srgan64_tpugan_samples{_tag(seed)}.npy")
    np.save(path, samples.astype(np.float32))
    print(f"[tpugan] wrote {samples.shape} to {path}")


def score_srgan(out_dir: str, seed: int = 0, backbone: str = "vgg") -> None:
    import jax.numpy as jnp

    from tpugan.metrics.fid import fid_from_features

    lr_t, hr_t = _sr_pairs(1, N_EVAL)
    hr01 = hr_t.astype(np.float32) / 255.0
    hr_pm1 = hr01 * 2.0 - 1.0
    fm = _feature_model(backbone)
    real_f = fm([jnp.asarray(hr_pm1[i : i + 256]) for i in range(0, N_EVAL, 256)])
    result = {
        "protocol": (
            f"srgan64 {SR_RES}res hr{SR_HR} b{SR_BATCH} {SR_STEPS} steps, "
            f"{N_EVAL} held-out pairs: mean per-image PSNR (denormalized "
            f"[0,1]) + FID of SR outputs vs held-out HR reals"
        ),
        "backbone": backbone,
        "seed": seed,
    }
    for side in ("torch", "tpugan"):
        path = os.path.join(out_dir, f"srgan64_{side}_samples{_tag(seed)}.npy")
        if not os.path.exists(path):
            result[side + "_fid"] = None
            continue
        s = np.load(path)
        s01 = (s + 1.0) / 2.0
        mse_per_img = ((s01 - hr01) ** 2).reshape(N_EVAL, -1).mean(axis=1)
        result[side + "_psnr"] = round(
            float(np.mean(10.0 * np.log10(1.0 / np.maximum(mse_per_img, 1e-10)))),
            3,
        )
        f = fm([jnp.asarray(s[i : i + 256]) for i in range(0, N_EVAL, 256)])
        result[side + "_fid"] = round(fid_from_features(real_f, f), 3)
    if result.get("torch_fid") and result.get("tpugan_fid"):
        result["fid_tpugan_vs_torch_pct"] = round(
            100.0
            * (result["tpugan_fid"] - result["torch_fid"])
            / result["torch_fid"],
            2,
        )
        result["psnr_delta_db"] = round(
            result["tpugan_psnr"] - result["torch_psnr"], 3
        )
    print(json.dumps(result))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dcgan", choices=sorted(IMG_BY_MODEL))
    ap.add_argument("--train_torch", action="store_true")
    ap.add_argument("--train_tpugan", action="store_true")
    ap.add_argument("--score", action="store_true")
    ap.add_argument("--out_dir", default="/tmp/fid_h2h")
    ap.add_argument("--seed", type=int, default=0,
                    help="training-side seed (reals stay seed 1)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the tpugan/score phases on CPU "
                         "(numerics-identical fp32)")
    ap.add_argument("--backbone", default="vgg", choices=("vgg", "inception"),
                    help="score-phase feature extractor (backbone-"
                         "sensitivity check; both He-random without npz)")
    args = ap.parse_args()
    if args.cpu:
        # Must land before any backend init; the sitecustomize pins
        # JAX_PLATFORMS=axon so plain env vars don't reach the backend.
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.model == "cyclegan64":
        if args.train_torch:
            train_torch_cyclegan(args.out_dir, seed=args.seed)
        if args.train_tpugan:
            train_tpugan_cyclegan(args.out_dir, seed=args.seed, cpu=args.cpu)
        if args.score:
            score_cyclegan(args.out_dir, seed=args.seed,
                           backbone=args.backbone)
    elif args.model == "srgan64":
        if args.train_torch:
            train_torch_srgan(args.out_dir, seed=args.seed)
        if args.train_tpugan:
            train_tpugan_srgan(args.out_dir, seed=args.seed, cpu=args.cpu)
        if args.score:
            score_srgan(args.out_dir, seed=args.seed, backbone=args.backbone)
    else:
        if args.train_torch:
            train_torch(args.model, args.out_dir, seed=args.seed)
        if args.train_tpugan:
            train_tpugan(args.model, args.out_dir, seed=args.seed, cpu=args.cpu)
        if args.score:
            score(args.model, args.out_dir, seed=args.seed,
                  backbone=args.backbone)
    if not (args.train_torch or args.train_tpugan or args.score):
        ap.error("pick at least one phase")


if __name__ == "__main__":
    main()
