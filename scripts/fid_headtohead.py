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
"DCGAN + LSGAN ... FID within 5%" row).

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
# dcgan.py:27 / gan.py:27 / lsgan.py:27 img_size defaults
IMG_BY_MODEL = {"dcgan": 32, "gan": 28, "lsgan": 32}


def _img(model):
    return IMG_BY_MODEL[model]


def _dataset(model):
    from tpugan.data.sources import synthetic_image_dataset

    return synthetic_image_dataset(4096, _img(model), 1, seed=0)


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
                nn.Conv2d(64, 1, 3, stride=1, padding=1),
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
                *block(1, 16, bn=False), *block(16, 32), *block(32, 64),
                *block(64, 128),
            )
            ds = IMG // 2**4
            head = [nn.Linear(128 * ds**2, 1)]
            if not lsgan:
                head.append(nn.Sigmoid())
            self.adv_layer = nn.Sequential(*head)

        def forward(self, img):
            out = self.model(img).view(img.shape[0], -1)
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
    recipe = importlib.import_module(f"tpugan.models.{model}")
    cfg = recipe.Config(img_size=IMG, batch_size=BATCH, seed=seed, synthetic_data=True)
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


def score(model: str, out_dir: str, seed: int = 0) -> None:
    import jax.numpy as jnp

    from tpugan.data.sources import synthetic_image_dataset
    from tpugan.metrics.fid import VGGFeatureModel, fid_from_features

    IMG = _img(model)
    reals = synthetic_image_dataset(N_EVAL, IMG, 1, seed=1)
    real_x = (reals.images.astype(np.float32) / 255.0) * 2.0 - 1.0

    fm = VGGFeatureModel()
    real_f = fm([jnp.asarray(real_x[i : i + 256]) for i in range(0, N_EVAL, 256)])
    result = {"protocol": f"{model} {IMG}px b{BATCH} {STEPS} steps, "
                          f"{N_EVAL} samples vs held-out reals",
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
    args = ap.parse_args()
    if args.cpu:
        # Must land before any backend init; the sitecustomize pins
        # JAX_PLATFORMS=axon so plain env vars don't reach the backend.
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.train_torch:
        train_torch(args.model, args.out_dir, seed=args.seed)
    if args.train_tpugan:
        train_tpugan(args.model, args.out_dir, seed=args.seed, cpu=args.cpu)
    if args.score:
        score(args.model, args.out_dir, seed=args.seed)
    if not (args.train_torch or args.train_tpugan or args.score):
        ap.error("pick at least one phase")


if __name__ == "__main__":
    main()
