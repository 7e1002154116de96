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
- scoring: 1024 samples per side vs the SAME 1024 held-out reals (seed 1)
  through the SAME feature extractor (tpugan.metrics.fid.VGGFeatureModel,
  deterministic He-random features, PRNGKey(0)).

Phases (separable so the torch CPU run and the TPU run never share the
machine):

    python scripts/fid_headtohead.py --train_torch   # ~20 min, CPU only
    python scripts/fid_headtohead.py --train_tpugan  # ~1 min on the chip
    python scripts/fid_headtohead.py --score         # JSON verdict line

Artifacts land in --out_dir (default /tmp/fid_h2h): <side>_samples.npy,
float32 NHWC in [-1, 1].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG, BATCH, LATENT, STEPS, N_EVAL = 32, 64, 100, 640, 1024


def _dataset():
    from tpugan.data.sources import synthetic_image_dataset

    return synthetic_image_dataset(4096, IMG, 1, seed=0)


def train_torch(out_dir: str) -> None:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    # Reference dcgan.py:45-99 architectures at img_size=32 (init_size 8,
    # D downsample 32/2^4 = 2).
    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.init_size = IMG // 4
            self.l1 = nn.Sequential(nn.Linear(LATENT, 128 * self.init_size**2))
            self.conv_blocks = nn.Sequential(
                nn.BatchNorm2d(128),
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
            self.adv_layer = nn.Sequential(nn.Linear(128 * ds**2, 1), nn.Sigmoid())

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

    g, d = G(), D()
    g.apply(weights_init_normal)
    d.apply(weights_init_normal)
    adversarial_loss = nn.BCELoss()
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))

    ds = _dataset()
    # (N, 1, 32, 32) in [-1, 1] — transforms.Normalize([0.5], [0.5]) on /255.
    data = (ds.images.astype(np.float32) / 255.0 - 0.5) / 0.5
    data = np.transpose(data, (0, 3, 1, 2))
    shuffle_rng = np.random.default_rng(0)

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
    np.save(os.path.join(out_dir, "torch_samples.npy"), samples)
    print(f"[torch] wrote {samples.shape} to {out_dir}/torch_samples.npy")


def train_tpugan(out_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from tpugan.data import DeviceLoader
    from tpugan.models import dcgan
    from tpugan.models._common import apply_mod

    cfg = dcgan.Config(img_size=IMG, batch_size=BATCH, seed=0, synthetic_data=True)
    modules = dcgan.build(cfg)
    state = dcgan.create_state(cfg, modules)
    step_fn = jax.jit(dcgan.make_step(cfg, modules), donate_argnums=0)

    ds = _dataset()
    loader = DeviceLoader([ds.images, ds.labels], BATCH, shuffle=True, seed=0)
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
        out, _ = apply_mod(G, params, g_bs, z, train=True)
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
    np.save(os.path.join(out_dir, "tpugan_samples.npy"), samples)
    print(f"[tpugan] wrote {samples.shape} to {out_dir}/tpugan_samples.npy")


def score(out_dir: str) -> None:
    import jax.numpy as jnp

    from tpugan.data.sources import synthetic_image_dataset
    from tpugan.metrics.fid import VGGFeatureModel, fid_from_features

    reals = synthetic_image_dataset(N_EVAL, IMG, 1, seed=1)
    real_x = (reals.images.astype(np.float32) / 255.0) * 2.0 - 1.0

    model = VGGFeatureModel()
    real_f = model([jnp.asarray(real_x[i : i + 256]) for i in range(0, N_EVAL, 256)])
    result = {"protocol": f"dcgan {IMG}px b{BATCH} {STEPS} steps, "
                          f"{N_EVAL} samples vs held-out reals"}
    for side in ("torch", "tpugan"):
        path = os.path.join(out_dir, f"{side}_samples.npy")
        if not os.path.exists(path):
            result[side] = None
            continue
        s = np.load(path)
        f = model([jnp.asarray(s[i : i + 256]) for i in range(0, N_EVAL, 256)])
        result[side] = round(fid_from_features(real_f, f), 3)
    if result.get("torch") and result.get("tpugan"):
        result["tpugan_vs_torch_pct"] = round(
            100.0 * (result["tpugan"] - result["torch"]) / result["torch"], 2
        )
    print(json.dumps(result))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_torch", action="store_true")
    ap.add_argument("--train_tpugan", action="store_true")
    ap.add_argument("--score", action="store_true")
    ap.add_argument("--out_dir", default="/tmp/fid_h2h")
    args = ap.parse_args()
    if args.train_torch:
        train_torch(args.out_dir)
    if args.train_tpugan:
        train_tpugan(args.out_dir)
    if args.score:
        score(args.out_dir)
    if not (args.train_torch or args.train_tpugan or args.score):
        ap.error("pick at least one phase")


if __name__ == "__main__":
    main()
