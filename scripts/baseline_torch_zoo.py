"""PyTorch-CPU anchors for the remaining BASELINE.json acceptance configs.

Companion to scripts/baseline_torch.py (DCGAN) and
scripts/baseline_torch_cyclegan.py (CycleGAN 256px): re-creates the
reference training step in plain torch (torchvision isn't installed, and
for throughput the VGG19 extractor only needs the architecture — random
weights have identical FLOPs) and times images/sec on this host's single
CPU core. tpugan counterparts: scripts/bench_zoo.py.

Configs (reference defaults):
- gan      gan/gan.py:21-28        MLP G/D, 28px, batch 64, BCE Adam
- wgan_gp  wgan_gp/wgan_gp.py:23-31 MLP G/critic, n_critic=5, GP lambda 10
- srgan    srgan/srgan.py:38-46     SRResNet-16 G, VGG[:18] content, 256px b4
- esrgan   esrgan/esrgan.py:38-52   RRDB-23 G, RaGAN + VGG[:35], 256px b4
           (steady-state full step, i.e. past --warmup_batches)
"""

import argparse
import time

import numpy as np
import torch
import torch.nn as nn


def mlp_g(latent, img_elems):
    def block(i, o, bn=True):
        layers = [nn.Linear(i, o)]
        if bn:
            layers.append(nn.BatchNorm1d(o, 0.8))
        layers.append(nn.LeakyReLU(0.2, inplace=True))
        return layers

    return nn.Sequential(
        *block(latent, 128, bn=False), *block(128, 256), *block(256, 512),
        *block(512, 1024), nn.Linear(1024, img_elems), nn.Tanh(),
    )


def mlp_d(img_elems, sigmoid):
    tail = [nn.Sigmoid()] if sigmoid else []
    return nn.Sequential(
        nn.Linear(img_elems, 512), nn.LeakyReLU(0.2, inplace=True),
        nn.Linear(512, 256), nn.LeakyReLU(0.2, inplace=True),
        nn.Linear(256, 1), *tail,
    )


def vgg_features(cut18: bool):
    """VGG19 conv trunk: cut18 = features[:18] (SRGAN); else features[:35]
    (ESRGAN's VGG54 cut, ends on conv5_4 pre-activation)."""
    plan18 = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256]
    plan35 = plan18 + ["M", 512, 512, 512, 512, "M", 512, 512, 512, 512]
    layers, c_in = [], 3
    plan = plan18 if cut18 else plan35
    for i, p in enumerate(plan):
        if p == "M":
            layers.append(nn.MaxPool2d(2))
            continue
        layers.append(nn.Conv2d(c_in, p, 3, 1, 1))
        last = i == len(plan) - 1
        if cut18 or not last:  # [:35] stops BEFORE conv5_4's ReLU
            layers.append(nn.ReLU(inplace=True))
        c_in = p
    return nn.Sequential(*layers)


class SRResNet(nn.Module):
    def __init__(self, n_blocks=16):
        super().__init__()
        self.head = nn.Sequential(nn.Conv2d(3, 64, 9, 1, 4), nn.PReLU())

        def res():
            return nn.Sequential(
                nn.Conv2d(64, 64, 3, 1, 1), nn.BatchNorm2d(64, 0.8), nn.PReLU(),
                nn.Conv2d(64, 64, 3, 1, 1), nn.BatchNorm2d(64, 0.8),
            )

        self.blocks = nn.ModuleList([res() for _ in range(n_blocks)])
        self.post = nn.Sequential(nn.Conv2d(64, 64, 3, 1, 1), nn.BatchNorm2d(64, 0.8))
        up = []
        for _ in range(2):
            up += [nn.Conv2d(64, 256, 3, 1, 1), nn.BatchNorm2d(256),
                   nn.PixelShuffle(2), nn.PReLU()]
        self.up = nn.Sequential(*up)
        self.tail = nn.Sequential(nn.Conv2d(64, 3, 9, 1, 4), nn.Tanh())

    def forward(self, x):
        h0 = self.head(x)
        h = h0
        for b in self.blocks:
            h = h + b(h)
        return self.tail(self.up(h0 + self.post(h)))


class DenseBlock(nn.Module):
    def __init__(self, f=64):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Conv2d(f * (k + 1), f, 3, 1, 1) for k in range(5)]
        )

    def forward(self, x):
        cat = x
        for k, c in enumerate(self.convs):
            out = c(cat)
            if k < 4:
                out = nn.functional.leaky_relu(out, 0.01)
            cat = torch.cat([cat, out], 1)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    def __init__(self, n_blocks=23):
        super().__init__()
        self.head = nn.Conv2d(3, 64, 3, 1, 1)
        self.blocks = nn.ModuleList(
            [nn.Sequential(DenseBlock(), DenseBlock(), DenseBlock())
             for _ in range(n_blocks)]
        )
        self.post = nn.Conv2d(64, 64, 3, 1, 1)
        up = []
        for _ in range(2):
            up += [nn.Conv2d(64, 256, 3, 1, 1), nn.LeakyReLU(0.01),
                   nn.PixelShuffle(2)]
        self.up = nn.Sequential(*up)
        self.tail = nn.Sequential(
            nn.Conv2d(64, 64, 3, 1, 1), nn.LeakyReLU(0.01),
            nn.Conv2d(64, 3, 3, 1, 1),
        )

    def forward(self, x):
        h0 = self.head(x)
        h = h0
        for b in self.blocks:
            h = b(h) * 0.2 + h
        return self.tail(self.up(h0 + self.post(h)))


def sr_discriminator():
    """Shared VGG-style patch D (srgan/models.py:75-107 ==
    esrgan/models.py:95-126, sans sigmoid — both output raw maps)."""
    layers, c_in = [], 3
    for i, f in enumerate([64, 128, 256, 512]):
        layers.append(nn.Conv2d(c_in, f, 3, 1, 1))
        if i:
            layers.append(nn.BatchNorm2d(f))
        layers += [nn.LeakyReLU(0.2, inplace=True), nn.Conv2d(f, f, 3, 2, 1),
                   nn.BatchNorm2d(f), nn.LeakyReLU(0.2, inplace=True)]
        c_in = f
    layers.append(nn.Conv2d(512, 1, 3, 1, 1))
    return nn.Sequential(*layers)


def time_steps(step, warmup, n, images_per_step, label):
    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(f"torch-cpu {label} images/sec: {n * images_per_step / dt:.4f} "
          f"({dt / n:.1f} s/step over {n} steps)")


def run_gan():
    torch.manual_seed(0)
    B, L, E = 64, 100, 28 * 28
    g, d = mlp_g(L, E), mlp_d(E, sigmoid=True)
    bce = nn.BCELoss()
    og = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    od = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    real = torch.randn(B, E)
    ones, zeros = torch.ones(B, 1), torch.zeros(B, 1)

    def step():
        og.zero_grad()
        gen = g(torch.randn(B, L))
        bce(d(gen), ones).backward()
        og.step()
        od.zero_grad()
        (0.5 * (bce(d(real), ones) + bce(d(gen.detach()), zeros))).backward()
        od.step()

    time_steps(step, 3, 30, B, "gan mlp 28px")


def run_wgan_gp():
    torch.manual_seed(0)
    B, L, E, NC = 64, 100, 28 * 28, 5
    g, d = mlp_g(L, E), mlp_d(E, sigmoid=False)
    og = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    od = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    real = torch.randn(B, E)

    def d_step():
        # wgan_gp.py:162-175: fake_imgs is NOT detached in the critic loss
        # (the backward flows through G — a real cost the reference pays);
        # only the GP interpolates use .data.
        od.zero_grad()
        z = torch.randn(B, L)
        fake = g(z)
        alpha = torch.rand(B, 1)
        inter = (alpha * real + (1 - alpha) * fake.detach()).requires_grad_(True)
        d_inter = d(inter)
        grads = torch.autograd.grad(
            d_inter, inter, grad_outputs=torch.ones_like(d_inter),
            create_graph=True,
        )[0]
        gp = ((grads.norm(2, dim=1) - 1) ** 2).mean()
        (-d(real).mean() + d(fake).mean() + 10 * gp).backward()
        od.step()
        return z

    def g_step(z):
        og.zero_grad()
        (-d(g(z)).mean()).backward()
        og.step()

    def unit():
        # wgan_gp.py:144-203: critic on every batch, G on every NC-th,
        # reusing that batch's z.
        z = d_step()
        g_step(z)
        for _ in range(NC - 1):
            d_step()

    time_steps(unit, 2, 10, NC * B, "wgan_gp mlp 28px (per critic batch)")


def run_sr(model):
    torch.manual_seed(0)
    B, HR = 4, 256
    lr_imgs = torch.randn(B, 3, HR // 4, HR // 4)
    hr_imgs = torch.randn(B, 3, HR, HR)
    if model == "srgan":
        g, vgg = SRResNet(16), vgg_features(cut18=True)
        betas = (0.5, 0.999)
    else:
        g, vgg = RRDBNet(23), vgg_features(cut18=False)
        betas = (0.9, 0.999)
    d = sr_discriminator()
    for p in vgg.parameters():
        p.requires_grad_(False)
    og = torch.optim.Adam(g.parameters(), lr=2e-4, betas=betas)
    od = torch.optim.Adam(d.parameters(), lr=2e-4, betas=betas)
    mse, l1, bcel = nn.MSELoss(), nn.L1Loss(), nn.BCEWithLogitsLoss()

    def srgan_step():
        og.zero_grad()
        gen = g(lr_imgs)
        adv = mse(torch.sigmoid(d(gen)), torch.ones(B, 1, 16, 16))
        content = l1(vgg(gen), vgg(hr_imgs).detach())
        (content + 1e-3 * adv).backward()
        og.step()
        od.zero_grad()
        dr = mse(torch.sigmoid(d(hr_imgs)), torch.ones(B, 1, 16, 16))
        df = mse(torch.sigmoid(d(gen.detach())), torch.zeros(B, 1, 16, 16))
        (0.5 * (dr + df)).backward()
        od.step()

    def esrgan_step():
        # esrgan.py:110-165 steady state (past warmup_batches).
        ones = torch.ones(B, 1, 16, 16)
        zeros = torch.zeros(B, 1, 16, 16)
        og.zero_grad()
        gen = g(lr_imgs)
        pix = l1(gen, hr_imgs)
        pr = d(hr_imgs).detach()
        pf = d(gen)
        adv = bcel(pf - pr.mean(0, keepdim=True), ones)
        content = l1(vgg(gen), vgg(hr_imgs).detach())
        (content + 5e-3 * adv + 1e-2 * pix).backward()
        og.step()
        od.zero_grad()
        pr = d(hr_imgs)
        pf = d(gen.detach())
        (0.5 * (bcel(pr - pf.mean(0, keepdim=True), ones)
                + bcel(pf - pr.mean(0, keepdim=True), zeros))).backward()
        od.step()

    step = srgan_step if model == "srgan" else esrgan_step
    time_steps(step, 1, 2, B, f"{model} 256px b4")


def run_pix2pix():
    """U-Net G + conditional PatchGAN D, 256px, batch 1 (the reference's
    own defaults, pix2pix.py:24-41). Imports the reference models.py
    directly (read-only) so the anchor is the reference's exact module
    graph; step schedule = pix2pix.py:119-186 (G: MSE adv + 100*L1 pixel;
    D: 0.5*(real+fake) MSE on the 16x16 patch map)."""
    import sys

    path = "/root/reference/implementations/pix2pix"
    sys.path.insert(0, path)
    import models as rm

    sys.path.remove(path)
    del sys.modules["models"]
    torch.manual_seed(0)
    B, IMG = 1, 256
    g = rm.GeneratorUNet()
    d = rm.Discriminator()
    g.apply(rm.weights_init_normal)
    d.apply(rm.weights_init_normal)
    og = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    od = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    mse, l1 = nn.MSELoss(), nn.L1Loss()
    real_a = torch.randn(B, 3, IMG, IMG)
    real_b = torch.randn(B, 3, IMG, IMG)
    valid = torch.ones(B, 1, IMG // 16, IMG // 16)
    zeros = torch.zeros(B, 1, IMG // 16, IMG // 16)

    def step():
        og.zero_grad()
        fake_b = g(real_a)
        (mse(d(fake_b, real_a), valid) + 100 * l1(fake_b, real_b)).backward()
        og.step()
        od.zero_grad()
        (0.5 * (mse(d(real_b, real_a), valid)
                + mse(d(fake_b.detach(), real_a), zeros))).backward()
        od.step()

    time_steps(step, 2, 6, B, "pix2pix 256px b1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["gan", "wgan_gp", "srgan", "esrgan", "pix2pix"])
    args = ap.parse_args()
    torch.set_num_threads(1)  # the host exposes one core; avoid oversubscription
    if args.model == "gan":
        run_gan()
    elif args.model == "wgan_gp":
        run_wgan_gp()
    elif args.model == "pix2pix":
        run_pix2pix()
    else:
        run_sr(args.model)


if __name__ == "__main__":
    main()
