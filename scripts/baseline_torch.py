"""Measure the PyTorch-CPU reference anchor for bench.py.

Re-creates the reference DCGAN training step (dcgan/dcgan.py architectures
and 1:1 BCE Adam schedule) in plain torch (torchvision isn't installed here
and isn't needed for throughput) and times images/sec on CPU at 64px, batch
64 — the comparison anchor recorded in BASELINE.md. The reference repo
publishes no performance numbers (BASELINE.md), so this measured anchor is
the ``vs_baseline`` denominator.
"""

import time

import numpy as np
import torch
import torch.nn as nn

IMG, BATCH, LATENT = 64, 64, 100


class G(nn.Module):
    def __init__(self):
        super().__init__()
        self.init_size = IMG // 4
        self.l1 = nn.Linear(LATENT, 128 * self.init_size**2)
        self.conv = nn.Sequential(
            nn.BatchNorm2d(128),
            nn.Upsample(scale_factor=2),
            nn.Conv2d(128, 128, 3, 1, 1),
            nn.BatchNorm2d(128, 0.8),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Upsample(scale_factor=2),
            nn.Conv2d(128, 64, 3, 1, 1),
            nn.BatchNorm2d(64, 0.8),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Conv2d(64, 1, 3, 1, 1),
            nn.Tanh(),
        )

    def forward(self, z):
        out = self.l1(z).view(z.shape[0], 128, self.init_size, self.init_size)
        return self.conv(out)


class D(nn.Module):
    def __init__(self):
        super().__init__()

        def block(i, o, bn=True):
            layers = [nn.Conv2d(i, o, 3, 2, 1), nn.LeakyReLU(0.2, inplace=True),
                      nn.Dropout2d(0.25)]
            if bn:
                layers.append(nn.BatchNorm2d(o, 0.8))
            return layers

        self.model = nn.Sequential(
            *block(1, 16, bn=False), *block(16, 32), *block(32, 64),
            *block(64, 128),
        )
        ds = IMG // 2**4
        self.adv = nn.Sequential(nn.Linear(128 * ds**2, 1), nn.Sigmoid())

    def forward(self, img):
        out = self.model(img).view(img.shape[0], -1)
        return self.adv(out)


def main():
    torch.manual_seed(0)
    g, d = G(), D()
    loss = nn.BCELoss()
    og = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    od = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    real = torch.from_numpy(
        np.random.default_rng(0).normal(size=(BATCH, 1, IMG, IMG)).astype(np.float32)
    )
    valid = torch.ones(BATCH, 1)
    fake = torch.zeros(BATCH, 1)

    def step():
        og.zero_grad()
        z = torch.randn(BATCH, LATENT)
        gen = g(z)
        g_loss = loss(d(gen), valid)
        g_loss.backward()
        og.step()
        od.zero_grad()
        d_loss = 0.5 * (loss(d(real), valid) + loss(d(gen.detach()), fake))
        d_loss.backward()
        od.step()

    for _ in range(3):
        step()
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(f"torch-cpu dcgan 64px images/sec: {n * BATCH / dt:.1f}")


if __name__ == "__main__":
    main()
