"""PyTorch-CPU anchor for the 256px CycleGAN benchmark config.

Re-creates the reference CycleGAN training step (cyclegan/models.py
architectures; full G phase with identity+adv+cycle losses over both
directions, then both D updates) in plain torch and times images/sec on CPU
at 256px, batch 1 — the reference's own default config (cyclegan.py:28,34).
Replay buffers are identity here (buffer fill phase) — same compute.
"""

import time

import torch
import torch.nn as nn

IMG, BATCH, RES = 256, 1, 9


class ResBlock(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.block = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(f, f, 3), nn.InstanceNorm2d(f),
            nn.ReLU(inplace=True),
            nn.ReflectionPad2d(1), nn.Conv2d(f, f, 3), nn.InstanceNorm2d(f),
        )

    def forward(self, x):
        return x + self.block(x)


class G(nn.Module):
    def __init__(self):
        super().__init__()
        layers = [
            nn.ReflectionPad2d(3), nn.Conv2d(3, 64, 7), nn.InstanceNorm2d(64),
            nn.ReLU(inplace=True),
        ]
        f = 64
        for _ in range(2):
            layers += [nn.Conv2d(f, f * 2, 3, 2, 1), nn.InstanceNorm2d(f * 2),
                       nn.ReLU(inplace=True)]
            f *= 2
        layers += [ResBlock(f) for _ in range(RES)]
        for _ in range(2):
            layers += [nn.Upsample(scale_factor=2),
                       nn.Conv2d(f, f // 2, 3, 1, 1),
                       nn.InstanceNorm2d(f // 2), nn.ReLU(inplace=True)]
            f //= 2
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(64, 3, 7), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class D(nn.Module):
    def __init__(self):
        super().__init__()

        def block(i, o, norm=True):
            layers = [nn.Conv2d(i, o, 4, 2, 1)]
            if norm:
                layers.append(nn.InstanceNorm2d(o))
            layers.append(nn.LeakyReLU(0.2, inplace=True))
            return layers

        self.model = nn.Sequential(
            *block(3, 64, False), *block(64, 128), *block(128, 256),
            *block(256, 512), nn.ZeroPad2d((1, 0, 1, 0)),
            nn.Conv2d(512, 1, 4, padding=1),
        )

    def forward(self, x):
        return self.model(x)


def main():
    torch.manual_seed(0)
    g_ab, g_ba, d_a, d_b = G(), G(), D(), D()
    mse, l1 = nn.MSELoss(), nn.L1Loss()
    import itertools

    og = torch.optim.Adam(
        itertools.chain(g_ab.parameters(), g_ba.parameters()), lr=2e-4,
        betas=(0.5, 0.999),
    )
    oda = torch.optim.Adam(d_a.parameters(), lr=2e-4, betas=(0.5, 0.999))
    odb = torch.optim.Adam(d_b.parameters(), lr=2e-4, betas=(0.5, 0.999))
    real_a = torch.randn(BATCH, 3, IMG, IMG)
    real_b = torch.randn(BATCH, 3, IMG, IMG)
    valid = torch.ones(BATCH, 1, IMG // 16, IMG // 16)
    fake = torch.zeros(BATCH, 1, IMG // 16, IMG // 16)

    def step():
        og.zero_grad()
        loss_id = (l1(g_ba(real_a), real_a) + l1(g_ab(real_b), real_b)) / 2
        fake_b = g_ab(real_a)
        fake_a = g_ba(real_b)
        loss_gan = (mse(d_b(fake_b), valid) + mse(d_a(fake_a), valid)) / 2
        loss_cyc = (l1(g_ba(fake_b), real_a) + l1(g_ab(fake_a), real_b)) / 2
        (loss_gan + 10 * loss_cyc + 5 * loss_id).backward()
        og.step()
        oda.zero_grad()
        ((mse(d_a(real_a), valid) + mse(d_a(fake_a.detach()), fake)) / 2).backward()
        oda.step()
        odb.zero_grad()
        ((mse(d_b(real_b), valid) + mse(d_b(fake_b.detach()), fake)) / 2).backward()
        odb.step()

    step()  # warmup
    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(f"torch-cpu cyclegan 256px images/sec: {n * BATCH / dt:.3f}")


if __name__ == "__main__":
    main()
