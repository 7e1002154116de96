"""LSGAN (Mao et al. 2017) — least-squares GAN.

Reference: /root/reference/implementations/lsgan/lsgan.py — the DCGAN
template with MSE adversarial loss ("!!! Minimizes MSE instead of BCE",
lsgan.py:101-102), generator without the first BatchNorm (lsgan.py:52-70)
and discriminator head without Sigmoid (lsgan.py:90-96);
weights_init_normal on both (lsgan.py:114-115).
"""

from __future__ import annotations

import dataclasses

from tpugan.losses import mse
from tpugan.models import dcgan as _dcgan
from tpugan.models._common import run_mnist_recipe
from tpugan.models._template_b import create_state_b, make_step_b
from tpugan.nn.blocks import DCGANDiscriminator, DCGANGenerator
from tpugan.utils.config import config_from_args

NAME = "lsgan"


@dataclasses.dataclass
class Config(_dcgan.Config):
    # Flag parity with lsgan.py:20-32 (identical set/defaults to dcgan).
    pass


def build(cfg: Config):
    return {
        "generator": DCGANGenerator(
            img_size=cfg.img_size,
            channels=cfg.channels,
            first_bn=False,
            init_mode="normal02",
        ),
        "discriminator": DCGANDiscriminator(sigmoid=False, init_mode="normal02"),
    }


def create_state(cfg: Config, modules=None):
    return create_state_b(cfg, modules or build(cfg))


def make_step(cfg: Config, modules=None):
    return make_step_b(cfg, modules or build(cfg), mse)


make_loader = _dcgan.make_loader


def run(cfg: Config):
    import tpugan.models.lsgan as m

    return run_mnist_recipe(cfg, m)


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
