"""DCGAN (Radford et al. 2016).

Reference: /root/reference/implementations/dcgan/dcgan.py — conv G
(Linear -> reshape -> 2x[Upsample, Conv3x3, BN(eps=0.8), LeakyReLU] -> Conv
-> Tanh, dcgan.py:45-71) and conv D (4 stride-2 conv blocks with Dropout2d
and BN, dcgan.py:74-99) on MNIST at 32px, BCE 1:1 Adam updates
(dcgan.py:143-183), weights_init_normal on both (dcgan.py:36-42,108-109).
This is the BASELINE.json 64px throughput workload.
"""

from __future__ import annotations

import dataclasses

from tpugan.data import DeviceLoader, mnist_or_synthetic
from tpugan.losses import bce
from tpugan.models._common import run_mnist_recipe
from tpugan.models._template_b import create_state_b, make_step_b
from tpugan.nn.blocks import DCGANDiscriminator, DCGANGenerator
from tpugan.utils.config import BaseConfig, config_from_args, flag

NAME = "dcgan"


@dataclasses.dataclass
class Config(BaseConfig):
    # Flag parity with dcgan.py:20-32.
    n_epochs: int = flag(200, "number of epochs of training")
    batch_size: int = flag(64, "size of the batches")
    lr: float = flag(0.0002, "adam: learning rate")
    b1: float = flag(0.5, "adam: decay of first order momentum of gradient")
    b2: float = flag(0.999, "adam: decay of first order momentum of gradient")
    n_cpu: int = flag(8, "number of cpu threads to use during batch generation")
    latent_dim: int = flag(100, "dimensionality of the latent space")
    img_size: int = flag(32, "size of each image dimension")
    channels: int = flag(1, "number of image channels")
    sample_interval: int = flag(400, "interval between image sampling")


def build(cfg: Config):
    return {
        "generator": DCGANGenerator(
            img_size=cfg.img_size, channels=cfg.channels, init_mode="normal02"
        ),
        "discriminator": DCGANDiscriminator(sigmoid=True, init_mode="normal02"),
    }


def create_state(cfg: Config, modules=None):
    return create_state_b(cfg, modules or build(cfg))


def make_step(cfg: Config, modules=None):
    return make_step_b(cfg, modules or build(cfg), bce)


def make_loader(cfg: Config, sharding=None) -> DeviceLoader:
    ds, is_real = mnist_or_synthetic(
        cfg.data_dir,
        img_size=cfg.img_size,
        channels=cfg.channels,
        synthetic=cfg.synthetic_data,
        seed=cfg.seed,
    )
    if not is_real:
        print("[tpugan] MNIST not found on disk — using synthetic dataset")
    return DeviceLoader(
        [ds.images, ds.labels],
        cfg.batch_size,
        shuffle=True,
        seed=cfg.seed,
        sharding=sharding,
    )


def run(cfg: Config):
    return run_mnist_recipe(cfg, _this())


def _this():
    import tpugan.models.dcgan as m

    return m


def main(argv=None):
    run(config_from_args(Config, argv))


if __name__ == "__main__":
    main()
