"""Super-resolution generators + the shared SR discriminator.

Sources: /root/reference/implementations/srgan/models.py (SRResNet G with
PReLU residual blocks + PixelShuffle upsampling, :18-71; 8-conv D, :74-105)
and esrgan/models.py (RRDB generator: residual-in-residual dense blocks
with 0.2 scaling and no norms, :18-93; same D family, :96-127).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpugan.nn.layers import BatchNorm, Conv, PixelShuffle, PReLU, leaky_relu


class SRResidualBlock(nn.Module):
    """srgan/models.py:18-30: Conv-BN(0.8)-PReLU-Conv-BN(0.8) + skip."""

    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = Conv(self.features, 3, 1, 1, init_mode="torch")(x)
        y = BatchNorm(eps=0.8)(y, train=train)
        y = PReLU()(y)
        y = Conv(self.features, 3, 1, 1, init_mode="torch")(y)
        y = BatchNorm(eps=0.8)(y, train=train)
        return x + y


class SRGANGenerator(nn.Module):
    """srgan/models.py:33-71 (SRResNet, 4x upsample)."""

    channels: int = 3
    n_residual_blocks: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        out1 = Conv(64, 9, 1, 4, init_mode="torch")(x)
        out1 = PReLU()(out1)
        y = out1
        for _ in range(self.n_residual_blocks):
            y = SRResidualBlock()(y, train=train)
        y = Conv(64, 3, 1, 1, init_mode="torch")(y)
        y = BatchNorm(eps=0.8)(y, train=train)
        y = out1 + y
        for _ in range(2):
            y = Conv(256, 3, 1, 1, init_mode="torch")(y)
            y = BatchNorm()(y, train=train)  # default eps here (models.py:55)
            y = PixelShuffle(2)(y)
            y = PReLU()(y)
        y = Conv(self.channels, 9, 1, 4, init_mode="torch")(y)
        return jnp.tanh(y)


class DenseResidualBlock(nn.Module):
    """esrgan/models.py:18-45: five 3x3 convs over dense concats; the last
    conv (no activation) output is scaled by 0.2 and added to the input."""

    filters: int = 64
    res_scale: float = 0.2

    @nn.compact
    def __call__(self, x):
        # The list form declares the dense concat to Conv, which lowers it
        # through the channel-split path when TPUGAN_DENSE_SPLIT=1 (no
        # concat buffer is ever materialized) and through an ordinary
        # jnp.concatenate otherwise — identical param tree either way
        # (nn/layers.py:_SplitConv).
        parts = [x]
        out = None
        for i in range(5):
            out = Conv(self.filters, 3, 1, 1, init_mode="torch")(parts)
            if i < 4:
                out = leaky_relu(out, 0.01)  # torch nn.LeakyReLU() default
            parts = parts + [out]
        return out * self.res_scale + x


class RRDB(nn.Module):
    """esrgan/models.py:48-57: three dense blocks, 0.2-scaled skip."""

    filters: int = 64
    res_scale: float = 0.2

    @nn.compact
    def __call__(self, x):
        y = x
        for _ in range(3):
            y = DenseResidualBlock(self.filters)(y)
        return y * self.res_scale + x


class ESRGANGenerator(nn.Module):
    """esrgan/models.py:60-93 (GeneratorRRDB)."""

    channels: int = 3
    filters: int = 64
    num_res_blocks: int = 16
    num_upsample: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        out1 = Conv(self.filters, 3, 1, 1, init_mode="torch")(x)
        y = out1
        for _ in range(self.num_res_blocks):
            y = RRDB(self.filters)(y)
        y = Conv(self.filters, 3, 1, 1, init_mode="torch")(y)
        y = out1 + y
        for _ in range(self.num_upsample):
            y = Conv(self.filters * 4, 3, 1, 1, init_mode="torch")(y)
            y = leaky_relu(y, 0.01)
            y = PixelShuffle(2)(y)
        y = Conv(self.filters, 3, 1, 1, init_mode="torch")(y)
        y = leaky_relu(y, 0.01)
        return Conv(self.channels, 3, 1, 1, init_mode="torch")(y)


class SRDiscriminator(nn.Module):
    """srgan/models.py:74-105 == esrgan/models.py:96-127: four double-conv
    blocks (s1 then s2) with BatchNorm (default eps) except the very first
    conv, 3x3 head; patch = H/16 x W/16; raw output (MSE in srgan,
    BCEWithLogits in esrgan)."""

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for i, f in enumerate((64, 128, 256, 512)):
            x = Conv(f, 3, 1, 1, init_mode="torch")(x)
            if i > 0:
                x = BatchNorm()(x, train=train)
            x = leaky_relu(x, 0.2)
            x = Conv(f, 3, 2, 1, init_mode="torch")(x)
            x = BatchNorm()(x, train=train)
            x = leaky_relu(x, 0.2)
        return Conv(1, 3, 1, 1, init_mode="torch")(x)
