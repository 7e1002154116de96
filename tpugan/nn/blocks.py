"""Shared generator/discriminator architectures.

The reference's 33 scripts reuse three architecture templates (SURVEY.md
§2.2): A = MLP G/D on flat images, B = DCGAN-style conv G/D, C =
image-to-image (U-Net / ResNet G + PatchGAN D, in ``tpugan.nn.im2im``).
Templates A and B live here, parameterized by the per-script deltas
(sigmoid head on/off, first BN on/off, aux heads).

All modules take/return NHWC; latent vectors are (B, latent_dim).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.nn.layers import (
    BatchNorm,
    Conv,
    Dropout2d,
    Linear,
    Upsample,
    flatten_nchw,
    leaky_relu,
    unflatten_nchw,
)


class MLPGenerator(nn.Module):
    """Template A generator (gan/gan.py:38-61).

    block(in, out, normalize) = Linear -> [BatchNorm1d(out, eps=0.8)] ->
    LeakyReLU(0.2); widths latent->128->256->512->1024->prod(img_shape), Tanh,
    reshape to the image. The 0.8 is the reference's eps quirk, kept for
    parity.
    """

    img_shape: Tuple[int, int, int]  # (H, W, C)
    widths: Sequence[int] = (128, 256, 512, 1024)
    bn_eps: float = 0.8

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z
        for i, w in enumerate(self.widths):
            x = Linear(w)(x)
            if i > 0:  # first block: normalize=False
                x = BatchNorm(eps=self.bn_eps)(x, train=train)
            x = leaky_relu(x, 0.2)
        h, w_, c = self.img_shape
        x = Linear(h * w_ * c)(x)
        x = jnp.tanh(x)
        # torch view(B, C, H, W) element order (gan/gan.py:59-60).
        return unflatten_nchw(x, c, h, w_)


class MLPDiscriminator(nn.Module):
    """Template A discriminator (gan/gan.py:64-81): 512 -> 256 -> 1 with
    LeakyReLU(0.2); ``sigmoid=False`` gives the WGAN/softmax-GAN critic
    (wgan/wgan.py:65-80)."""

    widths: Sequence[int] = (512, 256)
    sigmoid: bool = True

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = flatten_nchw(img)  # torch img.view(B, -1) order (gan/gan.py:79)
        for w in self.widths:
            x = Linear(w)(x)
            x = leaky_relu(x, 0.2)
        x = Linear(1)(x)
        if self.sigmoid:
            x = jax.nn.sigmoid(x)
        return x


class DCGANGenerator(nn.Module):
    """Template B generator (dcgan/dcgan.py:45-71).

    Linear(latent -> 128*(s/4)^2), reshape, then
    [BN, Up, Conv3x3(128), BN(0.8), LReLU, Up, Conv3x3(64), BN(0.8), LReLU,
    Conv3x3(channels), Tanh]. ``first_bn=False`` gives the LSGAN variant
    (lsgan/lsgan.py:52-70). ``init_mode='normal02'`` applies
    weights_init_normal to convs + BN2d (dcgan/dcgan.py:36-42; Linear keeps
    the torch default, matching the name-based filter in the reference).
    """

    img_size: int
    channels: int
    first_bn: bool = True
    init_mode: str = "normal02"
    bn_eps: float = 0.8

    @nn.compact
    def __call__(self, z, train: bool = True):
        s0 = self.img_size // 4
        x = Linear(128 * s0 * s0)(z)
        # torch out.view(B, 128, s0, s0) element order (dcgan/dcgan.py:68-69).
        x = unflatten_nchw(x, 128, s0, s0)
        if self.first_bn:
            x = BatchNorm(init_mode=self.init_mode)(x, train=train)  # default eps
        x = Upsample(2)(x)
        x = Conv(128, 3, 1, 1, init_mode=self.init_mode)(x)
        x = BatchNorm(eps=self.bn_eps, init_mode=self.init_mode)(x, train=train)
        x = leaky_relu(x, 0.2)
        x = Upsample(2)(x)
        x = Conv(64, 3, 1, 1, init_mode=self.init_mode)(x)
        x = BatchNorm(eps=self.bn_eps, init_mode=self.init_mode)(x, train=train)
        x = leaky_relu(x, 0.2)
        x = Conv(self.channels, 3, 1, 1, init_mode=self.init_mode)(x)
        return jnp.tanh(x)


class DCGANTrunk(nn.Module):
    """Template B discriminator trunk (dcgan/dcgan.py:74-92): four
    [Conv3x3 s2 p1 -> LReLU(0.2) -> Dropout2d(0.25) -> BN(0.8, except first)]
    blocks (16, 32, 64, 128 filters), flattened. Aux-head models (acgan,
    sgan, infogan) attach their own heads to this trunk."""

    filters: Sequence[int] = (16, 32, 64, 128)
    init_mode: str = "normal02"
    bn_eps: float = 0.8

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for i, f in enumerate(self.filters):
            x = Conv(f, 3, 2, 1, init_mode=self.init_mode)(x)
            x = leaky_relu(x, 0.2)
            x = Dropout2d(0.25)(x, train=train)
            if i > 0:
                x = BatchNorm(eps=self.bn_eps, init_mode=self.init_mode)(x, train=train)
        return flatten_nchw(x)  # torch out.view(B, -1) (dcgan/dcgan.py:96)


class DCGANDiscriminator(nn.Module):
    """Template B discriminator: trunk + Linear(->1) [+ Sigmoid]."""

    sigmoid: bool = True
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = DCGANTrunk(init_mode=self.init_mode)(img, train=train)
        x = Linear(1)(x)
        if self.sigmoid:
            x = jax.nn.sigmoid(x)
        return x
