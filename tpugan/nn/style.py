"""Style-transfer building blocks: AdaIN decoder stack + MultiDiscriminator.

Sources: /root/reference/implementations/munit/models.py —
ContentEncoder (:113-141), StyleEncoder (:149-171), MLP (:179-189), AdaIN
residual decoder (:50-105), AdaptiveInstanceNorm2d (:268-301, the
batch-norm-reshape trick == per-sample per-channel instance norm with
style-predicted affine), MultiDiscriminator (:197-235, 3 PatchGAN towers on
an AvgPool(kernel=3 — the reference passes in_channels as the kernel —
stride 2, pad 1, count_include_pad=False) pyramid; shared by
bicyclegan/models.py:126-165 with kernel-3 behavior there too).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.nn.im2im import reflection_pad
from tpugan.nn.layers import (
    Conv,
    InstanceNorm,
    LayerNormSpatial,
    Linear,
    Upsample,
    leaky_relu,
)
from tpugan.ops.image import avg_pool


def adain(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """AdaptiveInstanceNorm2d (munit/models.py:283-298): instance-normalize
    per (sample, channel) over (H, W) with biased variance (F.batch_norm
    training mode), then scale/shift by the per-sample style prediction.
    weight/bias: (B, C). Dispatches to the fused single-VMEM-pass Pallas
    kernel under TPUGAN_PALLAS=1 (ops/pallas_kernels.py:adain_pallas)."""
    import os

    from tpugan.ops.pallas_kernels import adain_pallas, pallas_eligible

    if os.environ.get("TPUGAN_PALLAS", "0") == "1" and pallas_eligible(x):
        return adain_pallas(x, weight, bias, eps)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * weight[:, None, None, :] + bias[:, None, None, :]


class AdaINResidualBlock(nn.Module):
    """munit/models.py:243-260 with norm="adain": the two norm layers take
    their affine params from slices of ``params`` ((B, 4*C): [bias1, weight1,
    bias2, weight2] matching the reference's sequential assignment order —
    per layer [:, :C]=bias, [:, C:2C]=weight (models.py:87-99)."""

    features: int
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x, params):
        c = self.features
        b1, w1 = params[:, :c], params[:, c : 2 * c]
        b2, w2 = params[:, 2 * c : 3 * c], params[:, 3 * c : 4 * c]
        y = reflection_pad(x, 1)
        y = Conv(c, 3, 1, 0, init_mode=self.init_mode)(y)
        y = adain(y, w1, b1)
        y = nn.relu(y)
        y = reflection_pad(y, 1)
        y = Conv(c, 3, 1, 0, init_mode=self.init_mode)(y)
        y = adain(y, w2, b2)
        return x + y


class ContentEncoder(nn.Module):
    """munit/models.py:113-141."""

    dim: int = 64
    n_residual: int = 3
    n_downsample: int = 2
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x):
        from tpugan.nn.im2im import ResidualBlockIN

        y = reflection_pad(x, 3)
        y = Conv(self.dim, 7, 1, 0, init_mode=self.init_mode)(y)
        y = InstanceNorm()(y)
        y = nn.relu(y)
        d = self.dim
        for _ in range(self.n_downsample):
            d *= 2
            y = Conv(d, 4, 2, 1, init_mode=self.init_mode)(y)
            y = InstanceNorm()(y)
            y = nn.relu(y)
        for _ in range(self.n_residual):
            y = ResidualBlockIN(d, init_mode=self.init_mode)(y)
        return y


class StyleEncoder(nn.Module):
    """munit/models.py:149-171: no norms; AdaptiveAvgPool(1) + 1x1 conv."""

    dim: int = 64
    n_downsample: int = 2
    style_dim: int = 8
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x):
        y = reflection_pad(x, 3)
        y = Conv(self.dim, 7, 1, 0, init_mode=self.init_mode)(y)
        y = nn.relu(y)
        d = self.dim
        for _ in range(2):
            d *= 2
            y = Conv(d, 4, 2, 1, init_mode=self.init_mode)(y)
            y = nn.relu(y)
        for _ in range(self.n_downsample - 2):
            y = Conv(d, 4, 2, 1, init_mode=self.init_mode)(y)
            y = nn.relu(y)
        y = jnp.mean(y, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        y = Conv(self.style_dim, 1, 1, 0, init_mode=self.init_mode)(y)
        return y.reshape(y.shape[0], self.style_dim)


class StyleMLP(nn.Module):
    """munit/models.py:179-189: style -> AdaIN params."""

    output_dim: int
    dim: int = 256
    n_blk: int = 3
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, style):
        y = style.reshape(style.shape[0], -1)
        y = Linear(self.dim, init_mode=self.init_mode)(y)
        y = nn.relu(y)
        for _ in range(self.n_blk - 2):
            y = Linear(self.dim, init_mode=self.init_mode)(y)
            y = nn.relu(y)
        return Linear(self.output_dim, init_mode=self.init_mode)(y)


class MunitDecoder(nn.Module):
    """munit/models.py:50-105: AdaIN residual blocks + LayerNorm upsampling
    + c7s1 output, with the style-MLP predicting all AdaIN params."""

    out_channels: int = 3
    dim: int = 64
    n_residual: int = 3
    n_upsample: int = 2
    style_dim: int = 8
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, content, style, train: bool = True):
        del train
        d = self.dim * 2**self.n_upsample
        num_adain = 2 * d * 2 * self.n_residual  # 2 norms x (mean+std) each
        params = StyleMLP(output_dim=num_adain, init_mode=self.init_mode)(style)
        y = content
        for i in range(self.n_residual):
            chunk = params[:, i * 4 * d : (i + 1) * 4 * d]
            y = AdaINResidualBlock(d, init_mode=self.init_mode)(y, chunk)
        for _ in range(self.n_upsample):
            y = Upsample(2)(y)
            y = Conv(d // 2, 5, 1, 2, init_mode=self.init_mode)(y)
            y = LayerNormSpatial()(y)
            y = nn.relu(y)
            d //= 2
        y = reflection_pad(y, 3)
        y = Conv(self.out_channels, 7, 1, 0, init_mode=self.init_mode)(y)
        return jnp.tanh(y)


class MultiDiscriminator(nn.Module):
    """munit/models.py:197-235: three 4-block PatchGAN towers; the input is
    AvgPool(3, s2, p1, count_include_pad=False)-downsampled between towers.
    Returns the list of tower outputs."""

    filters: Sequence[int] = (64, 128, 256, 512)
    n_towers: int = 3
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        outputs = []
        for _ in range(self.n_towers):
            y = x
            for i, f in enumerate(self.filters):
                y = Conv(f, 4, 2, 1, init_mode=self.init_mode)(y)
                if i > 0:
                    y = InstanceNorm()(y)
                y = leaky_relu(y, 0.2)
            outputs.append(Conv(1, 3, 1, 1, init_mode=self.init_mode)(y))
            x = avg_pool(x, 3, 2, 1, count_include_pad=False)
        return outputs


def multi_d_loss(outputs, gt: float):
    """MultiDiscriminator.compute_loss (munit/models.py:225-228): sum of
    scalar-target MSEs across towers."""
    return sum(jnp.mean((out - gt) ** 2) for out in outputs)
