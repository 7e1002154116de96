"""InceptionV3 feature backbone for literature-comparable FID.

The canonical FID statistic uses InceptionV3 pool3 (2048-d) features.
BASELINE.json's acceptance protocol names "a shared InceptionV3
checkpoint"; this module provides the torchvision ``inception_v3``
architecture in flax (exact layer layout below) plus an npz weight
drop-in, mirroring the VGG19 path (tpugan/nn/vgg.py):

- convert a torchvision checkpoint once with
  ``scripts/convert_inception.py`` (drops AuxLogits/fc, keeps the feature
  trunk's state_dict order);
- drop ``inception_v3.npz`` under ``--data_dir``; ``load_inception_npz``
  maps it onto the params via the interop pairing
  (tpugan/io/torch_interop.py — kind+shape matching in insertion order,
  which equals torchvision's registration order here);
- without the file the extractor is He-random — self-consistent for
  relative comparisons, NOT literature-comparable (same policy as VGG19).

Architecture source: torchvision.models.inception (BSD) — layer names and
shapes replicated for checkpoint compatibility; no code copied.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpugan.nn.layers import BatchNorm
from tpugan.ops.image import avg_pool
from tpugan.ops.init import kaiming_normal


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=0.001) + relu."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        fan_out = self.features * kh * kw
        x = nn.Conv(
            self.features,
            kernel_size=(kh, kw),
            strides=(self.stride, self.stride),
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            use_bias=False,
            kernel_init=kaiming_normal(fan_out),
        )(x)
        x = BatchNorm(eps=0.001)(x, train=False)
        return nn.relu(x)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3s1p1(x):
    return avg_pool(x, 3, 1, 1)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1))(x)
        b5 = BasicConv2d(48, (1, 1))(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2))(b5)
        b3 = BasicConv2d(64, (1, 1))(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1))(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1))(b3)
        bp = BasicConv2d(self.pool_features, (1, 1))(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2)(x)
        bd = BasicConv2d(64, (1, 1))(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1))(bd)
        bd = BasicConv2d(96, (3, 3), stride=2)(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1))(x)
        b7 = BasicConv2d(c7, (1, 1))(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3))(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0))(b7)
        bd = BasicConv2d(c7, (1, 1))(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0))(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3))(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0))(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3))(bd)
        bp = BasicConv2d(192, (1, 1))(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1))(x)
        b3 = BasicConv2d(320, (3, 3), stride=2)(b3)
        b7 = BasicConv2d(192, (1, 1))(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3))(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0))(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2)(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1))(x)
        b3 = BasicConv2d(384, (1, 1))(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1))(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0))(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1))(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1))(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1))(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0))(bd),
            ],
            axis=-1,
        )
        bp = BasicConv2d(192, (1, 1))(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """torchvision inception_v3 feature trunk -> (B, 2048) pooled features.

    Call order == torchvision registration order (AuxLogits and fc
    excluded), so the interop pairing maps a converted checkpoint exactly.
    Input: (B, H, W, 3); resized to 299x299, which the stride stack
    reduces to 8x8 before the global average pool.
    """

    transform_input: bool = True

    @nn.compact
    def __call__(self, x):
        if x.shape[1] != 299 or x.shape[2] != 299:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.transform_input:
            # torchvision's pretrained models expect ImageNet-normalized
            # input and re-normalize to the TF convention internally.
            ch = [
                x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
            ]
            x = jnp.concatenate(ch, axis=-1)
        x = BasicConv2d(32, (3, 3), stride=2)(x)      # Conv2d_1a_3x3
        x = BasicConv2d(32, (3, 3))(x)                # Conv2d_2a_3x3
        x = BasicConv2d(64, (3, 3), padding=(1, 1))(x)  # Conv2d_2b_3x3
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1))(x)                # Conv2d_3b_1x1
        x = BasicConv2d(192, (3, 3))(x)               # Conv2d_4a_3x3
        x = _maxpool3s2(x)
        x = InceptionA(32)(x)                         # Mixed_5b
        x = InceptionA(64)(x)                         # Mixed_5c
        x = InceptionA(64)(x)                         # Mixed_5d
        x = InceptionB()(x)                           # Mixed_6a
        x = InceptionC(128)(x)                        # Mixed_6b
        x = InceptionC(160)(x)                        # Mixed_6c
        x = InceptionC(160)(x)                        # Mixed_6d
        x = InceptionC(192)(x)                        # Mixed_6e
        x = InceptionD()(x)                           # Mixed_7a
        x = InceptionE()(x)                           # Mixed_7b
        x = InceptionE()(x)                           # Mixed_7c
        return jnp.mean(x, axis=(1, 2))               # adaptive avgpool -> 2048


def load_inception_npz(params, batch_stats, path: str):
    """Overlay a converted torchvision inception_v3 checkpoint
    (scripts/convert_inception.py output) onto InceptionV3Features
    variables via the interop pairing. Returns (params, batch_stats)."""
    from tpugan.io.torch_interop import import_state_dict

    data = np.load(path)
    sd = {k: data[k] for k in data.files}
    return import_state_dict(params, sd, batch_stats)
