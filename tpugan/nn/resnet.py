"""torchvision-style ResNet18 feature trunk (randomly initialized).

Used by bicyclegan's VAE Encoder
(/root/reference/implementations/bicyclegan/models.py:102-118):
``resnet18(pretrained=False)`` children[:-3] = conv1/bn1/relu/maxpool +
layer1 (64) + layer2 (128, s2) + layer3 (256, s2), i.e. output stride 16
with 256 channels. Init parity: torchvision's kaiming_normal(fan_out) convs
and unit BatchNorms (the reference does NOT apply weights_init_normal to
the encoder — bicyclegan.py:74-78 inits generator and Ds only). Norms are
tpugan's torch-parity BatchNorm (nn/layers.py: momentum 0.1, UNBIASED
running variance — raw flax nn.BatchNorm differs on both).
"""

from __future__ import annotations

import flax.linen as nn

from tpugan.nn.layers import BatchNorm
from tpugan.ops.init import kaiming_normal


def _conv(features, kernel, stride, padding):
    fan_out = features * kernel * kernel
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        use_bias=False,
        kernel_init=kaiming_normal(fan_out),
    )


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        y = _conv(self.features, 3, self.stride, 1)(x)
        y = BatchNorm()(y, train=train)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, 1)(y)
        y = BatchNorm()(y, train=train)
        if self.downsample:
            identity = _conv(self.features, 1, self.stride, 0)(x)
            identity = BatchNorm()(identity, train=train)
        return nn.relu(y + identity)


class ResNet18Trunk(nn.Module):
    """conv1..layer3 of ResNet18 (output: (B, H/16, W/16, 256))."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = _conv(64, 7, 2, 3)(x)
        y = BatchNorm()(y, train=train)
        y = nn.relu(y)
        # MaxPool 3x3 s2 p1.
        y = nn.max_pool(
            y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        for features, blocks, first_stride in ((64, 2, 1), (128, 2, 2), (256, 2, 2)):
            for b in range(blocks):
                stride = first_stride if b == 0 else 1
                downsample = b == 0 and (stride != 1 or features != y.shape[-1])
                y = _BasicBlock(
                    features, stride=stride, downsample=downsample
                )(y, train=train)
        return y
