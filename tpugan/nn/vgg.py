"""VGG19 feature extractor (torchvision ``vgg19().features`` layout).

Used as the perceptual-loss backbone by srgan (features[:18],
/root/reference/implementations/srgan/models.py:8-15) and esrgan
(features[:35] — "vgg19_54", pre-activation conv5_4,
esrgan/models.py:8-15). The torchvision reference loads ImageNet-pretrained
weights; this environment has no network egress and no torchvision, so:

- the ARCHITECTURE is exact (torch Sequential index layout below);
- weights load from ``<data_dir>/vgg19_features.npz`` when present
  (arrays ``conv<i>_kernel`` (HWIO) / ``conv<i>_bias``, i = torch feature
  index — convert once from a torchvision checkpoint with
  scripts/convert_vgg19.py);
- otherwise the extractor uses He (kaiming-normal, relu gain) random init —
  NOT the torch default, whose tiny uniform weights make activations vanish
  by conv5 and the features non-discriminative. A fixed He-initialized
  random VGG is a usable perceptual metric (random-feature perceptual
  losses are well studied); FID-grade parity still requires dropping in the
  converted pretrained weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpugan.nn.layers import Conv

# torchvision vgg19 features: (torch_index, out_channels) for convs; "M" for
# 2x2 max pools at their torch indices.
VGG19_LAYOUT = [
    (0, 64), (2, 64), (4, "M"),
    (5, 128), (7, 128), (9, "M"),
    (10, 256), (12, 256), (14, 256), (16, 256), (18, "M"),
    (19, 512), (21, 512), (23, 512), (25, 512), (27, "M"),
    (28, 512), (30, 512), (32, 512), (34, 512), (36, "M"),
]


class VGG19Features(nn.Module):
    """Run features[0:cut] of torch's vgg19 (ReLU after each conv except
    when the cut lands exactly on a conv index, matching Sequential[:cut])."""

    cut: int  # 18 for srgan, 35 for esrgan
    init_mode: str = "he"  # random-feature fallback; npz weights override

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        for idx, spec in VGG19_LAYOUT:
            if idx >= self.cut:
                break
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = Conv(spec, 3, 1, 1, init_mode=self.init_mode, name=f"conv{idx}")(x)
            if idx + 1 < self.cut:  # the ReLU at torch index idx+1
                x = nn.relu(x)
        return x


def load_vgg19_npz(params, path: str):
    """Overlay converted torchvision weights onto a VGG19Features param
    tree. npz keys: conv<i>_kernel (HWIO float32), conv<i>_bias."""
    data = np.load(path)
    new = dict(params)
    for name in list(new.keys()):
        if not name.startswith("conv"):
            continue
        idx = name[4:]
        k, b = f"conv{idx}_kernel", f"conv{idx}_bias"
        if k in data:
            inner_name = list(new[name].keys())[0]  # wrapped nn.Conv
            new[name] = {
                inner_name: {
                    "kernel": jnp.asarray(data[k]),
                    "bias": jnp.asarray(data[b]),
                }
            }
    return new


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x_01: jax.Array) -> jax.Array:
    """(x in [0,1]) -> ImageNet-normalized (srgan/datasets.py:11-13)."""
    return (x_01 - IMAGENET_MEAN) / IMAGENET_STD


def imagenet_denormalize(x: jax.Array) -> jax.Array:
    """esrgan/datasets.py:16-20 (clamp to [0,255] kept verbatim — combined
    with save_image's [0,1] clip this reproduces the reference's output)."""
    return jnp.clip(x * IMAGENET_STD + IMAGENET_MEAN, 0.0, 255.0)
