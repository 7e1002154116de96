"""Pretrained-weight drop-in paths, proven without egress.

The reference's perceptual losses use ImageNet-pretrained torchvision
VGG19 (srgan/models.py:8-15, esrgan/models.py:8-15); this environment has
no weights on disk, so tpugan ships a converter (scripts/convert_vgg19.py)
and an npz overlay (nn/vgg.py:load_vgg19_npz). These tests build a
synthetic torch-layout VGG19 checkpoint, round-trip it through the real
converter + loader, and require forward equality with torch — guaranteeing
that dropping in real weights changes numbers and nothing else.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

sys.path.insert(0, "scripts")

from _transplant import nhwc_to_torch, randomize, torch_to_nhwc

# torchvision vgg19 cfg 'E' feature layout.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class _TorchVGG19Features(nn.Module):
    """torchvision vgg19().features rebuilt in plain torch (torchvision is
    not installed here) — same Sequential indices, so state_dict keys are
    ``features.<i>.weight`` exactly like the real checkpoint."""

    def __init__(self):
        super().__init__()
        layers, in_ch = [], 3
        for v in _VGG_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        self.features = nn.Sequential(*layers)

    def forward(self, x, cut):
        return self.features[:cut](x)


@pytest.fixture(scope="module")
def vgg_npz(tmp_path_factory):
    tv = randomize(_TorchVGG19Features(), 42)
    out = tmp_path_factory.mktemp("vgg") / "vgg19_features.npz"
    from convert_vgg19 import convert

    convert(tv.state_dict(), str(out))
    return tv, str(out)


@pytest.mark.parametrize("cut", [18, 35])
def test_vgg19_npz_roundtrip_forward_parity(vgg_npz, cut):
    """state_dict -> convert_vgg19.convert -> load_vgg19_npz -> forward
    equality for both reference cuts (srgan 18, esrgan 35)."""
    from tpugan.nn.vgg import VGG19Features, load_vgg19_npz

    tv, npz = vgg_npz
    model = VGG19Features(cut=cut)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    params = load_vgg19_npz(variables["params"], npz)

    ours = model.apply({"params": params}, x)
    with torch.no_grad():
        theirs = torch_to_nhwc(tv(nhwc_to_torch(x), cut))
    assert np.asarray(ours).shape == theirs.shape
    # fp32 reduction-order drift accumulates over the 16-conv cut=35 chain.
    np.testing.assert_allclose(
        np.asarray(ours), theirs, atol=1e-4 if cut == 18 else 2e-3
    )


def test_vgg19_npz_overlay_changes_features(vgg_npz, tmp_path):
    """VGGFeatureModel silently runs He-random features without the npz;
    with it, the SAME call must pick the converted weights up from
    data_dir (metrics/fid.py) and produce different features."""
    import shutil

    from tpugan.metrics.fid import VGGFeatureModel

    _, npz = vgg_npz
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    x = [jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )]
    random_feats = VGGFeatureModel(data_dir=str(data_dir))(x)
    shutil.copy(npz, data_dir / "vgg19_features.npz")
    loaded_feats = VGGFeatureModel(data_dir=str(data_dir))(x)
    assert random_feats.shape == loaded_feats.shape
    assert np.abs(random_feats - loaded_feats).max() > 1e-3


def test_vgg19_npz_overlay_reaches_perceptual_loss(vgg_npz, tmp_path):
    """srgan's content-loss path (nn/vgg.py consumers) must see the
    overlay: feature extraction through the recipe-facing constructor
    changes when weights land in data_dir."""
    import shutil

    from tpugan.models import srgan

    _, npz = vgg_npz
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    shutil.copy(npz, data_dir / "vgg19_features.npz")

    hr = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32
    )
    feats = []
    for ddir in (str(tmp_path), str(data_dir)):
        cfg = srgan.Config(synthetic_data=True, data_dir=ddir)
        from tpugan.models._common import apply_mod

        modules = srgan.build(cfg)
        params = srgan._vgg_params(cfg, modules, jax.random.PRNGKey(0))
        out, _ = apply_mod(modules["vgg"], params, None, hr)
        feats.append(np.asarray(out))
    assert np.abs(feats[0] - feats[1]).max() > 1e-3


# ----------------------------------------------------------- InceptionV3


class _TBasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _TInceptionA(nn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = _TBasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = _TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _TBasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _TBasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F

        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class _TInceptionB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = _TBasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _TBasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F

        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class _TInceptionC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = _TBasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = _TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _TBasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = _TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _TBasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F

        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _TInceptionD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = _TBasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = _TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _TBasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = _TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F

        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class _TInceptionE(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch1x1 = _TBasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = _TBasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = _TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _TBasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = _TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _TBasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F

        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class _TInception3Trunk(nn.Module):
    """torchvision Inception3 feature trunk (no AuxLogits/fc), registration
    names matching the real checkpoint's state_dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _TInceptionA(192, 32)
        self.Mixed_5c = _TInceptionA(256, 64)
        self.Mixed_5d = _TInceptionA(288, 64)
        self.Mixed_6a = _TInceptionB(288)
        self.Mixed_6b = _TInceptionC(768, 128)
        self.Mixed_6c = _TInceptionC(768, 160)
        self.Mixed_6d = _TInceptionC(768, 160)
        self.Mixed_6e = _TInceptionC(768, 192)
        self.Mixed_7a = _TInceptionD(768)
        self.Mixed_7b = _TInceptionE(1280)
        self.Mixed_7c = _TInceptionE(2048)

    def forward(self, x):
        import torch.nn.functional as F

        ch = [
            x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
            x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
            x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
        ]
        x = torch.cat(ch, 1)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return torch.mean(x, dim=(2, 3))


@pytest.mark.slow
def test_inception_v3_npz_roundtrip_forward_parity(tmp_path):
    """Synthetic inception_v3 checkpoint -> convert_inception.convert ->
    load_inception_npz -> (B, 2048) pooled features equal to torch."""
    from convert_inception import convert
    from tpugan.metrics.inception import InceptionV3Features, load_inception_npz

    tm = randomize(_TInception3Trunk(), 7, scale=0.03)
    # Non-default running stats so the stat transfer is exercised too.
    tm.train()
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for _ in range(2):
            tm(torch.randn(2, 3, 139, 139, generator=g))
    tm.eval()
    npz = tmp_path / "inception_v3.npz"
    convert(tm.state_dict(), str(npz))

    model = InceptionV3Features()
    x = jnp.asarray(
        np.random.default_rng(9).uniform(-2, 2, (1, 299, 299, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    params, bs = load_inception_npz(
        variables["params"], variables["batch_stats"], str(npz)
    )

    ours = model.apply({"params": params, "batch_stats": bs}, x)
    with torch.no_grad():
        theirs = tm(nhwc_to_torch(x)).numpy()
    assert np.asarray(ours).shape == theirs.shape == (1, 2048)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-3)


def test_fid_backbone_selector(tmp_path):
    """feature_model picks InceptionV3 iff its npz is present."""
    from tpugan.metrics.fid import (
        InceptionFeatureModel,
        VGGFeatureModel,
        feature_model,
    )

    assert isinstance(feature_model(data_dir=str(tmp_path)), VGGFeatureModel)
    tm = randomize(_TInception3Trunk(), 8, scale=0.03)
    from convert_inception import convert

    convert(tm.state_dict(), str(tmp_path / "inception_v3.npz"))
    model = feature_model(data_dir=str(tmp_path))
    assert isinstance(model, InceptionFeatureModel)
    assert model.pretrained
    x = [jnp.zeros((2, 32, 32, 1), jnp.float32)]
    feats = model(x)
    assert feats.shape == (2, 2048)
