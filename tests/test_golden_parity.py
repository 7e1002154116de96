"""Golden forward parity vs the reference's OWN torch modules.

The strongest correctness evidence (SURVEY.md §4): initialize a tpugan
model, transplant its weights into the reference implementation's torch
module (imported read-only from /root/reference), run both on the same
input, and require matching outputs. Covers the three hardest
translation surfaces: ReflectionPad ResNet G + InstanceNorm (cyclegan),
ZeroPad PatchGAN (cyclegan), and the RRDB dense-block generator (esrgan).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpugan.models._common import apply_mod, init_module


def _import_reference_models(name):
    """Import /root/reference/implementations/<name>/models.py in isolation
    (torchvision stubbed — not installed here, only needed for the unused
    vgg import)."""
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = lambda *a, **k: None
    tvm.resnet18 = lambda *a, **k: None
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    path = f"/root/reference/implementations/{name}"
    sys.path.insert(0, path)
    if "models" in sys.modules:
        del sys.modules["models"]
    import models as m

    sys.path.remove(path)
    return m


def _unwrap(d):
    """Descend wrapper scopes (tpugan.nn.layers wrap flax primitives) until
    the dict holding 'kernel'/'scale'."""
    while isinstance(d, dict) and "kernel" not in d and "scale" not in d:
        assert len(d) == 1, list(d)
        d = next(iter(d.values()))
    return d


def _copy_conv(t_conv, flax_leaf):
    """flax Conv kernel HWIO -> torch OIHW."""
    flax_leaf = _unwrap(flax_leaf)
    k = np.asarray(flax_leaf["kernel"]).transpose(3, 2, 0, 1)
    assert tuple(t_conv.weight.shape) == k.shape, (
        tuple(t_conv.weight.shape), k.shape,
    )
    t_conv.weight.data = torch.from_numpy(k.copy())
    if t_conv.bias is not None:
        t_conv.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def _nhwc(t):
    return torch.from_numpy(np.asarray(t).transpose(0, 3, 1, 2).copy())


def _to_np(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_cyclegan_generator_forward_golden():
    from tpugan.nn.im2im import GeneratorResNet

    n_res = 2
    G = GeneratorResNet(channels=3, num_residual_blocks=n_res)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    params, _ = init_module(G, jax.random.PRNGKey(3), x)

    rm = _import_reference_models("cyclegan")
    tg = rm.GeneratorResNet((3, 64, 64), n_res).eval()
    seq = tg.model
    # Creation-order mapping (see tpugan/nn/im2im.py GeneratorResNet):
    # Conv_0 = c7s1-64 (seq[1]); Conv_1/Conv_2 = downs (seq[4], seq[7]);
    # residual blocks at seq[10:10+n]; Conv_3/Conv_4 = ups; Conv_5 = final.
    _copy_conv(seq[1], params["Conv_0"])
    _copy_conv(seq[4], params["Conv_1"])
    _copy_conv(seq[7], params["Conv_2"])
    for i in range(n_res):
        rb = seq[10 + i].block
        _copy_conv(rb[1], params[f"ResidualBlockIN_{i}"]["Conv_0"])
        _copy_conv(rb[5], params[f"ResidualBlockIN_{i}"]["Conv_1"])
    up0 = 10 + n_res
    _copy_conv(seq[up0 + 1], params["Conv_3"])
    _copy_conv(seq[up0 + 5], params["Conv_4"])
    _copy_conv(seq[up0 + 9], params["Conv_5"])

    ours, _ = apply_mod(G, params, None, x)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_cyclegan_patchgan_forward_golden():
    from tpugan.nn.im2im import PatchGAN

    D = PatchGAN(head_bias=True, init_mode="normal02zero")
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    params, _ = init_module(D, jax.random.PRNGKey(4), x)

    rm = _import_reference_models("cyclegan")
    td = rm.Discriminator((3, 64, 64)).eval()
    seq = td.model
    # layout: [conv, lrelu] then 3x [conv, IN, lrelu], ZeroPad, head conv
    # -> convs at 0, 2, 5, 8; head at 12.
    _copy_conv(seq[0], params["Conv_0"])
    _copy_conv(seq[2], params["Conv_1"])
    _copy_conv(seq[5], params["Conv_2"])
    _copy_conv(seq[8], params["Conv_3"])
    _copy_conv(seq[12], params["Conv_4"])

    ours, _ = apply_mod(D, params, None, x)
    with torch.no_grad():
        theirs = _to_np(td(_nhwc(x)))
    assert ours.shape == theirs.shape  # (2, 4, 4, 1) at 64px
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_esrgan_rrdb_generator_forward_golden():
    from tpugan.nn.sr import ESRGANGenerator

    n_blocks = 2
    G = ESRGANGenerator(channels=3, filters=64, num_res_blocks=n_blocks)
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 16, 16, 3)), jnp.float32
    )
    params, _ = init_module(G, jax.random.PRNGKey(5), x)

    rm = _import_reference_models("esrgan")
    tg = rm.GeneratorRRDB(3, filters=64, num_res_blocks=n_blocks).eval()
    _copy_conv(tg.conv1, params["Conv_0"])
    for i in range(n_blocks):
        rrdb = tg.res_blocks[i]
        fl = params[f"RRDB_{i}"]
        for j in range(3):
            dense = rrdb.dense_blocks[j]
            fd = fl[f"DenseResidualBlock_{j}"]
            for b in range(5):
                _copy_conv(dense.blocks[b][0], fd[f"Conv_{b}"])
    _copy_conv(tg.conv2, params["Conv_1"])
    # upsampling convs at tg.upsampling indices 0, 3 (conv, lrelu, shuffle)x2
    _copy_conv(tg.upsampling[0], params["Conv_2"])
    _copy_conv(tg.upsampling[3], params["Conv_3"])
    _copy_conv(tg.conv3[0], params["Conv_4"])
    _copy_conv(tg.conv3[2], params["Conv_5"])

    ours, _ = apply_mod(G, params, None, x)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    assert ours.shape == theirs.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


def _copy_convT(t_conv, flax_leaf):
    """flax ConvTranspose kernel (transpose_kernel=True: HWOI) -> torch
    ConvTranspose2d weight (I, O, H, W)."""
    flax_leaf = _unwrap(flax_leaf)
    k = np.asarray(flax_leaf["kernel"]).transpose(3, 2, 0, 1)
    assert tuple(t_conv.weight.shape) == k.shape, (
        tuple(t_conv.weight.shape), k.shape,
    )
    t_conv.weight.data = torch.from_numpy(k.copy())
    if t_conv.bias is not None:
        t_conv.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def _copy_linear(t_lin, flax_leaf):
    flax_leaf = _unwrap(flax_leaf)
    t_lin.weight.data = torch.from_numpy(
        np.asarray(flax_leaf["kernel"]).T.copy()
    )
    t_lin.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def test_clustergan_generator_forward_golden():
    """ConvTranspose + Linear->spatial reshape + BN(train) transplant
    (clustergan's Generator_CNN is CUDA-hardcoded in the reference — rebuild
    it verbatim-shaped here, clustergan.py:143-193)."""
    import torch.nn as nn

    from tpugan.models import cluster_gan

    cfg = cluster_gan.Config(latent_dim=12)
    G = cluster_gan.build(cfg)["generator"]
    zn = jnp.asarray(np.random.default_rng(5).normal(0, 1, (3, 12)), jnp.float32)
    zc = jax.nn.one_hot(jnp.asarray([1, 4, 7]), 10)
    params, bs = init_module(G, jax.random.PRNGKey(8), zn, zc, train=True)

    tg = nn.Sequential(
        nn.Linear(22, 1024),
        nn.BatchNorm1d(1024),
        nn.LeakyReLU(0.2),
        nn.Linear(1024, 128 * 7 * 7),
        nn.BatchNorm1d(128 * 7 * 7),
        nn.LeakyReLU(0.2),
    )
    tail = nn.Sequential(
        nn.ConvTranspose2d(128, 64, 4, stride=2, padding=1, bias=True),
        nn.BatchNorm2d(64),
        nn.LeakyReLU(0.2),
        nn.ConvTranspose2d(64, 1, 4, stride=2, padding=1, bias=True),
        nn.Sigmoid(),
    ).train()
    tg = tg.train()
    _copy_linear(tg[0], params["Linear_0"])
    _copy_linear(tg[3], params["Linear_1"])
    _copy_convT(tail[0], params["ConvTranspose_0"])
    _copy_convT(tail[3], params["ConvTranspose_1"])

    ours, _ = apply_mod(G, params, bs, zn, zc, train=True)
    with torch.no_grad():
        z = torch.from_numpy(np.concatenate([np.asarray(zn), np.asarray(zc)], 1))
        h = tg(z).view(3, 128, 7, 7)
        theirs = _to_np(tail(h))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


@pytest.mark.slow
def test_pix2pix_unet_forward_golden():
    """8-down/7-up U-Net with ConvTranspose ups and the ZeroPad final
    (dropout off: torch .eval() vs train=False)."""
    from tpugan.nn.im2im import GeneratorUNet

    G = GeneratorUNet(out_channels=3)
    x = jnp.asarray(
        np.random.default_rng(6).normal(0, 1, (1, 256, 256, 3)), jnp.float32
    )
    params, _ = init_module(G, jax.random.PRNGKey(9), x, train=False)

    rm = _import_reference_models("pix2pix")
    tg = rm.GeneratorUNet(3, 3).eval()
    for i in range(8):
        _copy_conv(getattr(tg, f"down{i+1}").model[0], params[f"UNetDown_{i}"])
    for i in range(7):
        _copy_convT(getattr(tg, f"up{i+1}").model[0], params[f"UNetUp_{i}"])
    _copy_conv(tg.final[2], params["Conv_0"])

    ours, _ = apply_mod(G, params, None, x, train=False)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)


def test_ebgan_discriminator_forward_golden():
    """Autoencoder D with the flatten->Linear->unflatten roundtrip
    (ebgan.py:74-101) — validates torch view() element order end to end.
    Eval mode so BatchNorm uses (0,1) running stats on both sides."""
    import torch.nn as nn

    from tpugan.models import ebgan

    cfg = ebgan.Config(img_size=32, channels=1)
    D = ebgan.build(cfg)["discriminator"]
    x = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, (3, 32, 32, 1)), jnp.float32
    )
    params, bs = init_module(D, jax.random.PRNGKey(10), x, train=True)

    class TD(nn.Module):
        def __init__(self):
            super().__init__()
            self.down = nn.Sequential(nn.Conv2d(1, 64, 3, 2, 1), nn.ReLU())
            down_dim = 64 * 16 * 16
            self.embedding = nn.Linear(down_dim, 32)
            self.fc = nn.Sequential(
                nn.BatchNorm1d(32, 0.8),
                nn.ReLU(inplace=True),
                nn.Linear(32, down_dim),
                nn.BatchNorm1d(down_dim),
                nn.ReLU(inplace=True),
            )
            self.up = nn.Sequential(
                nn.Upsample(scale_factor=2), nn.Conv2d(64, 1, 3, 1, 1)
            )

        def forward(self, img):
            out = self.down(img)
            embedding = self.embedding(out.view(out.size(0), -1))
            out = self.fc(embedding)
            out = self.up(out.view(out.size(0), 64, 16, 16))
            return out, embedding

    td = TD().eval()
    _copy_conv(td.down[0], params["Conv_0"])
    _copy_linear(td.embedding, params["Linear_0"])
    _copy_linear(td.fc[2], params["Linear_1"])
    _copy_conv(td.up[1], params["Conv_1"])

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        recon_t, emb_t = td(_nhwc(x))
    np.testing.assert_allclose(
        np.asarray(ours[1]), emb_t.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours[0]), _to_np(recon_t), atol=2e-5
    )


def test_gan_mlp_generator_forward_golden():
    """Template-A MLP G (gan/gan.py:38-61), eval mode, multichannel view
    order."""
    import torch.nn as nn

    from tpugan.nn.blocks import MLPGenerator

    G = MLPGenerator(img_shape=(14, 14, 3))
    z = jnp.asarray(np.random.default_rng(8).normal(0, 1, (4, 100)), jnp.float32)
    params, bs = init_module(G, jax.random.PRNGKey(11), z, train=True)

    layers = []
    widths = [100, 128, 256, 512, 1024]
    tls = []
    for i in range(4):
        lin = nn.Linear(widths[i], widths[i + 1])
        tls.append(lin)
        layers.append(lin)
        if i > 0:
            layers.append(nn.BatchNorm1d(widths[i + 1], 0.8))
        layers.append(nn.LeakyReLU(0.2))
    out_lin = nn.Linear(1024, 14 * 14 * 3)
    tls.append(out_lin)
    layers += [out_lin, nn.Tanh()]
    tg = nn.Sequential(*layers).eval()
    for i, tl in enumerate(tls):
        _copy_linear(tl, params[f"Linear_{i}"])

    ours, _ = apply_mod(G, params, bs, z, train=False)
    with torch.no_grad():
        flat = tg(torch.from_numpy(np.asarray(z)))
        theirs = flat.view(4, 3, 14, 14).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_dcgan_generator_forward_golden():
    """Template-B conv G vs the reference dcgan Generator (BatchNorm train
    mode with batch stats — the MNIST-family workhorse)."""
    from tpugan.nn.blocks import DCGANGenerator

    G = DCGANGenerator(img_size=32, channels=1, init_mode="normal02")
    z = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (4, 100)), jnp.float32
    )
    params, bs = init_module(G, jax.random.PRNGKey(6), z, train=True)

    # Reference dcgan closes over a global `opt` — rebuild its Generator
    # verbatim-shaped in torch here (dcgan/dcgan.py:45-71).
    import torch.nn as nn

    class TG(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(100, 128 * 8 * 8)
            self.conv_blocks = nn.Sequential(
                nn.BatchNorm2d(128),
                nn.Upsample(scale_factor=2),
                nn.Conv2d(128, 128, 3, stride=1, padding=1),
                nn.BatchNorm2d(128, 0.8),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Upsample(scale_factor=2),
                nn.Conv2d(128, 64, 3, stride=1, padding=1),
                nn.BatchNorm2d(64, 0.8),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(64, 1, 3, stride=1, padding=1),
                nn.Tanh(),
            )

        def forward(self, zz):
            out = self.l1(zz).view(zz.shape[0], 128, 8, 8)
            return self.conv_blocks(out)

    tg = TG().train()
    # Linear
    lin = _unwrap(params["Linear_0"])
    w = np.asarray(lin["kernel"]).T
    tg.l1.weight.data = torch.from_numpy(w.copy())
    tg.l1.bias.data = torch.from_numpy(np.asarray(lin["bias"]).copy())
    # Convs + BNs in creation order.
    convs = [tg.conv_blocks[2], tg.conv_blocks[6], tg.conv_blocks[9]]
    for i, tc in enumerate(convs):
        _copy_conv(tc, params[f"Conv_{i}"])
    bns = [tg.conv_blocks[0], tg.conv_blocks[3], tg.conv_blocks[7]]
    for i, tb in enumerate(bns):
        fb = _unwrap(params[f"BatchNorm_{i}"])
        tb.weight.data = torch.from_numpy(np.asarray(fb["scale"]).copy())
        tb.bias.data = torch.from_numpy(np.asarray(fb["bias"]).copy())

    ours, _ = apply_mod(G, params, bs, z, train=True)
    theirs = _to_np(tg(torch.from_numpy(np.asarray(z))))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)
