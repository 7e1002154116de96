"""Golden weight-transplant forward parity, round 2: every architecture
family that round 1 covered only with param-count/shape tests.

Pattern (tests/_transplant.py): take the reference's own torch module
(imported read-only from /root/reference, or rebuilt verbatim-shaped where
the script closes over a global ``opt`` / is CUDA-hardcoded), randomize it,
map its state_dict onto the tpugan module via
tpugan.io.torch_interop.import_state_dict (the production migration path),
and require forward equality. This pins both the architecture translation
AND the interop pairing (insertion-order walking) for: munit, stargan,
cogan, began, discogan, dualgan, bicyclegan, acgan/sgan/infogan heads,
aae, pixelda, ccgan.

Module-wide ``slow``: these transplants build full-size torch AND flax
modules per test (the heavy torch constructions measurably dominate the
fast gate — VERDICT.md round-2 weak #4); the full gate runs them, and the
fast gate keeps architecture coverage via test_golden_parity.py plus the
per-family step/param suites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from _transplant import (
    import_reference_models,
    nhwc_to_torch,
    randomize,
    torch_to_nhwc,
)
from tpugan.io.torch_interop import export_state_dict, import_state_dict
from tpugan.models._common import apply_mod, init_module

pytestmark = pytest.mark.slow


def _rng_img(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(0, 1, shape), jnp.float32)


def _transplant(module, torch_module, *init_args, train=False):
    """init tpugan module -> import the torch module's state_dict."""
    params, bs = init_module(
        module, jax.random.PRNGKey(0), *init_args, train=train
    )
    params, bs = import_state_dict(params, torch_module.state_dict(), bs)
    return params, bs


# ---------------------------------------------------------------- munit


def test_munit_encoder_import_forward():
    """Content+style encoder pair (munit/models.py:33-42,113-171)."""
    from tpugan.models.munit import MunitEncoder

    rm = import_reference_models("munit")
    te = randomize(rm.Encoder(3, dim=16, n_residual=1, n_downsample=2, style_dim=8), 0).eval()

    E = MunitEncoder(dim=16, n_residual=1, n_downsample=2, style_dim=8)
    x = _rng_img((2, 32, 32, 3), 0)
    params, bs = _transplant(E, te, x)

    (content, style), _ = apply_mod(E, params, bs, x, train=False)
    with torch.no_grad():
        tc, ts = te(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(content), torch_to_nhwc(tc), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(style), ts.numpy().reshape(2, 8), atol=2e-5
    )


def test_munit_decoder_import_forward_and_export_roundtrip():
    """AdaIN residual decoder + style MLP + custom LayerNorm
    (munit/models.py:50-105,268-324). Also pins the interop handling of
    gamma/beta leaves and AdaIN dummy running-stat buffers."""
    from tpugan.nn.style import MunitDecoder

    rm = import_reference_models("munit")
    td = randomize(
        rm.Decoder(out_channels=3, dim=16, n_residual=2, n_upsample=2, style_dim=8), 1
    ).eval()
    sd = td.state_dict()

    D = MunitDecoder(out_channels=3, dim=16, n_residual=2, n_upsample=2, style_dim=8)
    content = _rng_img((2, 8, 8, 64), 1)
    style = _rng_img((2, 8), 2)
    params, bs = _transplant(D, td, content, style)

    ours, _ = apply_mod(D, params, bs, content, style, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(nhwc_to_torch(content), torch.from_numpy(np.asarray(style))))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)

    out = export_state_dict(params, sd, bs)
    td2 = rm.Decoder(out_channels=3, dim=16, n_residual=2, n_upsample=2, style_dim=8)
    td2.load_state_dict(out, strict=True)
    for k in sd:
        np.testing.assert_allclose(
            out[k].numpy(), sd[k].numpy(), atol=1e-6, err_msg=k
        )


def test_munit_multidiscriminator_import_forward():
    """3-tower pyramid D (munit/models.py:197-235) incl. the
    AvgPool(kernel=in_channels=3) downsample quirk."""
    from tpugan.nn.style import MultiDiscriminator

    rm = import_reference_models("munit")
    td = randomize(rm.MultiDiscriminator(3), 2).eval()

    # >=128px: the reference's smallest pyramid level divides by 2^2 before
    # 4 stride-2 convs, and torch InstanceNorm2d rejects 1x1 spatial maps.
    D = MultiDiscriminator()
    x = _rng_img((1, 128, 128, 3), 3)
    params, bs = _transplant(D, td, x)

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = td(nhwc_to_torch(x))
    assert len(ours) == len(theirs) == 3
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), torch_to_nhwc(t), atol=2e-5)


# --------------------------------------------------------------- stargan


def test_stargan_generator_import_forward():
    """Attr-conditioned ResNet G with affine InstanceNorms and
    ConvTranspose ups (stargan/models.py:35-79)."""
    from tpugan.models.stargan import StarGenerator

    rm = import_reference_models("stargan")
    # The reference's InstanceNorms set track_running_stats=True
    # (models.py:23); accumulate non-default buffers with a few train-mode
    # forwards, then require BOTH train-mode parity (per-instance stats)
    # and eval-mode parity (running buffers).
    tg = randomize(rm.GeneratorResNet((3, 32, 32), res_blocks=2, c_dim=5), 3).train()
    with torch.no_grad():
        g = torch.Generator().manual_seed(5)
        for _ in range(2):
            tg(
                torch.randn(2, 3, 32, 32, generator=g),
                torch.rand(2, 5, generator=g),
            )

    G = StarGenerator(channels=3, res_blocks=2)
    x = _rng_img((2, 32, 32, 3), 4)
    c = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (2, 5)), jnp.float32)
    params, bs = _transplant(G, tg, x, c)

    ours, _ = apply_mod(G, params, bs, x, c, train=True)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x), torch.from_numpy(np.asarray(c))))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)

    tg.eval()
    ours_e, _ = apply_mod(G, params, bs, x, c, train=False)
    with torch.no_grad():
        theirs_e = torch_to_nhwc(tg(nhwc_to_torch(x), torch.from_numpy(np.asarray(c))))
    np.testing.assert_allclose(np.asarray(ours_e), theirs_e, atol=3e-5)


def test_stargan_discriminator_import_forward():
    """PatchGAN head + attribute-classification conv head
    (stargan/models.py:87-115)."""
    from tpugan.models.stargan import StarDiscriminator

    rm = import_reference_models("stargan")
    td = randomize(rm.Discriminator((3, 64, 64), c_dim=5, n_strided=6), 4).eval()

    D = StarDiscriminator(img_size=64, c_dim=5)
    x = _rng_img((2, 64, 64, 3), 6)
    params, bs = _transplant(D, td, x)

    (adv, cls), _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        tadv, tcls = td(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(adv), torch_to_nhwc(tadv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls), tcls.numpy(), atol=2e-5)


# ----------------------------------------------------------------- cogan


class _TorchCoupledG(nn.Module):
    """cogan/cogan.py:51-87 at img_size=16, channels=1 (script closes over
    a global opt — rebuilt verbatim-shaped)."""

    def __init__(self, img_size=16, latent_dim=10, channels=1):
        super().__init__()
        self.init_size = img_size // 4
        self.fc = nn.Sequential(nn.Linear(latent_dim, 128 * self.init_size**2))
        self.shared_conv = nn.Sequential(
            nn.BatchNorm2d(128),
            nn.Upsample(scale_factor=2),
            nn.Conv2d(128, 128, 3, stride=1, padding=1),
            nn.BatchNorm2d(128, 0.8),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Upsample(scale_factor=2),
        )

        def head():
            return nn.Sequential(
                nn.Conv2d(128, 64, 3, stride=1, padding=1),
                nn.BatchNorm2d(64, 0.8),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(64, channels, 3, stride=1, padding=1),
                nn.Tanh(),
            )

        self.G1, self.G2 = head(), head()

    def forward(self, z):
        out = self.fc(z)
        out = out.view(out.shape[0], 128, self.init_size, self.init_size)
        emb = self.shared_conv(out)
        return self.G1(emb), self.G2(emb)


class _TorchCoupledD(nn.Module):
    """cogan/cogan.py:90-122 at img_size=16, channels=1."""

    def __init__(self, img_size=16, channels=1):
        super().__init__()

        def block(i, o, bn=True):
            b = [nn.Conv2d(i, o, 3, 2, 1)]
            if bn:
                b.append(nn.BatchNorm2d(o, 0.8))
            b.extend([nn.LeakyReLU(0.2, inplace=True), nn.Dropout2d(0.25)])
            return b

        self.shared_conv = nn.Sequential(
            *block(channels, 16, bn=False), *block(16, 32), *block(32, 64),
            *block(64, 128),
        )
        ds = img_size // 2**4
        self.D1 = nn.Linear(128 * ds**2, 1)
        self.D2 = nn.Linear(128 * ds**2, 1)

    def forward(self, img1, img2):
        out = self.shared_conv(img1)
        v1 = self.D1(out.view(out.shape[0], -1))
        out = self.shared_conv(img2)
        v2 = self.D2(out.view(out.shape[0], -1))
        return v1, v2


def test_cogan_coupled_generators_import_forward():
    from tpugan.models.cogan import CoupledGenerators

    tg = randomize(_TorchCoupledG(), 5).eval()
    G = CoupledGenerators(img_size=16, channels=1)
    z = _rng_img((2, 10), 7)
    params, bs = _transplant(G, tg, z)

    (img1, img2), _ = apply_mod(G, params, bs, z, train=False)
    with torch.no_grad():
        t1, t2 = tg(torch.from_numpy(np.asarray(z)))
    np.testing.assert_allclose(np.asarray(img1), torch_to_nhwc(t1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(img2), torch_to_nhwc(t2), atol=2e-5)
    # Coupling sanity: shared trunk, split heads -> outputs differ.
    assert np.abs(np.asarray(img1) - np.asarray(img2)).max() > 1e-3


def test_cogan_coupled_discriminators_import_forward():
    from tpugan.models.cogan import CoupledDiscriminators

    td = randomize(_TorchCoupledD(), 6).eval()
    D = CoupledDiscriminators()
    img1 = _rng_img((2, 16, 16, 1), 8)
    img2 = _rng_img((2, 16, 16, 1), 9)
    params, bs = _transplant(D, td, img1, img2)

    (v1, v2), _ = apply_mod(D, params, bs, img1, img2, train=False)
    with torch.no_grad():
        t1, t2 = td(nhwc_to_torch(img1), nhwc_to_torch(img2))
    np.testing.assert_allclose(np.asarray(v1), t1.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v2), t2.numpy(), atol=2e-5)


# ----------------------------------------------------------------- began


class _TorchBeganD(nn.Module):
    """began/began.py:75-99 autoencoder D at img_size=16, channels=1."""

    def __init__(self, img_size=16, channels=1):
        super().__init__()
        self.down = nn.Sequential(nn.Conv2d(channels, 64, 3, 2, 1), nn.ReLU())
        self.down_size = img_size // 2
        down_dim = 64 * (img_size // 2) ** 2
        self.fc = nn.Sequential(
            nn.Linear(down_dim, 32),
            nn.BatchNorm1d(32, 0.8),
            nn.ReLU(inplace=True),
            nn.Linear(32, down_dim),
            nn.BatchNorm1d(down_dim),
            nn.ReLU(inplace=True),
        )
        self.up = nn.Sequential(
            nn.Upsample(scale_factor=2), nn.Conv2d(64, channels, 3, 1, 1)
        )

    def forward(self, img):
        out = self.down(img)
        out = self.fc(out.view(out.size(0), -1))
        out = self.up(out.view(out.size(0), 64, self.down_size, self.down_size))
        return out


def test_began_discriminator_import_forward():
    from tpugan.models.began import BEGANDiscriminator

    td = randomize(_TorchBeganD(), 7).eval()
    D = BEGANDiscriminator(img_size=16, channels=1)
    x = _rng_img((2, 16, 16, 1), 10)
    params, bs = _transplant(D, td, x)

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


# ----------------------------------------------------- multi-head D trio


class _TorchAuxD(nn.Module):
    """The shared template-B aux-head discriminator the acgan/sgan/infogan
    scripts each re-declare (acgan/acgan.py:74-100, sgan/sgan.py:76-99,
    infogan/infogan.py:95-121) at img_size=16: conv trunk + adv head +
    extra heads per variant."""

    def __init__(self, img_size=16, channels=1, heads=()):
        super().__init__()

        def block(i, o, bn=True):
            b = [
                nn.Conv2d(i, o, 3, 2, 1),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Dropout2d(0.25),
            ]
            if bn:
                b.append(nn.BatchNorm2d(o, 0.8))
            return b

        self.conv_blocks = nn.Sequential(
            *block(channels, 16, bn=False), *block(16, 32), *block(32, 64),
            *block(64, 128),
        )
        ds = img_size // 2**4
        feat = 128 * ds**2
        self.heads = nn.ModuleList(
            [nn.Sequential(nn.Linear(feat, n), *tail) for n, tail in heads]
        )

    def forward(self, img):
        out = self.conv_blocks(img).view(img.shape[0], -1)
        return [h(out) for h in self.heads]


def _check_aux_d(torch_d, flax_d, seed):
    x = _rng_img((2, 16, 16, 1), seed)
    params, bs = _transplant(flax_d, torch_d, x)
    ours, _ = apply_mod(flax_d, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_d(nhwc_to_torch(x))
    assert len(ours) == len(theirs)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t.numpy(), atol=2e-5)


def test_acgan_discriminator_import_forward():
    from tpugan.models.acgan import ACGANDiscriminator

    td = randomize(
        _TorchAuxD(heads=[(1, [nn.Sigmoid()]), (10, [nn.Softmax(dim=-1)])]), 10
    ).eval()
    _check_aux_d(td, ACGANDiscriminator(n_classes=10), 11)


def test_sgan_discriminator_import_forward():
    from tpugan.models.sgan import SGANDiscriminator

    td = randomize(
        _TorchAuxD(heads=[(1, [nn.Sigmoid()]), (11, [nn.Softmax(dim=-1)])]), 11
    ).eval()
    _check_aux_d(td, SGANDiscriminator(num_classes=10), 12)


def test_infogan_discriminator_import_forward():
    from tpugan.models.infogan import InfoGANDiscriminator

    td = randomize(
        _TorchAuxD(heads=[(1, []), (10, [nn.Softmax(dim=-1)]), (2, [])]), 12
    ).eval()
    _check_aux_d(td, InfoGANDiscriminator(n_classes=10, code_dim=2), 13)


def test_acgan_generator_import_forward():
    """Embedding-times-z conditioning (acgan/acgan.py:50,70)."""
    from tpugan.models.acgan import ACGANGenerator

    class TG(nn.Module):
        def __init__(self, img_size=16, latent=8, n_classes=10, channels=1):
            super().__init__()
            self.label_emb = nn.Embedding(n_classes, latent)
            self.init_size = img_size // 4
            self.l1 = nn.Sequential(nn.Linear(latent, 128 * self.init_size**2))
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
                nn.Conv2d(64, channels, 3, stride=1, padding=1),
                nn.Tanh(),
            )

        def forward(self, z, labels):
            gen_input = torch.mul(self.label_emb(labels), z)
            out = self.l1(gen_input)
            out = out.view(out.shape[0], 128, self.init_size, self.init_size)
            return self.conv_blocks(out)

    tg = randomize(TG(), 13).eval()
    G = ACGANGenerator(img_size=16, channels=1, n_classes=10, latent_dim=8)
    z = _rng_img((3, 8), 14)
    labels = jnp.asarray([0, 4, 9], jnp.int32)
    params, bs = _transplant(G, tg, z, labels)

    ours, _ = apply_mod(G, params, bs, z, labels, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(
            tg(torch.from_numpy(np.asarray(z)), torch.from_numpy(np.asarray(labels)))
        )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


# ------------------------------------------------------------------- aae


class _TorchAAEEncoder(nn.Module):
    """aae/aae.py:46-67 minus the sampling (mu/logvar compared directly —
    reparameterization consumes RNG in the reference forward)."""

    def __init__(self, img_dim=64, latent=6):
        super().__init__()
        self.model = nn.Sequential(
            nn.Linear(img_dim, 512),
            nn.LeakyReLU(0.2, inplace=True),
            nn.Linear(512, 512),
            nn.BatchNorm1d(512),
            nn.LeakyReLU(0.2, inplace=True),
        )
        self.mu = nn.Linear(512, latent)
        self.logvar = nn.Linear(512, latent)

    def forward(self, img):
        x = self.model(img.view(img.shape[0], -1))
        return self.mu(x), self.logvar(x)


def test_aae_encoder_import_forward():
    from tpugan.models.aae import Encoder

    te = randomize(_TorchAAEEncoder(), 14).eval()
    E = Encoder(latent_dim=6)
    x = _rng_img((3, 8, 8, 1), 15)
    params, bs = _transplant(E, te, x)

    (mu, logvar), _ = apply_mod(E, params, bs, x, train=False)
    with torch.no_grad():
        tmu, tlv = te(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar), tlv.numpy(), atol=2e-5)


def test_aae_decoder_import_forward():
    from tpugan.models.aae import Decoder

    class TD(nn.Module):  # aae/aae.py:70-87
        def __init__(self, latent=6, img_dim=64):
            super().__init__()
            self.model = nn.Sequential(
                nn.Linear(latent, 512),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Linear(512, 512),
                nn.BatchNorm1d(512),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Linear(512, img_dim),
                nn.Tanh(),
            )

        def forward(self, z):
            return self.model(z).view(z.shape[0], 1, 8, 8)

    td = randomize(TD(), 15).eval()
    D = Decoder(img_shape=(8, 8, 1))
    z = _rng_img((3, 6), 16)
    params, bs = _transplant(D, td, z)

    ours, _ = apply_mod(D, params, bs, z, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(torch.from_numpy(np.asarray(z))))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


# --------------------------------------------------------------- pixelda


def test_pixelda_generator_import_forward():
    """z-injection residual translator (pixelda/pixelda.py:70-92)."""
    from tpugan.models.pixelda import PixelDAGenerator

    class TG(nn.Module):
        def __init__(self, img_size=16, latent=5, channels=1, n_res=2):
            super().__init__()
            self.img_size, self.channels = img_size, channels
            self.fc = nn.Linear(latent, channels * img_size**2)
            self.l1 = nn.Sequential(
                nn.Conv2d(channels * 2, 64, 3, 1, 1), nn.ReLU(inplace=True)
            )

            def res():  # pixelda.py:54-67
                return nn.Sequential(
                    nn.Conv2d(64, 64, 3, 1, 1),
                    nn.BatchNorm2d(64),
                    nn.ReLU(inplace=True),
                    nn.Conv2d(64, 64, 3, 1, 1),
                    nn.BatchNorm2d(64),
                )

            self.resblocks = nn.ModuleList([res() for _ in range(n_res)])
            self.l2 = nn.Sequential(nn.Conv2d(64, channels, 3, 1, 1), nn.Tanh())

        def forward(self, img, z):
            gen_input = torch.cat((img, self.fc(z).view(*img.shape)), 1)
            out = self.l1(gen_input)
            for r in self.resblocks:
                out = out + r(out)
            return self.l2(out)

    tg = randomize(TG(), 16).eval()
    G = PixelDAGenerator(img_size=16, channels=1, latent_dim=5, n_residual_blocks=2)
    x = _rng_img((2, 16, 16, 1), 17)
    z = _rng_img((2, 5), 18)
    params, bs = _transplant(G, tg, x, z)

    ours, _ = apply_mod(G, params, bs, x, z, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x), torch.from_numpy(np.asarray(z))))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_pixelda_classifier_import_forward():
    from tpugan.models.pixelda import PixelDAClassifier

    class TC(nn.Module):  # pixelda.py:120-142
        def __init__(self, img_size=16, channels=1, n_classes=10):
            super().__init__()

            def block(i, o, norm=True):
                layers = [nn.Conv2d(i, o, 3, 2, 1), nn.LeakyReLU(0.2, inplace=True)]
                if norm:
                    layers.append(nn.InstanceNorm2d(o))
                return layers

            self.model = nn.Sequential(
                *block(channels, 64, norm=False), *block(64, 128),
                *block(128, 256), *block(256, 512),
            )
            ds = img_size // 2**4
            self.output_layer = nn.Sequential(
                nn.Linear(512 * ds**2, n_classes), nn.Softmax(dim=-1)
            )

        def forward(self, img):
            x = self.model(img)
            return self.output_layer(x.view(x.size(0), -1))

    # 32px: torch InstanceNorm2d rejects the 1x1 map a 16px input leaves
    # after four stride-2 convs.
    tc = randomize(TC(img_size=32), 17).eval()
    C = PixelDAClassifier(n_classes=10)
    x = _rng_img((2, 32, 32, 1), 19)
    params, bs = _transplant(C, tc, x)

    ours, _ = apply_mod(C, params, bs, x, train=False)
    with torch.no_grad():
        theirs = tc(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


# ------------------------------------------- U-Net family (disco / dual / ccgan)


def test_discogan_generator_import_forward():
    from tpugan.models.discogan import DiscoGenerator

    rm = import_reference_models("discogan")
    tg = randomize(rm.GeneratorUNet((3, 64, 64)), 18).eval()

    G = DiscoGenerator(channels=3)
    x = _rng_img((1, 64, 64, 3), 20)
    params, bs = _transplant(G, tg, x)

    ours, _ = apply_mod(G, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


def test_discogan_discriminator_import_forward():
    from tpugan.nn.im2im import PatchGAN

    rm = import_reference_models("discogan")
    td = randomize(rm.Discriminator((3, 64, 64)), 19).eval()

    D = PatchGAN(filters=(64, 128, 256), head_bias=True, init_mode="normal02")
    x = _rng_img((2, 64, 64, 3), 21)
    params, bs = _transplant(D, td, x)

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


@pytest.mark.slow
def test_dualgan_generator_import_forward():
    """7-down/6-up U-Net with affine INs and ConvTranspose final
    (dualgan/models.py:57-94; needs 128px for the full depth)."""
    from tpugan.models.dualgan import DualGenerator

    rm = import_reference_models("dualgan")
    tg = randomize(rm.Generator(channels=3), 20).train()

    G = DualGenerator(channels=3)
    x = _rng_img((1, 128, 128, 3), 22)
    params, bs = _transplant(G, tg, x, train=True)

    # Train mode on both sides (reference never .eval()s; its INs are
    # affine=True with default track_running_stats=False) — but dropout off:
    # torch functional dropout is stochastic, so eval it selectively.
    tg.eval()
    ours, _ = apply_mod(G, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)


def test_dualgan_discriminator_import_forward():
    from tpugan.nn.im2im import PatchGAN

    rm = import_reference_models("dualgan")
    td = randomize(rm.Discriminator(in_channels=3), 21).eval()

    D = PatchGAN(
        filters=(64, 128, 256), norm="batch08", head_bias=True,
        head_padding=0, init_mode="normal02",
    )
    x = _rng_img((2, 64, 64, 3), 23)
    params, bs = _transplant(D, td, x)

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_ccgan_generator_import_forward():
    """Low-res-injection U-Net (ccgan/models.py:45-80)."""
    from tpugan.models.ccgan import CCGANGenerator

    rm = import_reference_models("ccgan")
    tg = randomize(rm.Generator((3, 64, 64)), 22).eval()

    G = CCGANGenerator(channels=3)
    x = _rng_img((1, 64, 64, 3), 24)
    x_lr = _rng_img((1, 16, 16, 3), 25)
    params, bs = _transplant(G, tg, x, x_lr)

    ours, _ = apply_mod(G, params, bs, x, x_lr, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x), nhwc_to_torch(x_lr)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


# ------------------------------------------------------------ bicyclegan


@pytest.mark.slow
def test_bicyclegan_generator_import_forward():
    """U-Net G with the z-broadcast channel (bicyclegan/models.py:52-94)."""
    from tpugan.models.bicyclegan import BicycleGenerator

    rm = import_reference_models("bicyclegan")
    tg = randomize(rm.Generator(8, (3, 128, 128)), 23).eval()

    G = BicycleGenerator(channels=3, img_height=128, img_width=128)
    x = _rng_img((1, 128, 128, 3), 26)
    z = _rng_img((1, 8), 27)
    params, bs = _transplant(G, tg, x, z)

    ours, _ = apply_mod(G, params, bs, x, z, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x), torch.from_numpy(np.asarray(z))))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)


class _TorchBasicBlock(nn.Module):
    """torchvision.models.resnet.BasicBlock (not installed here), rebuilt
    with identical registration order: conv1, bn1, conv2, bn2, downsample."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchBicycleEncoder(nn.Module):
    """bicyclegan/models.py:102-118: resnet18 children[:-3] trunk +
    AvgPool(8) + twin fc heads."""

    def __init__(self, latent_dim=8):
        super().__init__()
        self.feature_extractor = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, 1),
            nn.Sequential(_TorchBasicBlock(64, 64), _TorchBasicBlock(64, 64)),
            nn.Sequential(_TorchBasicBlock(64, 128, 2), _TorchBasicBlock(128, 128)),
            nn.Sequential(_TorchBasicBlock(128, 256, 2), _TorchBasicBlock(256, 256)),
        )
        self.pooling = nn.AvgPool2d(kernel_size=8, stride=8, padding=0)
        self.fc_mu = nn.Linear(256, latent_dim)
        self.fc_logvar = nn.Linear(256, latent_dim)

    def forward(self, img):
        out = self.pooling(self.feature_extractor(img))
        out = out.view(out.size(0), -1)
        return self.fc_mu(out), self.fc_logvar(out)


@pytest.mark.slow
def test_bicyclegan_encoder_import_forward():
    from tpugan.models.bicyclegan import BicycleEncoder

    te = randomize(_TorchBicycleEncoder(), 24).eval()
    E = BicycleEncoder(latent_dim=8)
    x = _rng_img((2, 128, 128, 3), 28)
    params, bs = _transplant(E, te, x)

    (mu, logvar), _ = apply_mod(E, params, bs, x, train=False)
    with torch.no_grad():
        tmu, tlv = te(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(logvar), tlv.numpy(), atol=3e-5)


def test_bicyclegan_multidiscriminator_import_forward():
    """BN(0.8) 3-tower pyramid D (bicyclegan/models.py:126-165; the
    reference's downsample line has the in_channels NameError — rebuilt
    with the kernel-3 pool the munit twin uses)."""
    from tpugan.models.bicyclegan import BicycleMultiD

    class TMD(nn.Module):
        def __init__(self, channels=3):
            super().__init__()

            def block(i, o, norm=True):
                layers = [nn.Conv2d(i, o, 4, stride=2, padding=1)]
                if norm:
                    layers.append(nn.BatchNorm2d(o, 0.8))
                layers.append(nn.LeakyReLU(0.2))
                return layers

            self.models = nn.ModuleList()
            for _ in range(3):
                self.models.append(
                    nn.Sequential(
                        *block(channels, 64, norm=False), *block(64, 128),
                        *block(128, 256), *block(256, 512),
                        nn.Conv2d(512, 1, 3, padding=1),
                    )
                )
            self.downsample = nn.AvgPool2d(
                3, stride=2, padding=[1, 1], count_include_pad=False
            )

        def forward(self, x):
            outputs = []
            for m in self.models:
                outputs.append(m(x))
                x = self.downsample(x)
            return outputs

    td = randomize(TMD(), 25).eval()
    D = BicycleMultiD()
    x = _rng_img((1, 64, 64, 3), 29)
    params, bs = _transplant(D, td, x)

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = td(nhwc_to_torch(x))
    assert len(ours) == 3
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), torch_to_nhwc(t), atol=2e-5)


# ------------------------------------------------------------------ unit


def test_unit_encoder_import_forward():
    """UNIT E_i = domain trunk -> SHARED residual block (weight sharing
    across domains, unit/models.py:53-90). The torch Encoder registers
    model_blocks then shared_block; import both tpugan modules through one
    combined tree in that insertion order."""
    from tpugan.models.unit import UnitEncoderTrunk
    from tpugan.nn.im2im import ResidualBlockIN

    rm = import_reference_models("unit")
    shared = rm.ResidualBlock(features=64)
    te = randomize(rm.Encoder(3, dim=16, n_downsample=2, shared_block=shared), 30).eval()

    trunk = UnitEncoderTrunk(channels=3, dim=16, n_downsample=2)
    shared_f = ResidualBlockIN(64, init_mode="normal02")
    x = _rng_img((1, 32, 32, 3), 30)
    tp, _ = init_module(trunk, jax.random.PRNGKey(0), x)
    feat_shape = (1, 8, 8, 64)
    sp, _ = init_module(shared_f, jax.random.PRNGKey(1), jnp.zeros(feat_shape))
    combined, _ = import_state_dict({"trunk": tp, "shared": sp}, te.state_dict())

    feat, _ = apply_mod(trunk, combined["trunk"], None, x, train=False)
    mu, _ = apply_mod(shared_f, combined["shared"], None, feat, train=False)
    with torch.no_grad():
        tmu, _ = te(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(mu), torch_to_nhwc(tmu), atol=3e-5)


def test_unit_generator_import_forward():
    """UNIT G_i = SHARED residual block -> domain trunk
    (unit/models.py:93-122; shared_block registered FIRST)."""
    from tpugan.models.unit import UnitGeneratorTrunk
    from tpugan.nn.im2im import ResidualBlockIN

    rm = import_reference_models("unit")
    shared = rm.ResidualBlock(features=64)
    tg = randomize(rm.Generator(3, dim=16, n_upsample=2, shared_block=shared), 31).eval()

    shared_f = ResidualBlockIN(64, init_mode="normal02")
    trunk = UnitGeneratorTrunk(out_channels=3, dim=16, n_upsample=2)
    z = _rng_img((1, 8, 8, 64), 31)
    sp, _ = init_module(shared_f, jax.random.PRNGKey(0), z)
    tp, _ = init_module(trunk, jax.random.PRNGKey(1), z)
    combined, _ = import_state_dict({"shared": sp, "trunk": tp}, tg.state_dict())

    y, _ = apply_mod(shared_f, combined["shared"], None, z, train=False)
    img, _ = apply_mod(trunk, combined["trunk"], None, y, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(z)))
    np.testing.assert_allclose(np.asarray(img), theirs, atol=3e-5)


def test_unit_discriminator_import_forward():
    from tpugan.models.unit import UnitDiscriminator

    rm = import_reference_models("unit")
    td = randomize(rm.Discriminator((3, 64, 64)), 32).eval()

    D = UnitDiscriminator()
    x = _rng_img((2, 64, 64, 3), 32)
    params, bs = _transplant(D, td, x)
    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


# ----------------------------------------------------------- cluster_gan


def test_clustergan_encoder_import_forward():
    """Encoder_CNN (clustergan.py:196-245) — VALID-pad convs + flatten +
    twin-purpose latent head split zn / softmax zc."""
    from tpugan.models.cluster_gan import EncoderCNN

    class TE(nn.Module):
        def __init__(self, latent_dim=8, n_c=10):
            super().__init__()
            self.latent_dim = latent_dim
            self.model = nn.Sequential(
                nn.Conv2d(1, 64, 4, stride=2, bias=True),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Conv2d(64, 128, 4, stride=2, bias=True),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Flatten(),
                nn.Linear(128 * 5 * 5, 1024),
                nn.LeakyReLU(0.2, inplace=True),
                nn.Linear(1024, latent_dim + n_c),
            )

        def forward(self, x):
            z = self.model(x)
            zn = z[:, : self.latent_dim]
            zc_logits = z[:, self.latent_dim :]
            return zn, torch.softmax(zc_logits, dim=1), zc_logits

    te = randomize(TE(), 33).eval()
    E = EncoderCNN(latent_dim=8, n_c=10)
    x = _rng_img((2, 28, 28, 1), 33)
    params, bs = _transplant(E, te, x)
    (zn, zc, zc_logits), _ = apply_mod(E, params, bs, x, train=False)
    with torch.no_grad():
        tzn, tzc, tlg = te(nhwc_to_torch(x))
    np.testing.assert_allclose(np.asarray(zn), tzn.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(zc), tzc.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(zc_logits), tlg.numpy(), atol=2e-5)


# ------------------------------------------------------------- srgan D


def test_srgan_discriminator_import_forward():
    """The 8-conv SR discriminator family (srgan/models.py:74-105, shared
    shape with esrgan) — paired stride-1/stride-2 conv blocks with default
    eps BatchNorms."""
    from tpugan.nn.sr import SRDiscriminator

    rm = import_reference_models("srgan")
    td = randomize(rm.Discriminator((3, 64, 64)), 34).eval()

    D = SRDiscriminator()
    x = _rng_img((2, 64, 64, 3), 34)
    params, bs = _transplant(D, td, x)
    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = torch_to_nhwc(td(nhwc_to_torch(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)
