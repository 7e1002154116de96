"""Torch checkpoint interop (tpugan/io/torch_interop.py).

The migration contract: a reference-trained ``state_dict`` imports onto the
matching tpugan module and reproduces the SAME forward outputs, and tpugan
params export back to a strict-loadable, value-identical state_dict.
Reference modules are imported read-only from /root/reference to generate
real state_dicts (same scaffolding as tests/test_golden_parity.py).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tpugan.io.torch_interop import export_state_dict, import_state_dict
from tpugan.models._common import apply_mod, init_module


def _import_reference_models(name):
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


def _nhwc(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def _to_np(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


def test_cyclegan_generator_import_forward_and_export_roundtrip():
    from tpugan.nn.im2im import GeneratorResNet

    n_res = 2
    rm = _import_reference_models("cyclegan")
    tg = _randomize(rm.GeneratorResNet((3, 64, 64), n_res), 0).eval()
    sd = tg.state_dict()

    G = GeneratorResNet(channels=3, num_residual_blocks=n_res)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    params, bs = init_module(G, jax.random.PRNGKey(3), x)
    params, bs = import_state_dict(params, sd, bs)

    ours, _ = apply_mod(G, params, bs, x)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)

    # Export back: strict-loadable and value-identical.
    out = export_state_dict(params, sd, bs)
    tg2 = rm.GeneratorResNet((3, 64, 64), n_res)
    tg2.load_state_dict(out, strict=True)
    for k in sd:
        np.testing.assert_allclose(
            out[k].numpy() if hasattr(out[k], "numpy") else out[k],
            sd[k].numpy(),
            atol=1e-6,
            err_msg=k,
        )


def test_cyclegan_patchgan_import_forward():
    from tpugan.nn.im2im import PatchGAN

    rm = _import_reference_models("cyclegan")
    td = _randomize(rm.Discriminator((3, 64, 64)), 1).eval()

    D = PatchGAN(head_bias=True, init_mode="normal02zero")
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    params, bs = init_module(D, jax.random.PRNGKey(4), x)
    params, bs = import_state_dict(params, td.state_dict(), bs)

    ours, _ = apply_mod(D, params, bs, x)
    with torch.no_grad():
        theirs = _to_np(td(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_pix2pix_unet_import_forward():
    from tpugan.nn.im2im import GeneratorUNet

    rm = _import_reference_models("pix2pix")
    tg = _randomize(rm.GeneratorUNet(3, 3), 2).eval()

    G = GeneratorUNet(out_channels=3)
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 256, 256, 3)),
        jnp.float32,
    )
    params, bs = init_module(G, jax.random.PRNGKey(5), x, train=False)
    params, bs = import_state_dict(params, tg.state_dict(), bs)

    ours, _ = apply_mod(G, params, bs, x, train=False)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)


def test_batchnorm_running_stats_roundtrip():
    """BN running stats must ride along: torch model trained a few steps ->
    import -> eval-mode forwards agree; export returns the stats."""
    import torch.nn as nn

    from tpugan.nn.blocks import DCGANDiscriminator

    class TD(nn.Module):
        # dcgan/dcgan.py:74-99 discriminator (Sigmoid head).
        def __init__(self):
            super().__init__()

            def block(i, o, bn=True):
                layers = [
                    nn.Conv2d(i, o, 3, 2, 1),
                    nn.LeakyReLU(0.2, inplace=True),
                    nn.Dropout2d(0.25),
                ]
                if bn:
                    layers.append(nn.BatchNorm2d(o, 0.8))
                return layers

            self.model = nn.Sequential(
                *block(1, 16, bn=False), *block(16, 32),
                *block(32, 64), *block(64, 128),
            )
            self.adv_layer = nn.Sequential(
                nn.Linear(128 * 2 * 2, 1), nn.Sigmoid()
            )

        def forward(self, img):
            out = self.model(img)
            out = out.view(out.shape[0], -1)
            return self.adv_layer(out)

    td = _randomize(TD(), 3)
    # Feed a few train-mode batches so running stats become nontrivial.
    td.train()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for _ in range(3):
            td(torch.randn(8, 1, 32, 32, generator=g))
    td.eval()
    sd = td.state_dict()

    D = DCGANDiscriminator(sigmoid=True, init_mode="normal02")
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (4, 32, 32, 1)), jnp.float32
    )
    params, bs = init_module(D, jax.random.PRNGKey(6), x)
    params, bs = import_state_dict(params, sd, bs)

    ours, _ = apply_mod(D, params, bs, x, train=False)
    with torch.no_grad():
        theirs = td(_nhwc(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).reshape(-1), theirs.reshape(-1), atol=2e-5
    )

    out = export_state_dict(params, sd, bs)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            out[k].numpy(), sd[k].numpy(), atol=1e-6, err_msg=k
        )


def test_embedding_heuristic_cgan():
    """cgan's label Embedding (cgan/cgan.py:43) has a 2-D weight with no
    bias — must map to the flax Embed table, not a Linear."""
    from tpugan.models import cgan

    cfg = cgan.Config(img_size=8, channels=1, latent_dim=5, n_classes=4)
    G = cgan.build(cfg)["generator"]
    z = jnp.zeros((2, 5), jnp.float32)
    labels = jnp.zeros((2,), jnp.int32)
    params, bs = init_module(G, jax.random.PRNGKey(0), z, labels)

    import torch.nn as nn

    class TG(nn.Module):
        def __init__(self):
            super().__init__()
            self.label_emb = nn.Embedding(4, 4)

            def block(i, o, normalize=True):
                layers = [nn.Linear(i, o)]
                if normalize:
                    layers.append(nn.BatchNorm1d(o, 0.8))
                layers.append(nn.LeakyReLU(0.2, inplace=True))
                return layers

            self.model = nn.Sequential(
                *block(5 + 4, 128, normalize=False),
                *block(128, 256),
                *block(256, 512),
                *block(512, 1024),
                nn.Linear(1024, 64),
                nn.Tanh(),
            )

        def forward(self, noise, lab):
            gen_input = torch.cat((self.label_emb(lab), noise), -1)
            return self.model(gen_input)

    tg = _randomize(TG(), 4).eval()
    params, bs = import_state_dict(params, tg.state_dict(), bs)

    zz = jnp.asarray(
        np.random.default_rng(4).normal(0, 1, (2, 5)), jnp.float32
    )
    ll = jnp.asarray([1, 3], jnp.int32)
    ours, _ = apply_mod(G, params, bs, zz, ll, train=False)
    with torch.no_grad():
        theirs = tg(
            torch.from_numpy(np.asarray(zz)), torch.from_numpy(np.asarray(ll))
        ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).reshape(2, -1), theirs, atol=2e-5
    )


def test_context_encoder_generator_import_forward():
    """Encoder-decoder order regression: torch walks all down-convs before
    the up-conv-transposes, and several have identical (layout-transformed)
    kernel shapes — pairing must follow the flax INSERTION (call) order,
    not a name sort (ConvTranspose_* < Conv_*), or conv and conv-transpose
    kernels cross-assign silently."""
    from tpugan.models.context_encoder import CEGenerator

    rm = _import_reference_models("context_encoder")
    tg = _randomize(rm.Generator(channels=3), 6).eval()

    G = CEGenerator(channels=3)
    x = jnp.asarray(
        np.random.default_rng(6).normal(0, 1, (1, 128, 128, 3)), jnp.float32
    )
    params, bs = init_module(G, jax.random.PRNGKey(7), x, train=False)
    params, bs = import_state_dict(params, tg.state_dict(), bs)

    ours, _ = apply_mod(G, params, bs, x, train=False)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)


def test_srgan_generator_import_forward_and_export_roundtrip():
    """PReLU regression: srgan's generator carries lone 1-D 'weight'
    slopes (srgan/models.py:24) that must map to the flax scalar 'alpha'
    params, not be mistaken for norm scales."""
    from tpugan.nn.sr import SRGANGenerator

    rm = _import_reference_models("srgan")
    tg = _randomize(rm.GeneratorResNet(3, 3, n_residual_blocks=2), 8).eval()
    sd = tg.state_dict()

    G = SRGANGenerator(channels=3, n_residual_blocks=2)
    x = jnp.asarray(
        np.random.default_rng(8).normal(0, 1, (1, 24, 24, 3)), jnp.float32
    )
    params, bs = init_module(G, jax.random.PRNGKey(9), x, train=False)
    params, bs = import_state_dict(params, sd, bs)

    ours, _ = apply_mod(G, params, bs, x, train=False)
    with torch.no_grad():
        theirs = _to_np(tg(_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5)

    out = export_state_dict(params, sd, bs)
    tg2 = rm.GeneratorResNet(3, 3, n_residual_blocks=2)
    tg2.load_state_dict(out, strict=True)
    for k in sd:
        np.testing.assert_allclose(
            out[k].numpy(), sd[k].numpy(), atol=1e-6, err_msg=k
        )


def test_conversion_cli_roundtrip(tmp_path):
    """scripts/torch_checkpoint.py import -> export through the CLI
    entrypoint reproduces the torch state_dict bit-for-bit."""
    import runpy
    import sys as _sys

    rm = _import_reference_models("cyclegan")
    tg = _randomize(rm.GeneratorResNet((3, 32, 32), 1), 10).eval()
    src = str(tmp_path / "G_AB_0.pth")
    torch.save(tg.state_dict(), src)
    mid = str(tmp_path / "G_AB_0.tpugan.pth")
    back = str(tmp_path / "G_AB_0.back.pth")

    def run_cli(argv):
        old = _sys.argv
        _sys.argv = ["torch_checkpoint.py"] + argv
        try:
            runpy.run_path("scripts/torch_checkpoint.py", run_name="__main__")
        finally:
            _sys.argv = old

    common = ["--model", "cyclegan", "--module", "G_AB",
              "--n_residual_blocks", "1"]
    run_cli(["import", "--torch_pth", src, "--out", mid] + common)
    run_cli(["export", "--state", mid, "--template", src, "--out", back]
            + common)
    out_sd = torch.load(back, map_location="cpu")
    ref_sd = tg.state_dict()
    assert list(out_sd.keys()) == list(ref_sd.keys())
    for k in ref_sd:
        np.testing.assert_array_equal(
            out_sd[k].numpy(), ref_sd[k].numpy(), err_msg=k
        )
