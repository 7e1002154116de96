"""Shared scaffolding for weight-transplant golden-parity tests.

Used by tests/test_golden_parity*.py and tests/test_torch_interop.py-style
suites: import reference torch modules read-only from /root/reference
(torchvision stubbed — not installed, only needed for unused imports),
randomize them, and copy weights across layouts.
"""

import sys
import types

import numpy as np
import torch


def import_reference_models(name, module="models"):
    """Import /root/reference/implementations/<name>/<module>.py in
    isolation with torchvision stubbed."""
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = lambda *a, **k: None
    tvm.resnet18 = lambda *a, **k: None
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    path = f"/root/reference/implementations/{name}"
    sys.path.insert(0, path)
    if module in sys.modules:
        del sys.modules[module]
    m = __import__(module)
    sys.modules.pop(module, None)
    sys.path.remove(path)
    return m


def nhwc_to_torch(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def torch_to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def randomize(module, seed, scale=0.05):
    """Fill every param with N(0, scale) — breaks default-init symmetries
    (e.g. zeros biases) so transplant misrouting cannot pass by luck."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return module


def unwrap(d):
    """Descend wrapper scopes (tpugan.nn.layers wrap flax primitives) until
    the dict holding 'kernel'/'scale'/'gamma'."""
    while (
        isinstance(d, dict)
        and "kernel" not in d
        and "scale" not in d
        and "gamma" not in d
    ):
        assert len(d) == 1, list(d)
        d = next(iter(d.values()))
    return d


def copy_conv(t_conv, flax_leaf):
    """flax Conv kernel HWIO -> torch OIHW."""
    flax_leaf = unwrap(flax_leaf)
    k = np.asarray(flax_leaf["kernel"]).transpose(3, 2, 0, 1)
    assert tuple(t_conv.weight.shape) == k.shape, (
        tuple(t_conv.weight.shape),
        k.shape,
    )
    t_conv.weight.data = torch.from_numpy(k.copy())
    if t_conv.bias is not None:
        t_conv.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def copy_convT(t_conv, flax_leaf):
    """flax ConvTranspose kernel (transpose_kernel=True: HWOI) -> torch
    ConvTranspose2d weight (I, O, H, W)."""
    flax_leaf = unwrap(flax_leaf)
    k = np.asarray(flax_leaf["kernel"]).transpose(3, 2, 0, 1)
    assert tuple(t_conv.weight.shape) == k.shape, (
        tuple(t_conv.weight.shape),
        k.shape,
    )
    t_conv.weight.data = torch.from_numpy(k.copy())
    if t_conv.bias is not None:
        t_conv.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def copy_linear(t_lin, flax_leaf):
    flax_leaf = unwrap(flax_leaf)
    t_lin.weight.data = torch.from_numpy(np.asarray(flax_leaf["kernel"]).T.copy())
    if t_lin.bias is not None:
        t_lin.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def copy_norm(t_norm, flax_leaf):
    """Affine norm scale/bias (flax 'scale' or MUNIT-style 'gamma')."""
    flax_leaf = unwrap(flax_leaf)
    scale = flax_leaf.get("scale", flax_leaf.get("gamma"))
    bias = flax_leaf.get("bias", flax_leaf.get("beta"))
    t_norm.weight.data = torch.from_numpy(np.asarray(scale).copy())
    t_norm.bias.data = torch.from_numpy(np.asarray(bias).copy())


def copy_embedding(t_emb, flax_leaf):
    flax_leaf = unwrap(flax_leaf)
    t_emb.weight.data = torch.from_numpy(np.asarray(flax_leaf["embedding"]).copy())
