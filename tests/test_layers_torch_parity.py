"""Numerical parity of tpugan.nn layers against torch.nn (CPU).

The reference delegates all compute to torch.nn; these tests transplant
identical weights into both frameworks and assert elementwise agreement of
forward outputs, pinning down padding/stride/norm semantics.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from tpugan import nn as gnn
from tpugan.ops.image import avg_pool, pixel_shuffle, reflection_pad_2d, upsample_nearest

TOL = dict(rtol=1e-4, atol=1e-5)


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def test_linear_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 13)).astype(np.float32)
    tl = tnn.Linear(13, 7)
    layer = gnn.Linear(7)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda p: p, params)
    w = tl.weight.detach().numpy()  # (out, in)
    b = tl.bias.detach().numpy()
    params = {"params": {"Dense_0": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}}}
    ours = np.asarray(layer.apply(params, jnp.asarray(x)))
    theirs = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1), (2, 2, 4)])
def test_conv_parity(stride, padding, k):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 9, 9)).astype(np.float32)  # NCHW
    tc = tnn.Conv2d(5, 6, k, stride, padding)
    layer = gnn.Conv(6, k, stride, padding)
    w = tc.weight.detach().numpy()  # (out, in, kh, kw)
    b = tc.bias.detach().numpy()
    kernel = np.transpose(w, (2, 3, 1, 0))  # (kh, kw, in, out)
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}}
    ours = np.asarray(layer.apply(params, jnp.asarray(to_nhwc(x))))
    theirs = tc(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(to_nchw(ours), theirs, **TOL)


@pytest.mark.parametrize("stride,padding,k,hw", [(2, 1, 4, 7), (1, 0, 3, 5), (2, 0, 2, 8), (2, 1, 3, 6)])
def test_conv_transpose_parity(stride, padding, k, hw):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, hw, hw)).astype(np.float32)
    tc = tnn.ConvTranspose2d(3, 5, k, stride, padding)
    layer = gnn.ConvTranspose(5, k, stride, padding)
    w = tc.weight.detach().numpy()  # (in, out, kh, kw)
    b = tc.bias.detach().numpy()
    # flax transpose_kernel=True expects (kh, kw, out, in). The wrapper owns
    # the params directly on the k4/s2/p1 fast path and nests an inner
    # flax ConvTranspose otherwise — transplant wherever they live.
    kernel = np.transpose(w, (2, 3, 1, 0))
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)))

    def put(d):
        if "kernel" in d:
            return {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}
        return {k: put(v) for k, v in d.items()}

    params = {"params": put(variables["params"])}
    ours = np.asarray(layer.apply(params, jnp.asarray(to_nhwc(x))))
    theirs = tc(torch.from_numpy(x)).detach().numpy()
    assert to_nchw(ours).shape == theirs.shape
    np.testing.assert_allclose(to_nchw(ours), theirs, **TOL)


@pytest.mark.parametrize("eps", [1e-5, 0.8])
def test_batchnorm_train_parity(eps):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 4, 6, 6)).astype(np.float32)
    tb = tnn.BatchNorm2d(4, eps)
    tb.train()
    layer = gnn.BatchNorm(eps=eps)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)), train=True)
    ours, mutated = layer.apply(
        variables, jnp.asarray(to_nhwc(x)), train=True, mutable=["batch_stats"]
    )
    theirs = tb(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, rtol=1e-3, atol=1e-4)
    # Running-stat updates match torch exactly: momentum 0.1 and UNBIASED
    # batch variance folded into running_var (nn/layers.py:BatchNorm).
    bs = mutated["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), tb.running_mean.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bs["var"]), tb.running_var.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_instance_norm_parity():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 4, 5, 5)).astype(np.float32)
    ti = tnn.InstanceNorm2d(4)  # affine=False default
    layer = gnn.InstanceNorm()
    ours = layer.apply({"params": {}}, jnp.asarray(to_nhwc(x)))
    theirs = ti(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, **TOL)


def test_pixel_shuffle_parity():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 3, 3)).astype(np.float32)
    theirs = tnn.PixelShuffle(2)(torch.from_numpy(x)).detach().numpy()
    ours = pixel_shuffle(jnp.asarray(to_nhwc(x)), 2)
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, **TOL)


def test_upsample_nearest_parity():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    theirs = tnn.Upsample(scale_factor=2)(torch.from_numpy(x)).detach().numpy()
    ours = upsample_nearest(jnp.asarray(to_nhwc(x)), 2)
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, **TOL)


def test_reflection_pad_parity():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 2, 5, 5)).astype(np.float32)
    theirs = tnn.ReflectionPad2d(2)(torch.from_numpy(x)).detach().numpy()
    ours = reflection_pad_2d(jnp.asarray(to_nhwc(x)), 2)
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, **TOL)


def test_avg_pool_parity():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    theirs = tnn.AvgPool2d(3, stride=2, padding=1)(torch.from_numpy(x)).detach().numpy()
    ours = avg_pool(jnp.asarray(to_nhwc(x)), 3, 2, 1)
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, **TOL)


def test_dropout2d_drops_whole_channels():
    layer = gnn.Dropout2d(0.5)
    x = jnp.ones((4, 6, 6, 8))
    y = layer.apply({}, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    # each (sample, channel) plane is identically zero or identically scaled
    for b in range(4):
        for c in range(8):
            plane = y[b, :, :, c]
            assert np.all(plane == plane[0, 0])


def test_prelu_parity():
    x = np.linspace(-2, 2, 11).astype(np.float32)
    tp = tnn.PReLU()
    layer = gnn.PReLU()
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(layer.apply(params, jnp.asarray(x)))
    theirs = tp(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)


def test_batchnorm_multistep_running_stats_and_eval_parity():
    """Train-mode steps accumulate torch-identical running stats (unbiased
    variance, momentum 0.1), and the subsequent eval-mode forward matches
    torch .eval() without any B/(B-1) tolerance — the reference's inference
    path (esrgan/test_on_image.py:26)."""
    rng = np.random.default_rng(7)
    tb = tnn.BatchNorm2d(3, 0.8)
    with torch.no_grad():
        tb.weight.copy_(torch.from_numpy(rng.normal(1, 0.2, 3).astype(np.float32)))
        tb.bias.copy_(torch.from_numpy(rng.normal(0, 0.2, 3).astype(np.float32)))
    layer = gnn.BatchNorm(eps=0.8)
    x0 = rng.normal(size=(4, 3, 5, 5)).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x0)), train=True)
    variables = {
        "params": {
            "scale": jnp.asarray(tb.weight.detach().numpy()),
            "bias": jnp.asarray(tb.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }
    tb.train()
    for i in range(3):
        x = rng.normal(loc=i, scale=1 + i, size=(4, 3, 5, 5)).astype(np.float32)
        ours, mutated = layer.apply(
            variables, jnp.asarray(to_nhwc(x)), train=True, mutable=["batch_stats"]
        )
        theirs = tb(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, rtol=1e-4, atol=1e-5)
        variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tb.running_mean.detach().numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tb.running_var.detach().numpy(), rtol=1e-5, atol=1e-6,
    )
    tb.eval()
    xe = rng.normal(size=(2, 3, 5, 5)).astype(np.float32)
    ours = layer.apply(variables, jnp.asarray(to_nhwc(xe)), train=False)
    theirs = tb(torch.from_numpy(xe)).detach().numpy()
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, rtol=1e-5, atol=1e-6)


def test_instance_norm_tracked_stats_parity():
    """track_running_stats=True InstanceNorm (stargan/models.py:23): train
    forwards keep per-instance normalization while accumulating torch's
    running buffers; eval normalizes with the buffers."""
    rng = np.random.default_rng(9)
    ti = tnn.InstanceNorm2d(3, affine=True, track_running_stats=True)
    with torch.no_grad():
        ti.weight.copy_(torch.from_numpy(rng.normal(1, 0.2, 3).astype(np.float32)))
        ti.bias.copy_(torch.from_numpy(rng.normal(0, 0.2, 3).astype(np.float32)))
    layer = gnn.InstanceNorm(affine=True, track_running_stats=True)
    x0 = rng.normal(size=(4, 3, 6, 6)).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x0)), train=True)
    variables = {
        "params": {
            "scale": jnp.asarray(ti.weight.detach().numpy()),
            "bias": jnp.asarray(ti.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }
    ti.train()
    for i in range(3):
        x = rng.normal(loc=i, scale=1 + 0.5 * i, size=(4, 3, 6, 6)).astype(np.float32)
        ours, mutated = layer.apply(
            variables, jnp.asarray(to_nhwc(x)), train=True, mutable=["batch_stats"]
        )
        theirs = ti(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, rtol=1e-4, atol=1e-5)
        variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        ti.running_mean.detach().numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        ti.running_var.detach().numpy(), rtol=1e-5, atol=1e-6,
    )
    ti.eval()
    xe = rng.normal(size=(2, 3, 6, 6)).astype(np.float32)
    ours = layer.apply(variables, jnp.asarray(to_nhwc(xe)), train=False)
    theirs = ti(torch.from_numpy(xe)).detach().numpy()
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), theirs, rtol=1e-4, atol=1e-5)
