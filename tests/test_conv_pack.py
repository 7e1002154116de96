"""Space-to-depth packed conv (ops/conv_pack.py) vs the direct lowering.

The packed path is an exact linear re-expression of the stride-1 conv;
accumulation grouping differs, so parity is tight-tolerance (not
bitwise). Gradients are covered because the packed path is used inside
jax.grad in production (the boundary convs of every im2im generator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.ops.conv_pack import conv_small_channel, packed_kernel_size


def _direct(x, kernel, bias, padding):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.reshape(1, 1, 1, -1)
    return y


@pytest.mark.parametrize(
    "shape,k,cin,cout,padding",
    [
        ((2, 32, 32), 7, 3, 8, 0),   # c7s1 entry shape class (pre-padded)
        ((1, 38, 38), 7, 3, 8, 0),   # reflection-padded 32px trunk entry
        ((1, 32, 32), 7, 8, 3, 3),   # c7s1 exit (small Cout) + zero pad
        ((2, 33, 47), 9, 3, 4, 4),   # srgan stem kernel, ragged spatial
        ((1, 24, 24), 5, 1, 8, 2),   # 1-channel input
    ],
)
def test_forward_parity(shape, k, cin, cout, padding):
    rng = np.random.default_rng(0)
    b, h, w = shape
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (k, k, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (cout,)), jnp.float32)
    got = conv_small_channel(x, kern, bias, padding=padding)
    want = _direct(x, kern, bias, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize(
    "shape,cin,cout,r",
    [
        ((2, 32, 32), 3, 8, 2),   # sr D entry / VGG conv1_1 shape class
        ((2, 32, 32), 3, 8, 4),
        ((1, 30, 30), 8, 3, 4),   # esrgan tail (small Cout), ragged blocks
        ((1, 30, 30), 3, 8, 8),
    ],
)
def test_k3_forward_parity(shape, cin, cout, r):
    """k=3 packing (kernel smaller than the pack factor — the r5 floor
    extension for the srgan/esrgan D entry, VGG conv1_1, and esrgan tail
    convs, srgan/models.py:74-95, esrgan/models.py:84)."""
    rng = np.random.default_rng(3)
    b, h, w = shape
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (cout,)), jnp.float32)
    got = conv_small_channel(x, kern, bias, padding=1, r=r)
    want = _direct(x, kern, bias, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_k3_gradient_parity():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 28, 28, 3)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (8,)), jnp.float32)
    tgt = jnp.asarray(rng.normal(0, 1, (1, 28, 28, 8)), jnp.float32)

    def loss(fn):
        def f(x, kern, bias):
            return jnp.mean((fn(x, kern, bias) - tgt) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))

    g_pack = loss(
        lambda x, k_, b_: conv_small_channel(x, k_, b_, padding=1, r=4)
    )(x, kern, bias)
    g_dir = loss(lambda x, k_, b_: _direct(x, k_, b_, 1))(x, kern, bias)
    for gp, gd, name in zip(g_pack, g_dir, ("x", "kernel", "bias")):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=3e-5, err_msg=name
        )


def test_gradient_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 30, 30, 3)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (7, 7, 3, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (8,)), jnp.float32)
    tgt = jnp.asarray(rng.normal(0, 1, (1, 24, 24, 8)), jnp.float32)

    def loss(fn):
        def f(x, kern, bias):
            return jnp.mean((fn(x, kern, bias) - tgt) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))

    g_pack = loss(lambda x, k_, b_: conv_small_channel(x, k_, b_))(x, kern, bias)
    g_dir = loss(lambda x, k_, b_: _direct(x, k_, b_, 0))(x, kern, bias)
    for gp, gd, name in zip(g_pack, g_dir, ("x", "kernel", "bias")):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=3e-5, err_msg=name
        )


def test_packed_kernel_size():
    assert packed_kernel_size(7, 8) == 2
    assert packed_kernel_size(9, 8) == 2
    assert packed_kernel_size(8, 8) == 2
    assert packed_kernel_size(17, 8) == 3
    assert packed_kernel_size(1, 8) == 1


def test_jit_and_vmap_compatible():
    # The packed path must stay trace-safe (static shapes only) — it runs
    # inside the jitted train step.
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (7, 7, 3, 4)), jnp.float32)
    got = jax.jit(lambda x, k_: conv_small_channel(x, k_, padding=3))(x, kern)
    want = _direct(x, kern, None, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _direct_s(x, kernel, bias, padding, stride):
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.reshape(1, 1, 1, -1)
    return y


@pytest.mark.parametrize(
    "shape,k,s,r,cin,cout,padding",
    [
        ((1, 64, 64), 4, 2, 4, 6, 8, 1),   # pix2pix D entry (models.py:114)
        ((1, 64, 64), 4, 2, 8, 3, 8, 1),   # UNetDown entry, deeper pack
        ((2, 30, 30), 5, 2, 8, 3, 8, 2),   # odd tail under stride
        ((1, 32, 32), 4, 4, 8, 3, 8, 1),   # stride == block phase count 2
        ((1, 32, 32), 8, 8, 8, 3, 8, 0),   # stride == r degenerate phases
    ],
)
def test_strided_forward_parity(shape, k, s, r, cin, cout, padding):
    """Strided packing: kh = r*a + q - s*p generalizes the stride-1 case
    (conv_pack.py:_pack_onehot); exact vs the direct strided lowering."""
    rng = np.random.default_rng(3)
    b, h, w = shape
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (k, k, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (cout,)), jnp.float32)
    got = conv_small_channel(x, kern, bias, padding=padding, r=r, stride=s)
    want = _direct_s(x, kern, bias, padding, s)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_strided_gradient_parity():
    """dgrad/wgrad through the strided packing vs the direct lowering
    (the pix2pix-family boundary convs train under jax.grad)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 6)), jnp.float32)
    kern = jnp.asarray(rng.normal(0, 0.2, (4, 4, 6, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (8,)), jnp.float32)
    tgt = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 8)), jnp.float32)

    def grads(fn):
        def f(x, kern, bias):
            return jnp.mean((fn(x, kern, bias) - tgt) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))

    g_pack = grads(
        lambda x, k_, b_: conv_small_channel(x, k_, b_, padding=1, r=4, stride=2)
    )(x, kern, bias)
    g_dir = grads(lambda x, k_, b_: _direct_s(x, k_, b_, 1, 2))(x, kern, bias)
    for gp, gd, name in zip(g_pack, g_dir, ("x", "kernel", "bias")):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=3e-5, err_msg=name
        )


def test_strided_packed_kernel_size():
    assert packed_kernel_size(4, 4, 2) == 1 + (3 + 4 - 2) // 4  # == 2
    assert packed_kernel_size(4, 8, 2) == 1 + (3 + 8 - 2) // 8  # == 2
    assert packed_kernel_size(4, 4, 4) == 1  # whole kernel inside one block
    assert packed_kernel_size(9, 8, 1) == 2  # stride-1 formula unchanged
