"""In-model routing of the packed boundary conv (nn/layers.py:Conv).

The production gate fires only at >=128x128 spatial — too big for the
CPU suite — so these tests lower the module-level floor to exercise the
real dispatch inside a real generator, asserting (a) the param tree is
bit-identical across paths (checkpoint/transplant safety, and the
structure-never-depends-on-input-size invariant), and (b) forward/grad
outputs agree to tight tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpugan.nn.layers as L
from tpugan.nn.im2im import GeneratorResNet


@pytest.fixture
def low_floor(monkeypatch):
    monkeypatch.setattr(L, "_PACK3_MIN_PIXELS", 1)


def _build(img=32):
    g = GeneratorResNet(channels=3, num_residual_blocks=1, init_mode="normal02")
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, img, img, 3)), jnp.float32
    )
    return g, x


def test_param_tree_identical_across_paths(low_floor, monkeypatch):
    g, x = _build()
    v_pack = g.init(jax.random.PRNGKey(0), x, train=True)
    monkeypatch.setenv("TPUGAN_PACK3", "0")
    v_dir = g.init(jax.random.PRNGKey(0), x, train=True)
    flat_p = jax.tree_util.tree_flatten_with_path(v_pack)[0]
    flat_d = jax.tree_util.tree_flatten_with_path(v_dir)[0]
    assert [k for k, _ in flat_p] == [k for k, _ in flat_d]
    for (kp, lp), (_, ld) in zip(flat_p, flat_d):
        np.testing.assert_array_equal(np.asarray(lp), np.asarray(ld), err_msg=str(kp))


def test_forward_and_grad_parity_across_paths(low_floor, monkeypatch):
    g, x = _build()
    v = g.init(jax.random.PRNGKey(0), x, train=True)

    def loss(variables, x):
        return jnp.mean(g.apply(variables, x, train=True) ** 2)

    monkeypatch.setenv("TPUGAN_PACK3", "1")
    y_pack = g.apply(v, x, train=True)
    g_pack = jax.grad(loss)(v, x)
    monkeypatch.setenv("TPUGAN_PACK3", "0")
    y_dir = g.apply(v, x, train=True)
    g_dir = jax.grad(loss)(v, x)
    np.testing.assert_allclose(np.asarray(y_pack), np.asarray(y_dir), atol=3e-5)
    for (kp, gp), (_, gd) in zip(
        jax.tree_util.tree_flatten_with_path(g_pack)[0],
        jax.tree_util.tree_flatten_with_path(g_dir)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), atol=5e-4, err_msg=str(kp)
        )


def test_production_floor_keeps_small_maps_on_direct_path(monkeypatch):
    # At CPU-test sizes the gate must NOT fire (floor untouched here).
    # Assert the gate directly: make the packed op explode if reached.
    import tpugan.ops.conv_pack as conv_pack

    def _boom(*a, **k):  # pragma: no cover - reaching this IS the failure
        raise AssertionError("packed conv fired below the production floor")

    monkeypatch.setattr(conv_pack, "conv_small_channel", _boom)
    g, x = _build(img=32)
    v = g.init(jax.random.PRNGKey(0), x, train=True)
    y = g.apply(v, x, train=True)
    assert y.shape == x.shape


def test_small_stem_arm_routes_at_64px(monkeypatch):
    """The 64px-class stride-1 arm (srgan c9s1-64 stem, srgan/models.py:38)
    fires at the PRODUCTION floor with r=4 — measured 3.2x over direct
    (scripts/bench_pack_floor.py srgan_stem)."""
    calls = []
    import tpugan.ops.conv_pack as conv_pack

    real = conv_pack.conv_small_channel

    def spy(x, kernel, bias=None, padding=0, r=8, stride=1):
        calls.append((r, stride))
        return real(x, kernel, bias, padding=padding, r=r, stride=stride)

    monkeypatch.setattr(conv_pack, "conv_small_channel", spy)
    x = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    m = L.Conv(features=8, kernel_size=9, stride=1, padding=4)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 64, 64, 8)
    assert calls and all(c == (4, 1) for c in calls)
    # parity vs the direct path on the same params
    monkeypatch.setenv("TPUGAN_PACK3", "0")
    y_dir = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_dir), atol=3e-5)


def test_strided_arm_routes_and_matches(monkeypatch):
    """The stride-2 k=4 boundary arm (pix2pix/models.py:114 family) fires
    with r=4 above its floor; param tree and outputs match the direct
    path (floor lowered to CPU-friendly size)."""
    monkeypatch.setattr(L, "_PACK3_STRIDED_MIN_PIXELS", 1)
    calls = []
    import tpugan.ops.conv_pack as conv_pack

    real = conv_pack.conv_small_channel

    def spy(x, kernel, bias=None, padding=0, r=8, stride=1):
        calls.append((r, stride))
        return real(x, kernel, bias, padding=padding, r=r, stride=stride)

    monkeypatch.setattr(conv_pack, "conv_small_channel", spy)
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (1, 32, 32, 6)), jnp.float32
    )
    m = L.Conv(features=8, kernel_size=4, stride=2, padding=1)
    v_pack = m.init(jax.random.PRNGKey(0), x)
    y_pack = m.apply(v_pack, x)
    assert calls and all(c == (4, 2) for c in calls)
    monkeypatch.setenv("TPUGAN_PACK3", "0")
    v_dir = m.init(jax.random.PRNGKey(0), x)
    flat_p = jax.tree_util.tree_flatten_with_path(v_pack)[0]
    flat_d = jax.tree_util.tree_flatten_with_path(v_dir)[0]
    assert [k for k, _ in flat_p] == [k for k, _ in flat_d]
    y_dir = m.apply(v_pack, x)
    assert y_pack.shape == y_dir.shape == (1, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(y_pack), np.asarray(y_dir), atol=3e-5)


def test_strided_floor_keeps_small_maps_direct(monkeypatch):
    """Below _PACK3_STRIDED_MIN_PIXELS (and for k=3 SR-D blocks at any
    size) the stride-2 gate must not fire."""
    import tpugan.ops.conv_pack as conv_pack

    def _boom(*a, **k):  # pragma: no cover
        raise AssertionError("strided packed conv fired below the floor")

    monkeypatch.setattr(conv_pack, "conv_small_channel", _boom)
    x = jnp.asarray(
        np.random.default_rng(4).normal(0, 1, (1, 64, 64, 6)), jnp.float32
    )
    m = L.Conv(features=8, kernel_size=4, stride=2, padding=1)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 32, 32, 8)
    # k=3 stride-2 (srgan/esrgan D blocks) stays direct even above floor
    x3 = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (1, 128, 128, 3)), jnp.float32
    )
    m3 = L.Conv(features=8, kernel_size=3, stride=2, padding=1)
    v3 = m3.init(jax.random.PRNGKey(1), x3)
    assert m3.apply(v3, x3).shape == (1, 64, 64, 8)
