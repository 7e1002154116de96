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
