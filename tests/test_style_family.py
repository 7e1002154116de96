"""Tests for munit + bicyclegan (style/multimodal family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.models import bicyclegan, munit
from tpugan.nn.style import adain, multi_d_loss


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def _pair(n=2, size=64):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (n, size, size, 3), np.uint8)
    b = rng.integers(0, 255, (n, size, size, 3), np.uint8)
    return a, b


def test_adain_normalizes_then_styles():
    x = jnp.asarray(np.random.default_rng(0).normal(3.0, 2.0, (2, 8, 8, 4)))
    w = jnp.ones((2, 4)) * 2.0
    b = jnp.ones((2, 4)) * 5.0
    y = adain(x, w, b)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    s = np.asarray(jnp.std(y, axis=(1, 2)))
    assert np.allclose(m, 5.0, atol=1e-3)
    assert np.allclose(s, 2.0, atol=1e-2)


@pytest.mark.slow
def test_munit_step_and_param_parity():
    cfg = munit.Config(
        batch_size=1, img_height=64, img_width=64, synthetic_data=True
    )
    modules = munit.build(cfg)
    state = munit.create_state(cfg, modules, steps_per_epoch=5)
    # torch (128px defaults, size-independent): Encoder 4,872,968;
    # Decoder 5,432,067; MultiDiscriminator 8,283,459.
    assert _count(state.params["Enc1"]) == 4_872_968
    assert _count(state.params["Dec1"]) == 5_432_067
    assert _count(state.params["D1"]) == 8_283_459
    step = jax.jit(munit.make_step(cfg, modules, steps_per_epoch=5))
    state, out = step(state, *_pair(n=1))
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))


def test_munit_style_code_changes_output():
    cfg = munit.Config(batch_size=1, img_height=64, img_width=64)
    modules = munit.build(cfg)
    state = munit.create_state(cfg, modules)
    from tpugan.models._common import apply_mod

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.5, (1, 64, 64, 3)), jnp.float32
    )
    (c, _), _ = apply_mod(modules["Enc1"], state.params["Enc1"], None, x)
    s1 = jnp.zeros((1, cfg.style_dim))
    s2 = jnp.ones((1, cfg.style_dim))
    y1, _ = apply_mod(modules["Dec2"], state.params["Dec2"], None, c, s1)
    y2, _ = apply_mod(modules["Dec2"], state.params["Dec2"], None, c, s2)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_multi_d_returns_three_scales():
    cfg = munit.Config(img_height=64, img_width=64)
    modules = munit.build(cfg)
    state = munit.create_state(cfg, modules)
    from tpugan.models._common import apply_mod

    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = apply_mod(modules["D1"], state.params["D1"], None, x)
    assert len(outs) == 3
    # Patch pyramid: 64 -> 4, 32 -> 2, 16 -> 1.
    assert [o.shape[1] for o in outs] == [4, 2, 1]
    assert np.isfinite(float(multi_d_loss(outs, 1.0)))


@pytest.mark.slow
def test_bicyclegan_step_and_param_parity():
    cfg = bicyclegan.Config(
        batch_size=2, img_height=128, img_width=128, synthetic_data=True
    )
    modules = bicyclegan.build(cfg)
    state = bicyclegan.create_state(cfg, modules)
    # torch Generator(8, (3,128,128)) = 23,680,259.
    assert _count(state.params["generator"]) == 23_680_259
    step = jax.jit(bicyclegan.make_step(cfg, modules))
    state, out = step(state, *_pair(size=128))
    for k in (
        "loss_D_VAE", "loss_D_LR", "g_loss", "loss_pixel", "loss_kl",
        "loss_latent",
    ):
        assert np.isfinite(float(out[k])), k


def test_bicyclegan_encoder_outputs_mu_logvar():
    cfg = bicyclegan.Config(batch_size=2, img_height=128, img_width=128)
    modules = bicyclegan.build(cfg)
    state = bicyclegan.create_state(cfg, modules)
    from tpugan.models._common import apply_mod

    x = jnp.zeros((2, 128, 128, 3))
    (mu, logvar), _ = apply_mod(
        modules["encoder"], state.params["encoder"],
        state.model_state["encoder"], x, train=False,
    )
    assert mu.shape == (2, cfg.latent_dim)
    assert logvar.shape == (2, cfg.latent_dim)
