"""Tests for context_encoder + ccgan (inpainting family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.models import ccgan, context_encoder


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
def test_context_encoder_step_and_param_parity():
    cfg = context_encoder.Config(batch_size=2, synthetic_data=True)
    modules = context_encoder.build(cfg)
    state = context_encoder.create_state(cfg, modules)
    # torch: Generator(3) = 40,401,187; Discriminator(3) = 1,555,585.
    assert _count(state.params["generator"]) == 40_401_187
    assert _count(state.params["discriminator"]) == 1_555_585
    step = jax.jit(context_encoder.make_step(cfg, modules))
    imgs = np.random.default_rng(0).integers(0, 255, (2, 128, 128, 3), np.uint8)
    state, out = step(state, imgs)
    for k in ("d_loss", "g_adv", "g_pixel"):
        assert np.isfinite(float(out[k])), k


def test_context_encoder_random_mask_semantics():
    imgs = jnp.zeros((4, 16, 16, 3))
    masked, parts = context_encoder.random_mask(
        imgs, jax.random.PRNGKey(0), 16, 8
    )
    # Each image has exactly an 8x8 patch of ones.
    s = np.asarray(jnp.sum(masked, axis=(1, 2, 3)))
    assert np.allclose(s, 8 * 8 * 3)
    assert parts.shape == (4, 8, 8, 3)
    assert np.allclose(np.asarray(parts), 0.0)


def test_context_encoder_generator_outputs_mask_patch():
    """G maps 128px masked input -> 64px patch (models.py:24-37)."""
    cfg = context_encoder.Config(batch_size=1)
    modules = context_encoder.build(cfg)
    state = context_encoder.create_state(cfg, modules)
    from tpugan.models._common import apply_mod

    x = jnp.zeros((1, 128, 128, 3))
    y, _ = apply_mod(
        modules["generator"], state.params["generator"],
        state.model_state["generator"], x, train=False,
    )
    assert y.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_ccgan_step_and_param_parity():
    cfg = ccgan.Config(batch_size=2, synthetic_data=True)
    modules = ccgan.build(cfg)
    state = ccgan.create_state(cfg, modules)
    # torch: Generator((3,128,128)) = 29,257,731; D = 1,555,585.
    assert _count(state.params["generator"]) == 29_257_731
    assert _count(state.params["discriminator"]) == 1_555_585
    step = jax.jit(ccgan.make_step(cfg, modules))
    imgs = np.random.default_rng(0).integers(0, 255, (2, 128, 128, 3), np.uint8)
    state, out = step(state, imgs)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))


def test_ccgan_mask_fills_minus_one():
    imgs = jnp.zeros((2, 16, 16, 3))
    masked = ccgan.apply_random_mask(imgs, jax.random.PRNGKey(1), 16, 4)
    s = np.asarray(jnp.sum(masked, axis=(1, 2, 3)))
    assert np.allclose(s, -4 * 4 * 3)
