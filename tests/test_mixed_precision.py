"""Mixed-precision (--dtype bfloat16) smoke: bf16 conv/dense compute with
float32 params, norm statistics and loss accumulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.nn.layers import set_default_compute_dtype


@pytest.fixture
def bf16():
    set_default_compute_dtype(jnp.bfloat16)
    yield
    set_default_compute_dtype(None)


@pytest.mark.slow
def test_dcgan_step_bf16_finite(bf16):
    from tpugan.models import dcgan

    cfg = dcgan.Config(batch_size=8, img_size=32, latent_dim=16,
                       synthetic_data=True, dtype="bfloat16")
    mods = dcgan.build(cfg)
    state = dcgan.create_state(cfg, mods)
    # Params stay float32 (master weights).
    assert all(
        p.dtype == jnp.float32
        for p in jax.tree_util.tree_leaves(state.params)
    )
    step = jax.jit(dcgan.make_step(cfg, mods))
    imgs = np.random.default_rng(0).integers(0, 255, (8, 32, 32, 1), np.uint8)
    labels = np.zeros(8, np.int32)
    for _ in range(2):
        state, out = step(state, imgs, labels)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    # Losses accumulate in f32.
    assert out["d_loss"].dtype == jnp.float32


@pytest.mark.slow
def test_cyclegan_step_bf16_finite(bf16):
    from tpugan.models import cyclegan

    cfg = cyclegan.Config(
        batch_size=1, img_height=64, img_width=64, n_residual_blocks=1,
        synthetic_data=True, dtype="bfloat16",
    )
    mods = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, mods, steps_per_epoch=4)
    step = jax.jit(cyclegan.make_step(cfg, mods, steps_per_epoch=4))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    b = rng.integers(0, 255, (1, 64, 64, 3), np.uint8)
    state, out = step(state, a, b)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))


def test_dtype_flag_resolves():
    from tpugan.nn.layers import resolve_dtype

    assert resolve_dtype("float32") is None
    assert resolve_dtype("bfloat16") == jnp.bfloat16
