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


def test_batchnorm_bf16_path_matches_f32():
    """The sub-fp32 BatchNorm branch (fused f32 stats, folded bf16
    normalize — nn/layers.py) must agree with the flax-helper fp32 path to
    bf16 tolerance, keep f32 running stats, and keep the param tree
    invariant across compute dtypes."""
    from tpugan.nn.layers import BatchNorm

    rng = np.random.default_rng(0)
    x = (rng.normal(size=(4, 8, 8, 32)) * 2.0 + 0.5).astype(np.float32)
    bn = BatchNorm(eps=1e-5, momentum=0.1)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    vb = bn.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.bfloat16))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vb)
    # Non-trivial affine params, shared by both arms.
    v = jax.tree_util.tree_map(lambda p: p, v)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (32,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.3, (32,)), jnp.float32)
    v = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": v["batch_stats"],
    }

    y32, m32 = bn.apply(v, jnp.asarray(x), True, mutable=["batch_stats"])
    yb, mb = bn.apply(
        v, jnp.asarray(x, jnp.bfloat16), True, mutable=["batch_stats"]
    )
    assert yb.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(yb, np.float32), np.asarray(y32), atol=5e-2, rtol=5e-2
    )
    # Running stats: f32 on both paths, equal to f32-stat tolerance.
    for a, b in zip(
        jax.tree_util.tree_leaves(m32), jax.tree_util.tree_leaves(mb)
    ):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
        )
    # Eval mode (running-stat normalize) agrees too.
    e32 = bn.apply(v, jnp.asarray(x), False)
    eb = bn.apply(v, jnp.asarray(x, jnp.bfloat16), False)
    assert eb.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(eb, np.float32), np.asarray(e32), atol=5e-2, rtol=5e-2
    )


def test_dtype_flag_resolves():
    from tpugan.nn.layers import resolve_dtype

    assert resolve_dtype("float32") is None
    assert resolve_dtype("bfloat16") == jnp.bfloat16
