"""Smoke + semantics tests for the Wasserstein family (wgan, wgan_gp,
wgan_div, dragan)."""

import jax
import numpy as np
import pytest

from tpugan.models import dragan, wgan, wgan_div, wgan_gp


def _batch(n=8, size=28):
    imgs = np.random.default_rng(0).integers(0, 255, (n, size, size, 1), np.uint8)
    return imgs, np.zeros(n, np.int32)


@pytest.mark.parametrize("mod", [wgan, wgan_gp, wgan_div])
def test_critic_steps_run(mod):
    cfg = mod.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    modules = mod.build(cfg)
    state = mod.create_state(cfg, modules)
    d_step, g_step = mod.make_steps(cfg, modules)
    jd, jg = jax.jit(d_step), jax.jit(g_step)
    imgs, labels = _batch()
    state, d_out = jd(state, imgs, labels)
    assert np.isfinite(float(d_out["d_loss"]))
    state, g_out = jg(state, d_out["z"])
    assert np.isfinite(float(g_out["g_loss"]))
    assert g_out["gen_imgs"].shape == (8, 28, 28, 1)


def test_wgan_weights_clipped():
    cfg = wgan.Config(batch_size=8, latent_dim=16, clip_value=0.01)
    modules = wgan.build(cfg)
    state = wgan.create_state(cfg, modules)
    d_step, _ = wgan.make_steps(cfg, modules)
    imgs, labels = _batch()
    state, _ = jax.jit(d_step)(state, imgs, labels)
    for leaf in jax.tree_util.tree_leaves(state.params["discriminator"]):
        arr = np.asarray(leaf)
        assert arr.min() >= -0.01 - 1e-7 and arr.max() <= 0.01 + 1e-7
    # generator params NOT clipped
    g_max = max(
        np.abs(np.asarray(l)).max()
        for l in jax.tree_util.tree_leaves(state.params["generator"])
    )
    assert g_max > 0.01


def test_wgan_gp_penalty_increases_d_loss_scale():
    # With lambda=10, GP contributes a positive term at init.
    cfg = wgan_gp.Config(batch_size=8, latent_dim=16)
    modules = wgan_gp.build(cfg)
    state = wgan_gp.create_state(cfg, modules)
    imgs, labels = _batch()
    from tpugan.models._common import apply_mod
    from tpugan.train.state import normalize_uint8
    import jax.numpy as jnp

    real = normalize_uint8(jnp.asarray(imgs))

    def d_apply(x):
        out, _ = apply_mod(
            modules["discriminator"],
            state.params["discriminator"],
            state.model_state["discriminator"],
            x,
            train=True,
        )
        return out

    base = -float(jnp.mean(d_apply(real))) + float(jnp.mean(d_apply(real)))
    full = float(
        wgan_gp.d_loss_fn(d_apply, real, real * 0.5, jax.random.PRNGKey(0))
    )
    assert np.isfinite(full)
    assert full != base  # penalty active


def test_dragan_step_and_quirk_mode():
    for quirks in (False, True):
        cfg = dragan.Config(
            batch_size=8, latent_dim=16, img_size=32, reference_quirks=quirks
        )
        modules = dragan.build(cfg)
        state = dragan.create_state(cfg, modules)
        step = jax.jit(dragan.make_step(cfg, modules))
        imgs, labels = _batch(8, 32)
        state, out = step(state, imgs, labels)
        assert np.isfinite(float(out["d_loss"]))
        assert np.isfinite(float(out["g_loss"]))


def test_gp_gradients_finite_when_critic_gradient_is_zero():
    """torch Tensor.norm has subgradient 0 at 0; a plain jnp.sqrt would
    turn a critic dead-zone (dD/dx == 0) into NaN parameter gradients and
    permanently poison the run (ops/penalty.py:_safe_sqrt)."""
    import jax
    import jax.numpy as jnp

    from tpugan.ops.penalty import dragan_penalty, wgan_gp_penalty

    real = jnp.ones((2, 4, 4, 1))
    fake = jnp.zeros((2, 4, 4, 1))
    rng = jax.random.PRNGKey(0)

    def loss(theta):
        # Critic constant in its input -> dD/dx identically zero; theta
        # still reaches the output so there is a parameter gradient path.
        d_fn = lambda x: jnp.sum(x * 0.0) + theta * jnp.ones((x.shape[0],))
        return wgan_gp_penalty(d_fn, real, fake, rng) + dragan_penalty(
            d_fn, real, rng
        )

    g = jax.grad(loss)(jnp.float32(0.5))
    assert np.isfinite(float(g)), "NaN-poisoned gradient at zero norm"
    # Penalty values themselves: ||0|| - 1 squared = 1 each.
    np.testing.assert_allclose(float(loss(jnp.float32(0.5))), 2.0, atol=1e-6)
