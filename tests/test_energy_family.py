"""Smoke + semantics tests for bgan, softmax_gan, relativistic_gan, ebgan,
began, aae."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.models import aae, began, bgan, ebgan, relativistic_gan, softmax_gan


def _batch(n=8, size=32):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (n, size, size, 1), np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int32)
    return imgs, labels


@pytest.mark.parametrize(
    "mod,size",
    [
        (bgan, 28),
        (softmax_gan, 28),
        (relativistic_gan, 32),
        (ebgan, 32),
        (began, 32),
        (aae, 32),
    ],
)
def test_step_runs_finite(mod, size):
    cfg = mod.Config(batch_size=8, latent_dim=16, img_size=size, synthetic_data=True)
    modules = mod.build(cfg)
    state = mod.create_state(cfg, modules)
    step = jax.jit(mod.make_step(cfg, modules))
    imgs, labels = _batch(size=size)
    for _ in range(2):
        state, out = step(state, imgs, labels)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))


def test_began_k_progression():
    """k starts at 0 and stays in [0, 1] (began.py:142,192-193)."""
    cfg = began.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    modules = began.build(cfg)
    state = began.create_state(cfg, modules)
    assert float(state.aux["k"]) == 0.0
    step = jax.jit(began.make_step(cfg, modules))
    imgs, labels = _batch()
    for _ in range(3):
        state, out = step(state, imgs, labels)
    k = float(state.aux["k"])
    assert 0.0 <= k <= 1.0
    assert np.isfinite(float(out["M"]))


def test_softmax_gan_gradient_accumulation_parity():
    """G's update must see grad_G(d_loss + g_loss) — the reference
    accumulates d_loss.backward() into G's grads before stepping G
    (softmax_gan.py:128-159). Check the step moves G differently from a
    g_loss-only update by verifying d_loss depends on G params."""
    cfg = softmax_gan.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    modules = softmax_gan.build(cfg)
    state = softmax_gan.create_state(cfg, modules)
    imgs, labels = _batch(size=28)
    from tpugan.train.state import normalize_uint8
    from tpugan.models._common import apply_mod

    real = normalize_uint8(jnp.asarray(imgs))
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 16))

    def d_loss_wrt_g(g_params):
        gen, _ = apply_mod(
            modules["generator"], g_params, state.model_state["generator"], z,
            train=True,
        )
        d_real, _ = apply_mod(
            modules["discriminator"], state.params["discriminator"], None, real
        )
        d_fake, _ = apply_mod(
            modules["discriminator"], state.params["discriminator"], None, gen
        )
        part = jnp.sum(jnp.exp(-d_real)) + jnp.sum(jnp.exp(-d_fake))
        return (1.0 / 8) * jnp.sum(d_real) + jnp.log(part + 1e-8)

    g = jax.grad(d_loss_wrt_g)(state.params["generator"])
    norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
    assert sum(norms) > 0  # d_loss really does flow into G


@pytest.mark.slow
def test_relativistic_quirk_flag_changes_g_loss():
    imgs, labels = _batch()
    outs = {}
    for quirks in (False, True):
        cfg = relativistic_gan.Config(
            batch_size=8, latent_dim=16, reference_quirks=quirks
        )
        modules = relativistic_gan.build(cfg)
        state = relativistic_gan.create_state(cfg, modules)
        step = jax.jit(relativistic_gan.make_step(cfg, modules))
        _, out = step(state, imgs, labels)
        outs[quirks] = float(out["g_loss"])
    assert outs[False] != outs[True]


def test_ebgan_hinge_inactive_when_fake_loss_large():
    """When fake recon error exceeds the margin the hinge contributes 0 and
    d_loss == real recon MSE (ebgan.py:194-199)."""
    margin = max(1.0, 8 / 64.0)
    fake_mse = jnp.asarray(5.0)
    hinge = jnp.where(margin - fake_mse > 0, margin - fake_mse, 0.0)
    assert float(hinge) == 0.0


def test_aae_joint_optimizer_over_encoder_and_decoder():
    cfg = aae.Config(batch_size=8, latent_dim=16)
    state = aae.create_state(cfg)
    assert set(state.opt_state.keys()) == {"g", "discriminator"}
    # The joint optimizer's moment tree spans both encoder and decoder.
    flat = jax.tree_util.tree_leaves(state.opt_state["g"])
    n_g_params = len(jax.tree_util.tree_leaves(state.params["encoder"])) + len(
        jax.tree_util.tree_leaves(state.params["decoder"])
    )
    assert len(flat) == 2 * n_g_params + 1  # mu + nu + count
