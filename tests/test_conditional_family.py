"""Smoke tests for the conditional family (cgan, acgan, sgan, infogan)."""

import jax
import numpy as np
import pytest

from tpugan.models import acgan, cgan, infogan, sgan


def _batch(n=8, size=32):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (n, size, size, 1), np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int32)
    return imgs, labels


@pytest.mark.parametrize("mod", [cgan, acgan, sgan, infogan])
def test_step_runs_finite(mod):
    cfg = mod.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    modules = mod.build(cfg)
    state = mod.create_state(cfg, modules)
    step = jax.jit(mod.make_step(cfg, modules))
    imgs, labels = _batch()
    for _ in range(2):
        state, out = step(state, imgs, labels)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    assert out["gen_imgs"].shape == (8, 32, 32, 1)


def test_infogan_three_optimizers_independent():
    cfg = infogan.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    state = infogan.create_state(cfg)
    assert set(state.opt_state.keys()) == {"generator", "discriminator", "info"}
    # The info optimizer holds its OWN moments for BOTH modules
    # (duplicated-moment quirk, infogan.py:164-168): one count scalar fewer
    # than the two separate optimizers combined, same number of moment leaves.
    n_info = len(jax.tree_util.tree_leaves(state.opt_state["info"]))
    n_gd = len(jax.tree_util.tree_leaves(state.opt_state["generator"])) + len(
        jax.tree_util.tree_leaves(state.opt_state["discriminator"])
    )
    assert n_info == n_gd - 1


def test_acgan_accuracy_in_unit_interval():
    cfg = acgan.Config(batch_size=8, latent_dim=16)
    modules = acgan.build(cfg)
    state = acgan.create_state(cfg, modules)
    step = jax.jit(acgan.make_step(cfg, modules))
    imgs, labels = _batch()
    _, out = step(state, imgs, labels)
    acc = float(out["d_acc"])
    assert 0.0 <= acc <= 1.0


def test_cgan_conditioning_changes_output():
    cfg = cgan.Config(batch_size=4, latent_dim=16)
    modules = cgan.build(cfg)
    state = cgan.create_state(cfg, modules)
    from tpugan.models._common import apply_mod
    import jax.numpy as jnp

    z = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    a, _ = apply_mod(
        modules["generator"], state.params["generator"],
        state.model_state["generator"], z, jnp.zeros(4, jnp.int32), train=True,
    )
    b, _ = apply_mod(
        modules["generator"], state.params["generator"],
        state.model_state["generator"], z, jnp.ones(4, jnp.int32), train=True,
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))
