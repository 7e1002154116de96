"""Fused WGAN-GP closed-form penalty (ops/pallas_critic.py) vs the generic
jax.grad-of-grad penalty (ops/penalty.py) — value AND parameter gradients,
for both the XLA closed form and the Pallas kernels (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.models import wgan_gp
from tpugan.models._common import apply_mod
from tpugan.nn.layers import flatten_nchw
from tpugan.ops.pallas_critic import (
    extract_mlp_critic,
    mlp_gp_pallas,
    mlp_gp_xla,
    pallas_gp_supported,
)
from tpugan.ops.penalty import wgan_gp_penalty


@pytest.fixture(scope="module")
def setup():
    cfg = wgan_gp.Config(batch_size=8, latent_dim=16)
    mods = wgan_gp.build(cfg)
    state = wgan_gp.create_state(cfg, mods)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(0, 0.7, (8, 28, 28, 1)), jnp.float32)
    fake = jnp.asarray(rng.normal(0, 0.7, (8, 28, 28, 1)), jnp.float32)
    key = jax.random.PRNGKey(3)
    return mods, state, real, fake, key


def _generic(mods, d_params, real, fake, key):
    def d_apply(x):
        out, _ = apply_mod(mods["discriminator"], d_params, None, x,
                           train=True)
        return out

    return wgan_gp_penalty(d_apply, real, fake, key)


def _interp(real, fake, key):
    alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1), real.dtype)
    return flatten_nchw(alpha * real + (1.0 - alpha) * fake)


def _closed(fn, mods_params, x, **kw):
    w1, b1, w2, b2, w3 = extract_mlp_critic(mods_params)
    return fn(x, w1, b1, w2, b2, w3, **kw)


@pytest.mark.parametrize("variant", ["xla", "pallas"])
def test_value_and_param_grads_match_autodiff(setup, variant):
    mods, state, real, fake, key = setup
    d_params = state.params["discriminator"]
    x = _interp(real, fake, key)

    fn = mlp_gp_xla if variant == "xla" else (
        lambda *a: mlp_gp_pallas(*a, True))

    def closed_loss(p):
        return _closed(fn, p, x)

    def generic_loss(p):
        return _generic(mods, p, real, fake, key)

    v_gen, g_gen = jax.value_and_grad(generic_loss)(d_params)
    v_cls, g_cls = jax.value_and_grad(closed_loss)(d_params)
    np.testing.assert_allclose(float(v_cls), float(v_gen), rtol=1e-5)
    for path, a in jax.tree_util.tree_leaves_with_path(g_gen):
        b = g_cls
        for k in path:
            b = b[k.key]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=f"{variant}: grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_bias_grads_are_exactly_zero(setup):
    """The penalty is independent of every bias (masks have zero derivative
    a.e. — the same zeros autodiff produces)."""
    mods, state, real, fake, key = setup
    d_params = state.params["discriminator"]
    g = jax.grad(lambda p: _generic(mods, p, real, fake, key))(d_params)
    for i in range(3):
        assert float(np.abs(np.asarray(
            g[f"Linear_{i}"]["Dense_0"]["bias"])).max()) == 0.0


def test_extract_refuses_non_template_trees(setup):
    mods, state, *_ = setup
    assert extract_mlp_critic(state.params["generator"]) is None
    assert extract_mlp_critic({"Linear_0": {}}) is None
    d = state.params["discriminator"]
    assert extract_mlp_critic(d) is not None
    # Extra layer -> refuse.
    assert extract_mlp_critic({**d, "Linear_3": d["Linear_0"]}) is None


def test_supported_envelope():
    # The reference config: batch 64, 784 -> 512 -> 256.
    assert pallas_gp_supported(64, 784, 512, 256)
    # Misaligned hidden width / batch, or over-envelope W1.
    assert not pallas_gp_supported(63, 784, 512, 256)
    assert not pallas_gp_supported(64, 784, 500, 256)
    assert not pallas_gp_supported(64, 784 * 8, 512, 256)


def test_zero_gradient_dead_zone_is_safe():
    """All-negative w3 with zero m2 contribution can drive ||g|| -> 0; the
    q coefficient must follow torch's norm-at-0 subgradient (0), not NaN."""
    b, n0, n1, n2 = 8, 16, 128, 128
    x = jnp.zeros((b, n0))
    w1 = jnp.zeros((n0, n1))
    b1 = jnp.zeros((n1,))
    w2 = jnp.zeros((n1, n2))
    b2 = jnp.zeros((n2,))
    w3 = jnp.zeros((n2, 1))
    val, grads = jax.value_and_grad(
        lambda w: mlp_gp_xla(x, w, b1, w2, b2, w3), argnums=0
    )(w1)
    assert float(val) == 1.0  # (||0|| - 1)^2
    assert np.isfinite(np.asarray(grads)).all()


def test_d_step_with_fused_gp_matches_default(monkeypatch):
    """The production wiring: TPUGAN_PALLAS_GP=xla through wgan_gp's real
    d_step must produce the same loss and parameter update as the generic
    grad-of-grad path (same alpha stream, same math — the only freedom is
    instruction scheduling)."""
    cfg = wgan_gp.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    mods = wgan_gp.build(cfg)
    imgs = np.random.default_rng(5).integers(0, 255, (8, 28, 28, 1), np.uint8)
    labels = np.zeros(8, np.int32)

    def run(mode):
        if mode:
            monkeypatch.setenv("TPUGAN_PALLAS_GP", mode)
        else:
            monkeypatch.delenv("TPUGAN_PALLAS_GP", raising=False)
        state = wgan_gp.create_state(cfg, mods)
        d_step, _ = wgan_gp.make_steps(cfg, mods)
        state, out = jax.jit(d_step)(state, imgs, labels)
        return float(out["d_loss"]), state.params["discriminator"]

    loss_ref, p_ref = run("")
    loss_fused, p_fused = run("xla")
    np.testing.assert_allclose(loss_fused, loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )
