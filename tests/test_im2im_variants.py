"""Tests for discogan, dualgan, stargan, unit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.models import discogan, dualgan, stargan, unit


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def _pair(n=2, size=64):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (n, size, size, 3), np.uint8)
    b = rng.integers(0, 255, (n, size, size, 3), np.uint8)
    return a, b


def test_discogan_step_and_param_parity():
    cfg = discogan.Config(batch_size=2, synthetic_data=True)
    modules = discogan.build(cfg)
    state = discogan.create_state(cfg, modules)
    # torch: GeneratorUNet((3,64,64)) = 29,241,731; Discriminator = 662,977.
    assert _count(state.params["G_AB"]) == 29_241_731
    assert _count(state.params["D_A"]) == 662_977
    step = jax.jit(discogan.make_step(cfg, modules))
    state, out = step(state, *_pair())
    for k in ("d_loss", "g_loss", "loss_GAN", "loss_pixelwise", "loss_cycle"):
        assert np.isfinite(float(out[k])), k


@pytest.mark.slow
def test_dualgan_steps_and_param_parity():
    # 128px: the 7-down U-Net bottlenecks at 1x1 (128/2^7) — 64px collapses.
    cfg = dualgan.Config(batch_size=2, img_size=128, synthetic_data=True)
    modules = dualgan.build(cfg)
    state = dualgan.create_state(cfg, modules)
    # torch: Generator(3) = 41,828,995; Discriminator(3) = 663,745.
    assert _count(state.params["G_AB"]) == 41_828_995
    assert _count(state.params["D_A"]) == 663_745
    d_step, g_step = dualgan.make_steps(cfg, modules)
    d_step, g_step = jax.jit(d_step), jax.jit(g_step)
    a, b = _pair(size=128)
    state, d_out = d_step(state, a, b)
    assert np.isfinite(float(d_out["d_loss"]))
    state, g_out = g_step(state, a, b)
    assert np.isfinite(float(g_out["g_loss"]))
    assert np.isfinite(float(g_out["g_cycle"]))


def test_stargan_steps_and_param_parity():
    cfg = stargan.Config(
        batch_size=2, img_height=64, img_width=64, residual_blocks=2,
        synthetic_data=True,
    )
    modules = stargan.build(cfg)
    state = stargan.create_state(cfg, modules)
    d_step, g_step = stargan.make_steps(cfg, modules)
    d_step, g_step = jax.jit(d_step), jax.jit(g_step)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    labels = rng.integers(0, 2, (2, 5)).astype(np.float32)
    state, d_out = d_step(state, imgs, labels)
    for k in ("d_adv", "d_cls", "d_loss"):
        assert np.isfinite(float(d_out[k])), k
    state, g_out = g_step(state, imgs, labels, d_out["sampled_c"])
    for k in ("g_loss", "g_adv", "g_cls", "g_rec"):
        assert np.isfinite(float(g_out[k])), k


def test_stargan_g_step_regenerates_d_step_fake_exactly():
    """g_step recomputes fake_imgs = G(imgs, sampled_c) instead of
    receiving d_step's tensor (models/stargan.py make_steps docstring —
    matching the reference's second generator() call, stargan.py:246).
    That is exact ONLY while train-mode G output is independent of the IN
    running buffers d_step advanced (per-instance stats) and G has no
    dropout/noise; this pins the invariant so a future G edit that breaks
    it (running-stat normalization in train mode, dropout, stochastic
    layers) fails loudly instead of silently decoupling the two steps."""
    from tpugan.models._common import apply_mod
    from tpugan.train.state import normalize_uint8

    cfg = stargan.Config(
        batch_size=2, img_height=64, img_width=64, residual_blocks=2,
        synthetic_data=True,
    )
    modules = stargan.build(cfg)
    state0 = stargan.create_state(cfg, modules)
    d_step, _ = stargan.make_steps(cfg, modules)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    labels = rng.integers(0, 2, (2, 5)).astype(np.float32)
    state1, d_out = jax.jit(d_step)(state0, imgs, labels)

    G = modules["generator"]
    x = normalize_uint8(jnp.asarray(imgs))
    # d_step's fake: pre-step params + pre-step IN buffers.
    fake_d, _ = apply_mod(
        G, state0.params["generator"], state0.model_state["generator"],
        x, d_out["sampled_c"],
    )
    # g_step's regeneration: same (untouched) G params, but the buffers
    # d_step already advanced — exactly what g_loss_fn computes.
    assert not jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            state0.model_state["generator"], state1.model_state["generator"],
        )
    ), "d_step should advance the IN running buffers"
    fake_g, _ = apply_mod(
        G, state1.params["generator"], state1.model_state["generator"],
        x, d_out["sampled_c"],
    )
    np.testing.assert_array_equal(np.asarray(fake_d), np.asarray(fake_g))


def test_stargan_param_parity_128():
    # torch at (3,128,128), 6 res blocks, c_dim 5: G 8,430,531; D 44,762,048.
    cfg = stargan.Config()
    modules = stargan.build(cfg)
    state = stargan.create_state(cfg, modules)
    assert _count(state.params["generator"]) == 8_430_531
    assert _count(state.params["discriminator"]) == 44_762_048


def test_stargan_criterion_cls_matches_sum_over_batch():
    logit = jnp.asarray([[0.3, -0.2], [1.0, 0.5]])
    target = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    # Manual BCEWithLogits sum / batch.
    p = jax.nn.log_sigmoid
    total = -(
        p(logit[0, 0]) + p(-logit[0, 1]) + p(-logit[1, 0]) + p(logit[1, 1])
    )
    assert abs(float(stargan.criterion_cls(logit, target)) - float(total) / 2) < 1e-5


@pytest.mark.slow
def test_unit_step_weight_sharing_and_param_parity():
    cfg = unit.Config(
        batch_size=1, img_height=64, img_width=64, synthetic_data=True
    )
    modules = unit.build(cfg)
    state = unit.create_state(cfg, modules, steps_per_epoch=5)
    # torch: E1 incl shared = 5,385,856 with shared block = 1,180,160;
    # G1 incl shared = 5,385,603; D = 2,761,153.
    shared_e = _count(state.params["shared_E"])
    assert shared_e == 1_180_160
    assert _count(state.params["E1"]) + shared_e == 5_385_856
    assert _count(state.params["G1"]) + _count(state.params["shared_G"]) == 5_385_603
    assert _count(state.params["D1"]) == 2_761_153
    step = jax.jit(unit.make_step(cfg, modules, steps_per_epoch=5))
    a, b = _pair(n=1)
    state, out = step(state, a, b)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))


def test_unit_shared_block_is_actually_shared():
    """Both encoders must route through the SAME shared params — a gradient
    through E2's path must touch shared_E."""
    cfg = unit.Config(
        batch_size=1, img_height=64, img_width=64, synthetic_data=True
    )
    modules = unit.build(cfg)
    state = unit.create_state(cfg, modules, steps_per_epoch=5)
    x = jnp.zeros((1, 64, 64, 3)) + 0.3

    def loss(shared_params):
        p = {**state.params, "shared_E": shared_params}
        mu, _ = unit._encode(modules, p, "E2", x, jax.random.PRNGKey(0))
        return jnp.sum(mu**2)

    g = jax.grad(loss)(state.params["shared_E"])
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)) > 0
