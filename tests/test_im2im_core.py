"""Tests for the image-to-image core: pix2pix, cyclegan, replay buffer,
paired/unpaired data transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.data.im2im import (
    joint_hflip_transform,
    synthetic_scene_pairs,
)
from tpugan.models import cyclegan, pix2pix
from tpugan.train.replay import replay_init, replay_push_and_pop


def test_replay_buffer_fills_then_swaps():
    buf = replay_init(4, (2, 2, 1))
    rng = jax.random.PRNGKey(0)
    b1 = jnp.ones((4, 2, 2, 1))
    buf, out = replay_push_and_pop(buf, b1, rng)
    # While filling, elements pass through unchanged (utils.py:22-26).
    assert np.allclose(np.asarray(out), 1.0)
    assert int(buf["count"]) == 4
    # Once full, ~half the outputs come from the buffer (utils.py:27-32).
    b2 = 2.0 * jnp.ones((64, 2, 2, 1))
    buf, out = replay_push_and_pop(buf, b2, jax.random.PRNGKey(1))
    vals = np.unique(np.asarray(out))
    assert 2.0 in vals and len(vals) > 1  # some old (1.0-era) values returned
    assert int(buf["count"]) == 4


def test_joint_hflip_flips_both_domains_identically():
    a = np.arange(2 * 4 * 4 * 1, dtype=np.uint8).reshape(2, 4, 4, 1)
    t = joint_hflip_transform(seed=3, prob=1.0)
    fa, fb = t((a, a.copy()), 0, 0)
    assert np.array_equal(fa, a[:, :, ::-1])
    assert np.array_equal(fa, fb)


def test_synthetic_scene_pairs_are_correlated():
    a, b = synthetic_scene_pairs(8, 32, 32, seed=0)
    assert a.shape == b.shape == (8, 32, 32, 3)
    # Same-geometry pairs correlate much better than mismatched ones.
    same = np.mean(
        [np.corrcoef(a[i].ravel(), b[i].ravel())[0, 1] for i in range(8)]
    )
    cross = np.mean(
        [np.corrcoef(a[i].ravel(), b[(i + 1) % 8].ravel())[0, 1] for i in range(8)]
    )
    assert same > cross


@pytest.mark.slow
def test_cyclegan_step_runs_finite():
    cfg = cyclegan.Config(
        batch_size=2, img_height=64, img_width=64, n_residual_blocks=1,
        synthetic_data=True,
    )
    modules = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, modules, steps_per_epoch=10)
    step = jax.jit(cyclegan.make_step(cfg, modules, steps_per_epoch=10))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    b = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    for _ in range(2):
        state, out = step(state, a, b)
    for k in ("d_loss", "g_loss", "loss_GAN", "loss_cycle", "loss_identity"):
        assert np.isfinite(float(out[k])), k
    # Replay buffers accumulated the fakes.
    assert int(state.aux["buf_A"]["count"]) == 4


def test_cyclegan_lr_decays_after_decay_epoch():
    from tpugan.train.optim import linear_decay_schedule

    sched = linear_decay_schedule(0.1, n_epochs=10, decay_start_epoch=5,
                                  steps_per_epoch=2)
    assert abs(float(sched(0)) - 0.1) < 1e-7
    # Factor stays 1.0 through epoch == decay_epoch (LambdaLR: 1 - max(0,
    # e-decay)/(n-decay) == 1 at e == decay); first drop at decay_epoch+1.
    assert abs(float(sched(10)) - 0.1) < 1e-7  # epoch 5
    assert float(sched(12)) < 0.0999  # epoch 6: factor 1 - 1/5
    assert abs(float(sched(12)) - 0.1 * (1 - 1 / 5)) < 1e-6
    assert abs(float(sched(19)) - 0.1 * (1 - 4 / 5)) < 1e-6  # epoch 9


def test_lr_schedule_floors_at_zero_past_the_decay_window():
    """The reference lambda (cyclegan/utils.py:36-44) goes NEGATIVE past
    n_epochs; a negative lr is gradient ASCENT and detonates the run
    (measured: a harness that left steps_per_epoch at its default 1
    crossed lr=0 at step 200 and blew up at step ~220 on every seed).
    No reference run trains past n_epochs, so flooring at 0 is exact
    LambdaLR parity on every reachable step and a guard past the end."""
    from tpugan.train.optim import linear_decay_schedule

    sched = linear_decay_schedule(0.1, n_epochs=10, decay_start_epoch=5,
                                  steps_per_epoch=2)
    assert abs(float(sched(20)) - 0.0) < 1e-12  # epoch 10: factor exactly 0
    for step in (21, 22, 40, 10_000):  # beyond the window: floored, never < 0
        assert float(sched(step)) == 0.0


@pytest.mark.slow
def test_pix2pix_step_runs_finite_256():
    cfg = pix2pix.Config(batch_size=1, synthetic_data=True)
    modules = pix2pix.build(cfg)
    state = pix2pix.create_state(cfg, modules)
    step = jax.jit(pix2pix.make_step(cfg, modules))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (1, 256, 256, 3), np.uint8)
    b = rng.integers(0, 255, (1, 256, 256, 3), np.uint8)
    state, out = step(state, a, b)
    for k in ("d_loss", "g_loss", "loss_pixel", "loss_GAN"):
        assert np.isfinite(float(out[k])), k


def test_pix2pix_patch_shape():
    """PatchGAN output = (B, H/16, W/16, 1) (pix2pix.py:57)."""
    cfg = pix2pix.Config(batch_size=1)
    modules = pix2pix.build(cfg)
    state = pix2pix.create_state(cfg, modules)
    img = jnp.zeros((1, 256, 256, 3))
    from tpugan.models._common import apply_mod

    pred, _ = apply_mod(
        modules["discriminator"], state.params["discriminator"], None, img, img
    )
    assert pred.shape == (1, 16, 16, 1)


def test_unet_param_count_matches_torch():
    """Param-count parity vs the reference modules (measured with torch on
    this host: GeneratorUNet 54,404,099 / Discriminator 2,767,808)."""
    cfg = pix2pix.Config()
    modules = pix2pix.build(cfg)
    state = pix2pix.create_state(cfg, modules)
    n_g = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(state.params["generator"])
    )
    n_d = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(state.params["discriminator"])
    )
    assert n_g == 54_404_099, n_g
    assert n_d == 2_767_808, n_d


def test_resnet_g_and_patchgan_param_count_matches_torch():
    """cyclegan GeneratorResNet(3ch, 9 blocks) = 11,378,179 params,
    Discriminator = 2,764,737 (measured with torch)."""
    cfg = cyclegan.Config()
    modules = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, modules)
    n_g = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(state.params["G_AB"])
    )
    n_d = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(state.params["D_A"])
    )
    assert n_g == 11_378_179, n_g
    assert n_d == 2_764_737, n_d


def test_cyclegan_batched_applications_match_unbatched():
    """The step batches each generator's adversarial+identity forwards and
    each discriminator's real+fake forwards into single applications
    (InstanceNorm is per-sample, so this is exact — cyclegan.py make_step).
    Pin equality of every loss against the reference's one-call-per-input
    composition (cyclegan/cyclegan.py:177-239)."""
    from tpugan.losses import l1, mse
    from tpugan.models._common import apply_mod
    from tpugan.train.state import normalize_uint8

    cfg = cyclegan.Config(
        batch_size=2, img_height=32, img_width=32, n_residual_blocks=1,
        synthetic_data=True,
    )
    modules = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, modules, steps_per_epoch=10)
    step = jax.jit(cyclegan.make_step(cfg, modules, steps_per_epoch=10))
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    b = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    _, out = step(state, a, b)

    # Unbatched recomputation from the SAME pre-step state.
    real_a, real_b = normalize_uint8(jnp.asarray(a)), normalize_uint8(
        jnp.asarray(b)
    )
    p = state.params
    G_AB, G_BA = modules["G_AB"], modules["G_BA"]
    D_A, D_B = modules["D_A"], modules["D_B"]
    id_a, _ = apply_mod(G_BA, p["G_BA"], None, real_a)
    id_b, _ = apply_mod(G_AB, p["G_AB"], None, real_b)
    loss_identity = (l1(id_a, real_a) + l1(id_b, real_b)) / 2
    fake_b, _ = apply_mod(G_AB, p["G_AB"], None, real_a)
    fake_a, _ = apply_mod(G_BA, p["G_BA"], None, real_b)
    pred_b, _ = apply_mod(D_B, p["D_B"], None, fake_b)
    pred_a, _ = apply_mod(D_A, p["D_A"], None, fake_a)
    loss_gan = (mse(pred_b, 1.0) + mse(pred_a, 1.0)) / 2
    recov_a, _ = apply_mod(G_BA, p["G_BA"], None, fake_b)
    recov_b, _ = apply_mod(G_AB, p["G_AB"], None, fake_a)
    loss_cycle = (l1(recov_a, real_a) + l1(recov_b, real_b)) / 2

    np.testing.assert_allclose(
        float(out["loss_identity"]), float(loss_identity), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out["loss_GAN"]), float(loss_gan), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out["loss_cycle"]), float(loss_cycle), rtol=1e-5
    )

    # D losses: same replay-buffer draw as inside the step.
    _, k_buf_a, k_buf_b = jax.random.split(state.rng, 3)
    _, fake_a_pool = replay_push_and_pop(
        state.aux["buf_A"], jax.lax.stop_gradient(fake_a), k_buf_a
    )
    _, fake_b_pool = replay_push_and_pop(
        state.aux["buf_B"], jax.lax.stop_gradient(fake_b), k_buf_b
    )
    pr_a, _ = apply_mod(D_A, p["D_A"], None, real_a)
    pf_a, _ = apply_mod(D_A, p["D_A"], None, fake_a_pool)
    pr_b, _ = apply_mod(D_B, p["D_B"], None, real_b)
    pf_b, _ = apply_mod(D_B, p["D_B"], None, fake_b_pool)
    d_loss = (
        (mse(pr_a, 1.0) + mse(pf_a, 0.0)) / 2
        + (mse(pr_b, 1.0) + mse(pf_b, 0.0)) / 2
    ) / 2
    np.testing.assert_allclose(float(out["d_loss"]), float(d_loss), rtol=1e-5)


def test_residual_remat_mode_is_bit_exact(monkeypatch):
    """TPUGAN_REMAT=names (selective remat of the residual trunk,
    nn/im2im.py:_residual_remat) must keep the param tree, forward, and
    gradients identical to the default path — it only changes what is
    stashed for backward."""
    from tpugan.nn.im2im import GeneratorResNet

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32
    )

    def build(mode):
        monkeypatch.setenv("TPUGAN_REMAT", mode)
        G = GeneratorResNet(channels=3, num_residual_blocks=3)
        params = G.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            return jnp.sum(G.apply({"params": p}, x) ** 2)

        v, g = jax.jit(jax.value_and_grad(loss))(params)
        return params, v, g

    p0, v0, g0 = build("off")
    for mode in ("trunk", "names"):
        p1, v1, g1 = build(mode)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)
        ):
            assert jnp.array_equal(a, b)
        assert float(v0) == float(v1)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            assert jnp.array_equal(a, b)
