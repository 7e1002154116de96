"""Data-parallel correctness on a virtual 8-device CPU mesh.

Asserts the GSPMD-sharded train step (batch sharded over the 'data' axis,
params replicated) produces the same numbers as the single-device step — the
framework's "multi-chip without a cluster" guarantee (SURVEY.md §2.4, §4).
"""

import jax
import numpy as np
import pytest

from tpugan.models import gan
from tpugan.parallel import batch_sharding, data_mesh, shard_state


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = gan.Config(
        batch_size=16, img_size=28, synthetic_data=True, latent_dim=16
    )
    mods = gan.build(cfg)
    state = gan.create_state(cfg, mods)
    step = gan.make_step(cfg, mods)
    imgs = np.random.default_rng(0).integers(
        0, 255, (16, 28, 28, 1), dtype=np.uint8
    )
    labels = np.zeros(16, np.int32)
    return cfg, state, step, imgs, labels


def test_dp_step_matches_single_device(setup):
    cfg, state, step, imgs, labels = setup
    # single device
    s1, out1 = jax.jit(step)(state, imgs, labels)

    mesh = data_mesh(jax.devices()[:8])
    sharded_state = shard_state(state, mesh)
    bsh = batch_sharding(mesh)
    imgs_sh = jax.device_put(imgs, bsh)
    labels_sh = jax.device_put(labels, bsh)
    s8, out8 = jax.jit(step)(sharded_state, imgs_sh, labels_sh)

    np.testing.assert_allclose(
        float(out1["d_loss"]), float(out8["d_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(out1["g_loss"]), float(out8["g_loss"]), rtol=1e-4
    )
    # Updated params agree (BatchNorm global-stat parity included).
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_dp_conv_model_matches_single_device():
    """Template-B (conv + BatchNorm + Dropout) DP equivalence."""
    from tpugan.models import dcgan

    cfg = dcgan.Config(
        batch_size=16, img_size=32, synthetic_data=True, latent_dim=16
    )
    mods = dcgan.build(cfg)
    state = dcgan.create_state(cfg, mods)
    step = dcgan.make_step(cfg, mods)
    imgs = np.random.default_rng(1).integers(
        0, 255, (16, 32, 32, 1), dtype=np.uint8
    )
    labels = np.zeros(16, np.int32)

    s1, out1 = jax.jit(step)(state, imgs, labels)
    mesh = data_mesh(jax.devices()[:8])
    s8, out8 = jax.jit(step)(
        shard_state(state, mesh),
        jax.device_put(imgs, batch_sharding(mesh)),
        jax.device_put(labels, batch_sharding(mesh)),
    )
    np.testing.assert_allclose(
        float(out1["d_loss"]), float(out8["d_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(out1["g_loss"]), float(out8["g_loss"]), rtol=2e-4
    )


def test_dp_grad_penalty_runs_sharded():
    """The jax.grad-of-grad WGAN-GP critic step compiles and runs under
    GSPMD sharding (double-backward through the sharded batch)."""
    from tpugan.models import wgan_gp

    cfg = wgan_gp.Config(
        batch_size=16, img_size=28, synthetic_data=True, latent_dim=16
    )
    mods = wgan_gp.build(cfg)
    state = wgan_gp.create_state(cfg, mods)
    d_step, g_step = wgan_gp.make_steps(cfg, mods)
    imgs = np.random.default_rng(2).integers(
        0, 255, (16, 28, 28, 1), dtype=np.uint8
    )
    labels = np.zeros(16, np.int32)
    mesh = data_mesh(jax.devices()[:8])
    state = shard_state(state, mesh)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    labels_sh = jax.device_put(labels, batch_sharding(mesh))
    state, out = jax.jit(d_step)(state, imgs_sh, labels_sh)
    assert np.isfinite(float(out["d_loss"]))


def test_dp_cyclegan_with_replay_buffer_runs_sharded():
    """Multi-module recipe with lax.scan replay-buffer aux state under DP."""
    from tpugan.models import cyclegan

    cfg = cyclegan.Config(
        batch_size=8, img_height=64, img_width=64, n_residual_blocks=1,
        synthetic_data=True,
    )
    mods = cyclegan.build(cfg)
    state = cyclegan.create_state(cfg, mods, steps_per_epoch=4)
    step = cyclegan.make_step(cfg, mods, steps_per_epoch=4)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (8, 64, 64, 3), np.uint8)
    b = rng.integers(0, 255, (8, 64, 64, 3), np.uint8)
    mesh = data_mesh(jax.devices()[:8])
    state = shard_state(state, mesh)
    state, out = jax.jit(step)(
        state,
        jax.device_put(a, batch_sharding(mesh)),
        jax.device_put(b, batch_sharding(mesh)),
    )
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    assert int(state.aux["buf_A"]["count"]) == 8


def test_batch_visibly_sharded(setup):
    cfg, state, step, imgs, labels = setup
    mesh = data_mesh(jax.devices()[:8])
    x = jax.device_put(imgs, batch_sharding(mesh))
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape[0] == 2  # 16 / 8


@pytest.mark.slow
def test_bench_dp_config_equivalence():
    """The scripts/bench_dp.py DP workload (fused K-step dispatch, sharded
    stacked batches) matches single-device numerics on the virtual mesh —
    the correctness side of the multi-chip throughput story."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_dp",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_dp.py"),
    )
    bench_dp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_dp)
    delta = bench_dp.check_equivalence(n_devices=8, batch=16)
    assert delta < 5e-4, f"DP-vs-single loss delta {delta}"


def test_auto_sharding_warns_on_indivisible_batch():
    """Silent single-device fallback is gone: a batch that cannot shard
    over the mesh warns (parallel/mesh.py:auto_sharding)."""
    import warnings

    from tpugan.parallel import auto_sharding

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert auto_sharding(7) is None
    assert any("SINGLE-DEVICE" in str(x.message) for x in w)
    assert auto_sharding(16) is not None
