"""--ragged_last_batch: reference epoch semantics (gan/gan.py:122-125 runs
the final len(ds) % batch_size samples; tpugan's default drops them)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpugan.data.loader import DeviceLoader, set_drop_last


def test_loader_ragged_tail_covers_every_sample():
    imgs = np.arange(10, dtype=np.uint8).reshape(10, 1, 1, 1)
    labels = np.arange(10, dtype=np.int32)
    loader = DeviceLoader(
        [imgs, labels], 4, shuffle=True, seed=0, drop_last=False
    )
    assert len(loader) == 3
    seen = []
    sizes = []
    for b_imgs, b_labels in loader.epoch(0):
        sizes.append(int(b_imgs.shape[0]))
        seen.extend(np.asarray(b_labels).tolist())
    assert sizes == [4, 4, 2]
    assert sorted(seen) == list(range(10))


def test_global_default_wires_and_restores():
    imgs = np.zeros((10, 1, 1, 1), np.uint8)
    labels = np.zeros((10,), np.int32)
    try:
        set_drop_last(False)
        assert len(DeviceLoader([imgs, labels], 4)) == 3
    finally:
        set_drop_last(True)
    assert len(DeviceLoader([imgs, labels], 4)) == 2


def test_ragged_tail_step_numerics_match_dropped_prefix():
    """The tail batch goes through the SAME jitted step (retraced for the
    tail shape): its update must equal applying the step un-jitted to the
    identical samples — i.e. shape-specialized compilation does not change
    numerics, so the run matches the reference's ragged loop exactly."""
    from tpugan.models import gan

    cfg = gan.Config(img_size=8, latent_dim=6, batch_size=4, synthetic_data=True)
    modules = gan.build(cfg)
    step = gan.make_step(cfg, modules)
    jstep = jax.jit(step)

    rng = np.random.default_rng(0)
    full = rng.integers(0, 255, (4, 8, 8, 1), dtype=np.uint8)
    tail = rng.integers(0, 255, (2, 8, 8, 1), dtype=np.uint8)

    s_jit = gan.create_state(cfg, modules)
    s_ref = gan.create_state(cfg, modules)
    for batch in (full, tail):
        labels = np.zeros((batch.shape[0],), np.int32)
        s_jit, out_jit = jstep(s_jit, jnp.asarray(batch), jnp.asarray(labels))
        s_ref, out_ref = step(s_ref, jnp.asarray(batch), jnp.asarray(labels))
        np.testing.assert_allclose(
            float(out_jit["d_loss"]), float(out_ref["d_loss"]), rtol=1e-5
        )
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_jit.params, s_ref.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-5


def test_run_training_fused_dispatch_handles_ragged_tail():
    """scan_steps chunks must flush (not stack) a ragged tail; the fused
    run's final params equal the per-step run's."""
    from tpugan.models import gan
    from tpugan.train.loop import Callbacks, run_training

    def train(k):
        cfg = gan.Config(
            img_size=8, latent_dim=6, batch_size=4, n_epochs=1,
            synthetic_data=True, steps_per_dispatch=k, log_interval=0,
        )
        modules = gan.build(cfg)
        state = gan.create_state(cfg, modules)
        imgs = np.random.default_rng(1).integers(
            0, 255, (10, 8, 8, 1), dtype=np.uint8
        )
        labels = np.zeros((10,), np.int32)
        loader = DeviceLoader(
            [imgs, labels], 4, shuffle=True, seed=0, drop_last=False
        )
        step = gan.make_step(cfg, modules)
        return run_training(
            cfg, loader, state, step, Callbacks(), n_epochs=1
        )

    s1 = train(1)
    s2 = train(2)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-6
