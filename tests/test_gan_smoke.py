"""End-to-end smoke tests: a few real training steps per recipe on synthetic
data — finite losses, sample files written, resume round-trip (SURVEY.md §4
integration tier)."""

import os

import jax
import numpy as np

from tpugan.io.checkpoint import load_pytree, save_pytree
from tpugan.models import gan


def _cfg(tmp_path, **kw):
    return gan.Config(
        n_epochs=1,
        batch_size=16,
        img_size=28,
        synthetic_data=True,
        max_batches=3,
        sample_interval=2,
        output_dir=str(tmp_path),
        data_dir=str(tmp_path),
        log_interval=0,
        **kw,
    )


def test_gan_trains_and_samples(tmp_path):
    cfg = _cfg(tmp_path)
    state = gan.run(cfg)
    assert int(state.step) == 3
    imgs = os.listdir(os.path.join(str(tmp_path), "images"))
    assert "0.png" in imgs and "2.png" in imgs


def test_gan_losses_finite_and_params_move(tmp_path):
    cfg = _cfg(tmp_path)
    mods = gan.build(cfg)
    state0 = gan.create_state(cfg, mods)
    step = jax.jit(gan.make_step(cfg, mods))
    loader = gan.make_loader(cfg)
    batch = next(iter(loader.epoch(0)))
    state1, out = step(state0, *batch)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(state0.params)[0]
    leaf1 = jax.tree_util.tree_leaves(state1.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    mods = gan.build(cfg)
    state = gan.create_state(cfg, mods)
    path = os.path.join(str(tmp_path), "ckpt.msgpack")
    save_pytree(state, path)
    template = gan.create_state(cfg, mods)
    restored = load_pytree(template, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deterministic_given_seed(tmp_path):
    cfg = _cfg(tmp_path)
    outs = []
    for _ in range(2):
        mods = gan.build(cfg)
        state = gan.create_state(cfg, mods)
        step = jax.jit(gan.make_step(cfg, mods))
        loader = gan.make_loader(cfg)
        batch = next(iter(loader.epoch(0)))
        _, out = step(state, *batch)
        outs.append(float(out["g_loss"]))
    assert outs[0] == outs[1]
