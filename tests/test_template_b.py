"""Smoke + parity checks for the template-B recipes (dcgan, lsgan)."""

import jax
import numpy as np
import pytest

from tpugan.models import dcgan, lsgan


@pytest.mark.parametrize("mod", [dcgan, lsgan])
def test_step_runs_and_is_finite(mod):
    cfg = mod.Config(
        batch_size=8, img_size=32, latent_dim=16, synthetic_data=True
    )
    modules = mod.build(cfg)
    state = mod.create_state(cfg, modules)
    step = jax.jit(mod.make_step(cfg, modules))
    imgs = np.random.default_rng(0).integers(
        0, 255, (8, 32, 32, 1), dtype=np.uint8
    )
    labels = np.zeros(8, np.int32)
    for _ in range(2):
        state, out = step(state, imgs, labels)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    assert out["gen_imgs"].shape == (8, 32, 32, 1)
    # tanh output range
    g = np.asarray(out["gen_imgs"])
    assert g.min() >= -1.0 and g.max() <= 1.0


def test_dcgan_param_count_matches_reference_arch():
    """Shape/param-count check vs dcgan.py:45-99 at img_size=32."""
    cfg = dcgan.Config(img_size=32, channels=1, latent_dim=100)
    modules = dcgan.build(cfg)
    state = dcgan.create_state(cfg, modules)

    def count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))

    # torch: G = l1 (100*8192 + 8192) + convs/BNs; computed from the
    # reference definition:
    g_expect = (
        (100 * 128 * 8 * 8 + 128 * 8 * 8)  # l1
        + 2 * 128  # BN(128)
        + (128 * 128 * 9 + 128)  # conv1
        + 2 * 128  # BN(128, 0.8)
        + (128 * 64 * 9 + 64)  # conv2
        + 2 * 64  # BN(64, 0.8)
        + (64 * 1 * 9 + 1)  # conv3
    )
    assert count(state.params["generator"]) == g_expect
    d_expect = (
        (1 * 16 * 9 + 16)
        + (16 * 32 * 9 + 32)
        + 2 * 32
        + (32 * 64 * 9 + 64)
        + 2 * 64
        + (64 * 128 * 9 + 128)
        + 2 * 128
        + (128 * 2 * 2 * 1 + 1)  # adv linear on 2x2 feature map
    )
    assert count(state.params["discriminator"]) == d_expect


def test_lsgan_structural_deltas_from_dcgan():
    # lsgan.py:52-96 — G drops the first BatchNorm, D head drops Sigmoid.
    lm = lsgan.build(lsgan.Config())
    dm = dcgan.build(dcgan.Config())
    assert lm["discriminator"].sigmoid is False
    assert dm["discriminator"].sigmoid is True
    assert lm["generator"].first_bn is False
    assert dm["generator"].first_bn is True
    # fewer BN params in the lsgan generator
    ls = lsgan.create_state(lsgan.Config(latent_dim=8))
    ds = dcgan.create_state(dcgan.Config(latent_dim=8))

    def count(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))

    assert count(ls.params["generator"]) == count(ds.params["generator"]) - 2 * 128
