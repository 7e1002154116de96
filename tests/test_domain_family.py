"""Smoke + semantics tests for the two-domain family (cogan, pixelda) and
cluster_gan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.data import ZipLoader, DeviceLoader, synthetic_mnistm_like
from tpugan.data.sources import synthetic_image_dataset
from tpugan.models import cluster_gan, cogan, pixelda


def _two_domain_batch(n=8, size=32):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (n, size, size, 3), np.uint8)
    la = rng.integers(0, 10, n).astype(np.int32)
    b = rng.integers(0, 255, (n, size, size, 3), np.uint8)
    lb = rng.integers(0, 10, n).astype(np.int32)
    return a, la, b, lb


def test_cogan_step_runs_finite():
    cfg = cogan.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    modules = cogan.build(cfg)
    state = cogan.create_state(cfg, modules)
    step = jax.jit(cogan.make_step(cfg, modules))
    batch = _two_domain_batch()
    for _ in range(2):
        state, out = step(state, *batch)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    assert out["gen_imgs1"].shape == (8, 32, 32, 3)
    assert out["gen_imgs2"].shape == (8, 32, 32, 3)
    # Coupled heads differ: the two domains' outputs are distinct.
    assert not np.allclose(
        np.asarray(out["gen_imgs1"]), np.asarray(out["gen_imgs2"])
    )


def test_pixelda_step_runs_with_accuracies():
    cfg = pixelda.Config(
        batch_size=8, latent_dim=10, n_residual_blocks=2, synthetic_data=True
    )
    modules = pixelda.build(cfg)
    state = pixelda.create_state(cfg, modules)
    step = jax.jit(pixelda.make_step(cfg, modules))
    batch = _two_domain_batch()
    state, out = step(state, *batch)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    assert 0.0 <= float(out["acc"]) <= 1.0
    assert 0.0 <= float(out["target_acc"]) <= 1.0
    assert out["fake_b"].shape == (8, 32, 32, 3)


def test_pixelda_shares_optimizer_between_g_and_classifier():
    cfg = pixelda.Config(batch_size=4, n_residual_blocks=1)
    state = pixelda.create_state(cfg)
    assert set(state.opt_state.keys()) == {"g", "discriminator"}


@pytest.mark.parametrize("wass", [False, True])
def test_cluster_gan_steps(wass):
    cfg = cluster_gan.Config(
        batch_size=8, latent_dim=12, wass_flag=wass, synthetic_data=True
    )
    modules = cluster_gan.build(cfg)
    state = cluster_gan.create_state(cfg, modules)
    full_step, d_step = cluster_gan.make_steps(cfg, modules)
    full_step = jax.jit(full_step)
    d_step = jax.jit(d_step)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 28, 28, 1), np.uint8)
    labels = np.zeros(8, np.int32)
    state, out = full_step(state, imgs, labels)
    assert np.isfinite(float(out["ge_loss"]))
    assert np.isfinite(float(out["d_loss"]))
    state, out = d_step(state, imgs, labels)
    assert np.isfinite(float(out["d_loss"]))
    assert "ge_loss" not in out
    # G outputs live in [0, 1] (Sigmoid head; data is ToTensor-only).
    g = np.asarray(out["gen_imgs"])
    assert g.min() >= 0.0 and g.max() <= 1.0
    assert g.shape == (8, 28, 28, 1)


def test_cluster_gan_bias_init_is_zero():
    cfg = cluster_gan.Config(batch_size=4, latent_dim=12)
    state = cluster_gan.create_state(cfg)
    # initialize_weights zeroes conv/linear biases (clustergan.py:106-116).
    d = state.params["discriminator"]
    biases = [
        np.asarray(v["bias"])
        for v in jax.tree_util.tree_leaves(
            d, is_leaf=lambda x: isinstance(x, dict) and "bias" in x
        )
        if isinstance(v, dict) and "bias" in v
    ]
    assert biases and all(float(np.abs(b).max()) == 0.0 for b in biases)


def test_zip_loader_independent_shuffles():
    ds1 = synthetic_image_dataset(64, 8, 1, seed=0)
    ds2 = synthetic_mnistm_like(ds1, seed=0)
    l1 = DeviceLoader([ds1.images, ds1.labels], 16, seed=0)
    l2 = DeviceLoader([ds2.images, ds2.labels], 16, seed=1)
    z = ZipLoader(l1, l2)
    assert len(z) == 4
    batches = list(z.epoch(0))
    assert len(batches) == 4
    assert len(batches[0]) == 4  # imgs1, labels1, imgs2, labels2
    # Different seeds -> the two domains' label streams differ.
    la = np.concatenate([np.asarray(b[1]) for b in batches])
    lb = np.concatenate([np.asarray(b[3]) for b in batches])
    assert not np.array_equal(la, lb)


def test_synthetic_mnistm_handles_non_multiple_of_4_sizes():
    """Regression: the coarse 4x-repeated background must cover (h, w)
    for any size, not just multiples of 4 (data/sources.py)."""
    from tpugan.data.sources import synthetic_image_dataset

    base = synthetic_image_dataset(4, img_size=30, channels=1, seed=0)
    out = synthetic_mnistm_like(base, seed=0)
    assert out.images.shape == (4, 30, 30, 3)
