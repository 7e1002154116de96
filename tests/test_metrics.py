"""FID machinery tests."""

import jax.numpy as jnp
import numpy as np

from tpugan.metrics import fid_from_features, frechet_distance
from tpugan.metrics.fid import VGGFeatureModel, activation_statistics


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    mu, s = activation_statistics(x)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_frechet_distance_known_gaussians():
    """For isotropic Gaussians: FID = ||dmu||^2 + sum (sqrt(v1)-sqrt(v2))^2."""
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1 = np.eye(d) * 1.0
    s2 = np.eye(d) * 4.0
    expected = float(np.sum((mu1 - mu2) ** 2)) + d * (1.0 - 2.0) ** 2
    got = frechet_distance(mu1, s1, mu2, s2)
    assert abs(got - expected) < 1e-8


def test_fid_orders_distributions_sensibly():
    rng = np.random.default_rng(1)
    real = rng.normal(0, 1, (400, 16))
    close = rng.normal(0.1, 1, (400, 16))
    far = rng.normal(2.0, 3, (400, 16))
    assert fid_from_features(real, close) < fid_from_features(real, far)


def test_vgg_feature_model_shapes():
    model = VGGFeatureModel(data_dir="/nonexistent")
    batches = [jnp.zeros((2, 32, 32, 3)), jnp.zeros((3, 32, 32, 1))]
    feats = model(batches)
    assert feats.shape == (5, 256)
