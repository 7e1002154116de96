"""Frechet distance metrics (FID machinery).

The reference publishes no FID numbers (SURVEY.md §6) but BASELINE.json's
acceptance criterion is FID parity, so the harness lives here:

- ``frechet_distance``: the exact Frechet/Wasserstein-2 distance between two
  Gaussians, computed from (mu, sigma) pairs with the standard
  sqrtm(sigma1 @ sigma2) term (via eigendecomposition of the symmetrized
  product — numerically equivalent to scipy.linalg.sqrtm for SPD inputs).
- ``activation_statistics``: streaming mean/covariance over feature batches.
- ``fid_from_features``: end-to-end from two feature matrices.

The canonical FID backbone is ImageNet InceptionV3-pool3; this environment
has no pretrained weights on disk (zero egress), so ``FeatureModel.vgg19``
uses the VGG19Features(cut=18) backbone (optionally with converted weights,
see tpugan.nn.vgg) — self-consistent for tracking OUR training runs and for
reference-vs-tpugan comparisons when both sides use the same extractor.
Swap in InceptionV3 weights via the same npz mechanism for literature-
comparable numbers.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) float features -> (mu (D,), sigma (D, D)) with the standard
    unbiased covariance."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_product(sigma1: np.ndarray, sigma2: np.ndarray) -> np.ndarray:
    """tr(sqrtm(sigma1 @ sigma2)) for SPD sigma1/sigma2 without scipy:
    sqrtm(A B) shares eigenvalues with sqrtm(B^1/2 A B^1/2), which is
    symmetric PSD — use its eigendecomposition."""
    # B^(1/2) via eigendecomposition (B symmetric PSD).
    w2, v2 = np.linalg.eigh(sigma2)
    w2 = np.clip(w2, 0.0, None)
    b_half = (v2 * np.sqrt(w2)) @ v2.T
    m = b_half @ sigma1 @ b_half
    w = np.linalg.eigvalsh((m + m.T) / 2)
    return float(np.sqrt(np.clip(w, 0.0, None)).sum())


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """||mu1-mu2||^2 + tr(s1 + s2 - 2 sqrtm(s1 s2))."""
    diff = np.asarray(mu1, np.float64) - np.asarray(mu2, np.float64)
    tr_sqrt = _sqrtm_product(
        np.asarray(sigma1, np.float64), np.asarray(sigma2, np.float64)
    )
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt
    )


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    mu1, s1 = activation_statistics(real)
    mu2, s2 = activation_statistics(fake)
    return frechet_distance(mu1, s1, mu2, s2)


class InceptionFeatureModel:
    """Canonical FID backbone: InceptionV3 pool3 (2048-d) features
    (tpugan/metrics/inception.py). Weights drop in from
    ``<data_dir>/inception_v3.npz`` (scripts/convert_inception.py);
    He-random without it — self-consistent but not literature-comparable,
    same policy as the VGG fallback."""

    def __init__(self, data_dir: str = "data", value_range: str = "tanh"):
        import os

        from tpugan.metrics.inception import (
            InceptionV3Features,
            load_inception_npz,
        )

        self.module = InceptionV3Features()
        variables = self.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3))
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        npz = os.path.join(data_dir, "inception_v3.npz")
        self.pretrained = os.path.exists(npz)
        if self.pretrained:
            params, batch_stats = load_inception_npz(params, batch_stats, npz)
        self.variables = {"params": params, "batch_stats": batch_stats}

        @jax.jit
        def extract(variables, x):
            from tpugan.nn.vgg import imagenet_normalize

            if value_range == "tanh":
                x = (x + 1.0) / 2.0
            x = imagenet_normalize(x)
            return self.module.apply(variables, x)

        self._extract = extract

    def __call__(self, batches: Iterable[jax.Array]) -> np.ndarray:
        outs = []
        for b in batches:
            if b.shape[-1] == 1:
                b = jnp.repeat(b, 3, axis=-1)
            outs.append(
                np.asarray(jax.device_get(self._extract(self.variables, b)))
            )
        return np.concatenate(outs, axis=0)


def feature_model(data_dir: str = "data", value_range: str = "tanh"):
    """FID backbone selector: InceptionV3 when its converted checkpoint is
    on disk (literature-comparable), else the VGG19 extractor (optionally
    with its own npz; He-random fallback)."""
    import os

    if os.path.exists(os.path.join(data_dir, "inception_v3.npz")):
        return InceptionFeatureModel(data_dir=data_dir, value_range=value_range)
    return VGGFeatureModel(data_dir=data_dir, value_range=value_range)


class VGGFeatureModel:
    """Feature extractor wrapper for FID over image batches in [-1, 1] or
    [0, 1] (specify ``value_range``). Spatially mean-pools the VGG map to a
    (N, C) matrix."""

    def __init__(self, data_dir: str = "data", cut: int = 18,
                 value_range: str = "tanh"):
        from tpugan.nn.vgg import VGG19Features, load_vgg19_npz
        import os

        self.module = VGG19Features(cut=cut)
        self.value_range = value_range
        rng = jax.random.PRNGKey(0)
        variables = self.module.init(rng, jnp.zeros((1, 64, 64, 3)))
        params = variables["params"]
        npz = os.path.join(data_dir, "vgg19_features.npz")
        if os.path.exists(npz):
            params = load_vgg19_npz(params, npz)
        self.params = params

        @jax.jit
        def extract(params, x):
            from tpugan.nn.vgg import imagenet_normalize

            if value_range == "tanh":
                x = (x + 1.0) / 2.0
            x = imagenet_normalize(x)
            feats = self.module.apply({"params": params}, x)
            return jnp.mean(feats, axis=(1, 2))

        self._extract = extract

    def __call__(self, batches: Iterable[jax.Array]) -> np.ndarray:
        outs = []
        for b in batches:
            if b.shape[-1] == 1:  # grayscale -> RGB for the VGG stem
                b = jnp.repeat(b, 3, axis=-1)
            outs.append(np.asarray(jax.device_get(self._extract(self.params, b))))
        return np.concatenate(outs, axis=0)


def compute_fid(
    real_batches: Iterable[jax.Array],
    fake_batches: Iterable[jax.Array],
    data_dir: str = "data",
) -> float:
    model = feature_model(data_dir=data_dir)
    return fid_from_features(model(real_batches), model(fake_batches))
