"""Dataset sources.

The reference pulls MNIST/CIFAR via torchvision downloads
(/root/reference/implementations/gan/gan.py:97-109) and image-to-image data
via shell downloaders (data/download_*.sh). This environment has no network
egress, so sources here read from disk when present and fall back to a
deterministic synthetic procedural dataset (used by tests and benchmarks;
training on real data just requires dropping the standard files under
``--data_dir``).

Formats supported on disk:
- MNIST/FashionMNIST IDX files  (train-images-idx3-ubyte[.gz])
- image folders (PNG/JPEG)      via tpugan.data.folders
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import struct
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    """In-memory dataset of uint8 images (N, H, W, C) + int labels (N,)."""

    images: np.ndarray
    labels: np.ndarray

    def __post_init__(self):
        assert self.images.dtype == np.uint8 and self.images.ndim == 4
        assert len(self.images) == len(self.labels)

    def __len__(self) -> int:
        return len(self.images)


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def load_mnist(data_dir: str, train: bool = True) -> Optional[ArrayDataset]:
    """Load MNIST IDX files if present under several conventional layouts."""
    prefix = "train" if train else "t10k"
    candidates = [
        os.path.join(data_dir, "mnist"),
        os.path.join(data_dir, "mnist", "MNIST", "raw"),
        data_dir,
    ]
    for root in candidates:
        for ext in ("", ".gz"):
            img_p = os.path.join(root, f"{prefix}-images-idx3-ubyte{ext}")
            lbl_p = os.path.join(root, f"{prefix}-labels-idx1-ubyte{ext}")
            if os.path.exists(img_p) and os.path.exists(lbl_p):
                imgs = _read_idx(img_p)[..., None]  # (N, 28, 28, 1)
                labels = _read_idx(lbl_p).astype(np.int32)
                return ArrayDataset(imgs, labels)
    return None


def synthetic_image_dataset(
    n: int = 4096,
    img_size: int = 28,
    channels: int = 1,
    n_classes: int = 10,
    seed: int = 0,
) -> ArrayDataset:
    """Deterministic procedural dataset: class-conditioned Gaussian-bump
    glyphs with per-sample jitter. Non-degenerate (distinct per-class modes,
    continuous intra-class variation) so adversarial losses behave, and
    cheap enough to regenerate in tests."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:img_size, 0:img_size].astype(np.float32) / (img_size - 1)
    images = np.zeros((n, img_size, img_size, channels), np.float32)
    labels = rng.integers(0, n_classes, size=n).astype(np.int32)
    # Fixed per-class anchor blob layout.
    class_rng = np.random.default_rng(1234)
    anchors = class_rng.uniform(0.15, 0.85, size=(n_classes, 3, 2)).astype(np.float32)
    widths = class_rng.uniform(0.08, 0.2, size=(n_classes, 3)).astype(np.float32)
    for i in range(n):
        c = labels[i]
        jitter = rng.normal(0, 0.04, size=(3, 2)).astype(np.float32)
        img = np.zeros((img_size, img_size), np.float32)
        for b in range(3):
            cy, cx = anchors[c, b] + jitter[b]
            w = widths[c, b]
            img += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * w * w)))
        img = img / max(img.max(), 1e-6)
        for ch in range(channels):
            scale = 1.0 if channels == 1 else float(0.5 + 0.5 * ((c + ch) % 3) / 2)
            images[i, :, :, ch] = img * scale
    return ArrayDataset((images * 255).astype(np.uint8), labels)


def resize_dataset(ds: ArrayDataset, img_size: int) -> ArrayDataset:
    """One-time whole-dataset resize (replaces torchvision transforms.Resize
    applied per sample; bilinear ~ PIL default)."""
    if ds.images.shape[1] == img_size and ds.images.shape[2] == img_size:
        return ds
    import jax

    x = ds.images.astype(np.float32)
    out = jax.image.resize(
        x, (x.shape[0], img_size, img_size, x.shape[3]), method="bilinear"
    )
    out = np.asarray(jax.device_get(out))
    return ArrayDataset(np.clip(out, 0, 255).astype(np.uint8), ds.labels)


def load_mnistm(data_dir: str, train: bool = True) -> Optional[ArrayDataset]:
    """Load MNIST-M if present on disk.

    The reference downloads keras_mnistm.pkl.gz and pairs its RGB patches with
    MNIST labels (cogan/mnistm.py:19-146). Supported layouts here:
    ``<data_dir>/mnistm/keras_mnistm.pkl.gz`` (raw pickle; needs MNIST labels
    alongside) or the reference's processed ``mnist_m_train.pt`` (torch).
    """
    root = os.path.join(data_dir, "mnistm")
    name = "mnist_m_train.pt" if train else "mnist_m_test.pt"
    proc = os.path.join(root, "processed", name)
    if os.path.exists(proc):
        import torch

        data, labels = torch.load(proc, weights_only=False)
        imgs = np.asarray(data, dtype=np.uint8)
        if imgs.ndim == 3:  # (N, H, W) -> can't happen for RGB; guard anyway
            imgs = np.repeat(imgs[..., None], 3, -1)
        return ArrayDataset(imgs, np.asarray(labels, dtype=np.int32))
    raw = os.path.join(root, "raw", "keras_mnistm.pkl.gz")
    if os.path.exists(raw):
        import pickle

        mnist = load_mnist(data_dir, train=train)
        if mnist is None:
            return None
        with gzip.open(raw, "rb") as f:
            pkl = pickle.load(f, encoding="bytes")
        imgs = np.asarray(pkl[b"train" if train else b"test"], dtype=np.uint8)
        return ArrayDataset(imgs, mnist.labels[: len(imgs)])
    return None


def synthetic_mnistm_like(
    base: ArrayDataset, seed: int = 0
) -> ArrayDataset:
    """Procedural MNIST-M stand-in: blend grayscale glyphs over random color
    patches with the real dataset's |background - digit| construction, so the
    domain gap that pixelda/cogan train against actually exists."""
    rng = np.random.default_rng(seed + 77)
    n, h, w, _ = base.images.shape
    digits = base.images[..., :1].astype(np.float32) / 255.0
    # Smooth random RGB backgrounds (coarse noise upsampled by repetition).
    # Ceil division: for h/w not divisible by 4, the repeated grid must
    # still cover (h, w) before the trim.
    coarse = rng.uniform(0, 255, size=(n, -(-h // 4), -(-w // 4), 3))
    bg = np.repeat(np.repeat(coarse, 4, axis=1), 4, axis=2)[:, :h, :w, :]
    out = np.abs(bg - digits * 255.0)
    return ArrayDataset(
        np.clip(out, 0, 255).astype(np.uint8), base.labels.copy()
    )


def mnistm_or_synthetic(
    data_dir: str,
    img_size: int = 28,
    synthetic: bool = False,
    synthetic_n: int = 4096,
    seed: int = 0,
) -> Tuple[ArrayDataset, bool]:
    """MNIST-M from disk when available; else the procedural stand-in."""
    if not synthetic:
        ds = load_mnistm(data_dir)
        if ds is not None:
            return resize_dataset(ds, img_size), True
    base, _ = mnist_or_synthetic(
        data_dir, img_size=img_size, channels=1, synthetic=synthetic,
        synthetic_n=synthetic_n, seed=seed,
    )
    return synthetic_mnistm_like(base, seed=seed), False


def mnist_or_synthetic(
    data_dir: str,
    img_size: int = 28,
    channels: int = 1,
    synthetic: bool = False,
    synthetic_n: int = 4096,
    seed: int = 0,
) -> Tuple[ArrayDataset, bool]:
    """MNIST from disk when available (and not forced synthetic); else the
    procedural fallback. Returns (dataset, is_real)."""
    if not synthetic:
        ds = load_mnist(data_dir)
        if ds is not None:
            ds = resize_dataset(ds, img_size)
            if channels != 1:
                imgs = np.repeat(ds.images, channels, axis=-1)
                ds = ArrayDataset(imgs, ds.labels)
            return ds, True
    return (
        synthetic_image_dataset(synthetic_n, img_size, channels, seed=seed),
        False,
    )
