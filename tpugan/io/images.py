"""Sample-grid PNG writer with torchvision.utils.save_image parity.

The reference's primary observable output is PNG sample grids written every
``--sample_interval`` batches (gan/gan.py:169-170 et al.) with
``save_image(tensor, path, nrow, normalize=True)``. This module reproduces
torchvision's grid layout (padding=2, pad_value=0) and its normalize
semantics (min/max over the whole batch unless value_range is given).

Input convention: NHWC float arrays (host numpy or jax).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np


def _normalize(t: np.ndarray, value_range: Optional[Tuple[float, float]]) -> np.ndarray:
    if value_range is not None:
        low, high = value_range
    else:
        low, high = float(t.min()), float(t.max())
    t = np.clip(t, low, high)
    return (t - low) / (high - low + 1e-5)


def make_grid(
    images: np.ndarray,
    nrow: int = 8,
    padding: int = 2,
    normalize: bool = False,
    value_range: Optional[Tuple[float, float]] = None,
    pad_value: float = 0.0,
) -> np.ndarray:
    """(N, H, W, C) -> (grid_H, grid_W, C) float in [0, 1]."""
    images = np.asarray(images, dtype=np.float32)
    if normalize:
        images = _normalize(images, value_range)
    n, h, w, c = images.shape
    xmaps = min(nrow, n)
    ymaps = int(math.ceil(n / xmaps))
    gh = ymaps * (h + padding) + padding
    gw = xmaps * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, dtype=np.float32)
    k = 0
    for y in range(ymaps):
        for x in range(xmaps):
            if k >= n:
                break
            gy = y * (h + padding) + padding
            gx = x * (w + padding) + padding
            grid[gy : gy + h, gx : gx + w] = images[k]
            k += 1
    return grid


def save_image(
    images: np.ndarray,
    path: str,
    nrow: int = 8,
    normalize: bool = False,
    value_range: Optional[Tuple[float, float]] = None,
    padding: int = 2,
) -> None:
    """torchvision.utils.save_image parity: grid -> 8-bit PNG."""
    from PIL import Image

    arr = np.asarray(images, dtype=np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    grid = make_grid(arr, nrow=nrow, padding=padding, normalize=normalize,
                     value_range=value_range)
    if not normalize:
        grid = np.clip(grid, 0.0, 1.0)
    u8 = (grid * 255.0 + 0.5).astype(np.uint8)
    if u8.shape[-1] == 1:
        img = Image.fromarray(u8[..., 0], mode="L")
    else:
        img = Image.fromarray(u8, mode="RGB")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img.save(path)
