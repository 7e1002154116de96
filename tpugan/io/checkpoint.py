"""Crash-consistent checkpointing.

The reference checkpoints weights-only via torch.save every
``--checkpoint_interval`` epochs and resumes with ``--epoch N``
(pix2pix/pix2pix.py:69-76, 204-207). Here the FULL TrainState (params, both
optimizer states, step, RNG key, model-specific aux such as BEGAN's k or the
CycleGAN replay buffer) serializes via flax msgpack with a
write-temp-then-rename protocol, extending the reference's recovery story to
exact-resume (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Any, TypeVar

import jax
from flax import serialization

T = TypeVar("T")


def save_pytree(tree: Any, path: str) -> None:
    tree = jax.device_get(tree)
    data = serialization.to_bytes(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic on POSIX


def load_pytree(template: T, path: str) -> T:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_modules(params_by_name: dict, directory: str, epoch: int) -> None:
    """Reference-style per-module checkpoints: one file per module named
    ``<module>_<epoch>.pth`` (pix2pix/pix2pix.py:204-207,
    cyclegan/cyclegan.py:279-284 — same names, flax msgpack payload)."""
    for name, params in params_by_name.items():
        save_pytree(params, os.path.join(directory, f"{name}_{epoch}.pth"))


def load_modules(template_by_name: dict, directory: str, epoch: int) -> dict:
    """Resume from ``--epoch N`` files (pix2pix/pix2pix.py:69-76)."""
    out = {}
    for name, template in template_by_name.items():
        out[name] = load_pytree(
            template, os.path.join(directory, f"{name}_{epoch}.pth")
        )
    return out
