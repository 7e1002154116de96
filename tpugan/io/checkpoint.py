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


def module_payload(params: Any, batch_stats: Any = None) -> dict:
    """Per-module checkpoint payload. Carries BatchNorm running stats next
    to the params — torch's ``state_dict`` includes running stats, so the
    reference's weights-only resume (pix2pix/pix2pix.py:69-76) restores
    them too; a params-only payload would silently reset them."""
    return {"params": params, "batch_stats": batch_stats or {}}


def load_module_payload(
    params_template: Any, path: str, stats_template: Any = None
) -> dict:
    """Load one per-module ``.pth`` file, accepting BOTH payload formats:
    the current ``{params, batch_stats}`` wrapper and the legacy
    params-only tree written before running stats rode along. Legacy files
    load with ``batch_stats`` falling back to the template (fresh init) —
    the pre-change behavior — instead of failing on key mismatch."""
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    if isinstance(raw, dict) and set(raw.keys()) == {"params", "batch_stats"}:
        return serialization.from_bytes(
            module_payload(params_template, stats_template), data
        )
    params = serialization.from_state_dict(params_template, raw)
    return {"params": params, "batch_stats": stats_template or {}}


def save_modules(
    params_by_name: dict,
    directory: str,
    epoch: int,
    stats_by_name: dict | None = None,
) -> None:
    """Reference-style per-module checkpoints: one file per module named
    ``<module>_<epoch>.pth`` (pix2pix/pix2pix.py:204-207,
    cyclegan/cyclegan.py:279-284 — same names, flax msgpack payload of
    ``module_payload``)."""
    stats_by_name = stats_by_name or {}
    for name, params in params_by_name.items():
        save_pytree(
            module_payload(params, stats_by_name.get(name)),
            os.path.join(directory, f"{name}_{epoch}.pth"),
        )


def load_modules(
    template_by_name: dict,
    directory: str,
    epoch: int,
    stats_template_by_name: dict | None = None,
) -> tuple:
    """Resume from ``--epoch N`` files (pix2pix/pix2pix.py:69-76).

    Returns ``(params_by_name, stats_by_name)``; stats entries are ``{}``
    for stat-free modules."""
    stats_template_by_name = stats_template_by_name or {}
    params_out, stats_out = {}, {}
    for name, template in template_by_name.items():
        payload = load_module_payload(
            template,
            os.path.join(directory, f"{name}_{epoch}.pth"),
            stats_template_by_name.get(name),
        )
        params_out[name] = payload["params"]
        stats_out[name] = payload["batch_stats"]
    return params_out, stats_out
