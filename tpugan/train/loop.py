"""Shared training-loop runner.

Reproduces the reference's canonical ``for epoch: for batch:`` shape
(gan/gan.py:121-170) around a single jitted step: per-batch work is one
device dispatch (noise generation, G and D phases, metrics all inside jit);
the host only formats log lines and writes sample grids.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Optional

import jax


class MetricsSink:
    """jsonl per-step scalar sink (the machine-readable counterpart of the
    reference's print-only telemetry, SURVEY.md §5)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a")

    def write(self, step: int, out: dict) -> None:
        rec = {"step": step}
        for k, v in out.items():
            try:
                if hasattr(v, "ndim") and v.ndim == 0:
                    rec[k] = float(v)
                elif isinstance(v, (int, float)):
                    rec[k] = float(v)
            except Exception:
                continue
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


@dataclasses.dataclass
class Callbacks:
    # log(epoch, batch_idx, batches_per_epoch, out_dict)
    log: Optional[Callable[[int, int, int, dict], None]] = None
    # sample(state, out_dict, batches_done)
    sample: Optional[Callable[[Any, dict, int], None]] = None
    # epoch_end(state, epoch) -> state | None
    epoch_end: Optional[Callable[[Any, int], Any]] = None


def run_training(
    cfg,
    loader,
    state,
    step_fn,
    callbacks: Callbacks,
    n_epochs: int,
    start_epoch: int = 0,
    sample_interval: int = 0,
    jit: bool = True,
):
    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    if getattr(cfg, "debug_numerics", False):
        jax.config.update("jax_debug_nans", True)
    step = jax.jit(step_fn, donate_argnums=0) if jit else step_fn
    sink = (
        MetricsSink(cfg.metrics_jsonl)
        if getattr(cfg, "metrics_jsonl", "")
        else None
    )
    profile_dir = getattr(cfg, "profile_dir", "")
    profile_steps = getattr(cfg, "profile_steps", 5)
    profiling = False
    for epoch in range(start_epoch, n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            batches_done = epoch * bpe + i
            # Trace steps [2, 2+N): skip compile + first dispatch.
            if profile_dir and batches_done == 2 and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            state, out = step(state, *batch)
            if profiling and batches_done >= 2 + profile_steps - 1:
                jax.block_until_ready(
                    jax.tree_util.tree_leaves(out)[0]
                )
                jax.profiler.stop_trace()
                profiling = False
            if callbacks.log and cfg.log_interval > 0 and i % cfg.log_interval == 0:
                callbacks.log(epoch, i, bpe, out)
            if sink is not None:
                sink.write(batches_done, out)
            if (
                callbacks.sample
                and sample_interval > 0
                and batches_done % sample_interval == 0
            ):
                callbacks.sample(state, out, batches_done)
        if callbacks.epoch_end is not None:
            new_state = callbacks.epoch_end(state, epoch)
            if new_state is not None:
                state = new_state
    if profiling:
        jax.profiler.stop_trace()
    if sink is not None:
        sink.close()
    return state
