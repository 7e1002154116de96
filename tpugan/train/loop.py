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


class StepObserver:
    """Wires the BaseConfig observability flags (--metrics_jsonl,
    --profile_dir/--profile_steps, --debug_numerics) into a training loop.
    Profiling is call-count based (trace covers observed steps [1, 1+N)),
    so it works on resumed runs where batches_done starts high."""

    def __init__(self, cfg):
        self.sink = (
            MetricsSink(cfg.metrics_jsonl)
            if getattr(cfg, "metrics_jsonl", "")
            else None
        )
        self.profile_dir = getattr(cfg, "profile_dir", "")
        self.profile_steps = getattr(cfg, "profile_steps", 5)
        self._profiling = False
        self._calls = 0
        if getattr(cfg, "debug_numerics", False):
            jax.config.update("jax_debug_nans", True)

    def observe(self, batches_done: int, out: dict) -> None:
        # Skip call 0 (holds the compile); trace calls [1, 1+N).
        if self.profile_dir and self._calls == 1 and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
        if self._profiling and self._calls >= 1 + self.profile_steps:
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            jax.profiler.stop_trace()
            self._profiling = False
        if self.sink is not None:
            self.sink.write(batches_done, out)
        self._calls += 1

    def close(self) -> None:
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
        if self.sink is not None:
            self.sink.close()


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
    step = jax.jit(step_fn, donate_argnums=0) if jit else step_fn
    observer = StepObserver(cfg)
    for epoch in range(start_epoch, n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            batches_done = epoch * bpe + i
            state, out = step(state, *batch)
            observer.observe(batches_done, out)
            if callbacks.log and cfg.log_interval > 0 and i % cfg.log_interval == 0:
                callbacks.log(epoch, i, bpe, out)
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
    observer.close()
    return state
