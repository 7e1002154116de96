"""Shared training-loop runner.

Reproduces the reference's canonical ``for epoch: for batch:`` shape
(gan/gan.py:121-170) around a single jitted step: per-batch work is one
device dispatch (noise generation, G and D phases, metrics all inside jit);
the host only formats log lines and writes sample grids.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax


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
    for epoch in range(start_epoch, n_epochs):
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            state, out = step(state, *batch)
            batches_done = epoch * bpe + i
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
    return state
