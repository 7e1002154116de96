"""Shared plumbing for the template-C (image-to-image) recipes.

Covers the copy-pasted stanzas of the 13 models.py-bearing scripts:
the ``\\r``-overwriting ETA log line (pix2pix/pix2pix.py:178-198), the
``images/<dataset>/`` + ``saved_models/<dataset>/`` output layout
(pix2pix/pix2pix.py:44-45), per-epoch reference-named checkpoints and the
``--epoch N`` resume path (pix2pix/pix2pix.py:69-76,204-207).
"""

from __future__ import annotations

import datetime
import os
import sys
import time

from tpugan.io.checkpoint import load_modules, save_modules
from tpugan.train.loop import StepObserver  # noqa: F401 — shared by the
# hand-rolled im2im loops (re-export keeps their import site stable).


class EtaLogger:
    """pix2pix-style single-line progress with ETA from per-batch deltas
    (pix2pix/pix2pix.py:121,178-198)."""

    def __init__(self, n_epochs: int):
        self.n_epochs = n_epochs
        self.prev_time = time.time()
        self.prev_done = 0

    def line(self, epoch, i, bpe, body: str) -> None:
        batches_done = epoch * bpe + i
        batches_left = self.n_epochs * bpe - batches_done
        now = time.time()
        # Per-BATCH delta even when logging every log_interval batches.
        n = max(batches_done - self.prev_done, 1)
        time_left = datetime.timedelta(
            seconds=batches_left * (now - self.prev_time) / n
        )
        self.prev_time = now
        self.prev_done = batches_done
        sys.stdout.write(
            "\r[Epoch %d/%d] [Batch %d/%d] %s ETA: %s"
            % (epoch, self.n_epochs, i, bpe, body, time_left)
        )
        sys.stdout.flush()


def out_dirs(cfg):
    """images/<dataset_name>/ and saved_models/<dataset_name>/ under
    output_dir."""
    imgdir = os.path.join(cfg.output_dir, "images", cfg.dataset_name)
    ckptdir = os.path.join(cfg.output_dir, "saved_models", cfg.dataset_name)
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(ckptdir, exist_ok=True)
    return imgdir, ckptdir


def maybe_resume(state, cfg, module_names):
    """--epoch N resume: load per-module files (params + BatchNorm running
    stats, io/checkpoint.py:module_payload), else keep fresh init
    (weights_init already applied at build)."""
    if cfg.epoch != 0:
        _, ckptdir = out_dirs(cfg)
        templates = {n: state.params[n] for n in module_names}
        stats_tpl = {
            n: (state.model_state or {}).get(n) for n in module_names
        }
        params, stats = load_modules(templates, ckptdir, cfg.epoch, stats_tpl)
        state = state.replace(
            params={**state.params, **params},
            model_state={**(state.model_state or {}), **stats},
        )
    return state


def checkpoint_epoch(state, cfg, epoch, module_names):
    if cfg.checkpoint_interval != -1 and epoch % cfg.checkpoint_interval == 0:
        _, ckptdir = out_dirs(cfg)
        save_modules(
            {n: state.params[n] for n in module_names},
            ckptdir,
            epoch,
            {n: (state.model_state or {}).get(n) for n in module_names},
        )
