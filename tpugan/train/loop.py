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
import jax.numpy as jnp


def scan_steps(step_fn):
    """Fuse K sequential train steps into ONE device dispatch via lax.scan.

    The reference dispatches one optimizer step per Python loop iteration
    (gan/gan.py:121-170); on TPU the host->device dispatch latency for a
    millisecond-class step (DCGAN 64px is ~3 ms of compute) can exceed the
    compute itself, so the TPU-native loop scans K steps per dispatch.

    step_fn must be ``(state, *args) -> (state, out)`` with ``out`` a flat
    dict (the recipe-module contract). Returns ``steps(state, *stacked)``
    where each arg carries a leading K axis; the result ``out`` has every
    scalar entry stacked to shape [K] (one value per inner step, so per-step
    telemetry is preserved exactly) and every non-scalar entry (e.g.
    ``gen_imgs``) from the LAST inner step only — carrying, not stacking,
    the heavy outputs keeps HBM use independent of K.

    Numerics are IDENTICAL to K sequential dispatches: same RNG splits, same
    update order (tests/test_scan_dispatch.py asserts equality).
    """

    def steps(state, *stacked):
        first = jax.tree_util.tree_map(lambda a: a[0], stacked)
        out_sd = jax.eval_shape(step_fn, state, *first)[1]
        heavy_keys = heavy_out_keys(out_sd)
        heavy0 = {
            n: jnp.zeros(out_sd[n].shape, out_sd[n].dtype) for n in heavy_keys
        }

        def body(carry, xs):
            s, _ = carry
            s, out = step_fn(s, *xs)
            heavy = {n: out[n] for n in heavy_keys}
            scalars = {n: v for n, v in out.items() if n not in heavy_keys}
            return (s, heavy), scalars

        (new_state, heavy), scalars = jax.lax.scan(body, (state, heavy0), stacked)
        out = dict(scalars)
        out.update(heavy)
        return new_state, out

    return steps


def heavy_out_keys(out_sd) -> list:
    """The out-dict entries scan_steps carries from the last step instead
    of stacking — the single definition of the heavy/scalar split shared
    by scan_steps and run_training's chunk replay."""
    return [n for n, v in out_sd.items() if v.ndim > 0]


def _stack_batches(batches):
    """Stack a list of per-step batch tuples along a new leading K axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


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

    def __init__(
        self,
        cfg,
        supports_fused_dispatch: bool = False,
        dispatch_steps: int | None = None,
    ):
        # Recipes with bespoke epoch loops (the im2im/SR families,
        # bicyclegan's two-phase host logic) dispatch one step per device
        # call; every such loop constructs a StepObserver, so warn here
        # rather than silently ignoring the flag. The fused-capable loops
        # — run_training and run_critic_family — opt out.
        if (
            not supports_fused_dispatch
            and getattr(cfg, "steps_per_dispatch", 1) > 1
        ):
            print(
                "[tpugan] --steps_per_dispatch is not supported by this "
                "recipe's training loop (per-step host logic); running "
                "one step per dispatch"
            )
        self.sink = (
            MetricsSink(cfg.metrics_jsonl)
            if getattr(cfg, "metrics_jsonl", "")
            else None
        )
        self.profile_dir = getattr(cfg, "profile_dir", "")
        # --profile_steps counts OPTIMIZER steps; under --steps_per_dispatch
        # K each dispatch covers K of them, so trace ceil(steps/K)
        # dispatches (profile_tick advances per dispatch). Loops whose
        # dispatch covers more than K optimizer steps (the critic family
        # fuses K*(n_critic+1)) pass the true count via dispatch_steps.
        k = dispatch_steps or max(1, getattr(cfg, "steps_per_dispatch", 1))
        steps = getattr(cfg, "profile_steps", 5)
        self.profile_dispatches = max(1, -(-steps // k))
        self._profiling = False
        self._calls = 0
        if getattr(cfg, "debug_numerics", False):
            jax.config.update("jax_debug_nans", True)
        port = getattr(cfg, "profile_port", 0)
        if port:
            # Live capture server for TensorBoard's profile UI. jax allows
            # only one server per process: start it once, and say so out
            # loud if a later config asks for a different port.
            started = getattr(StepObserver, "_server_port", None)
            if started is None:
                jax.profiler.start_server(port)
                StepObserver._server_port = port
            elif started != port:
                print(
                    f"[tpugan] profiler server already on port {started}; "
                    f"--profile_port {port} ignored (one server/process)"
                )

    def profile_tick(self, out: dict) -> None:
        """Advance the profiling state machine by ONE DEVICE DISPATCH.
        Called once per step() call — or once per fused scan() call under
        --steps_per_dispatch, where counting replayed host rows instead
        would open and close the trace between dispatches and capture no
        device work."""
        # Skip dispatch 0 (holds the compile); trace dispatches [1, 1+N).
        if self.profile_dir and self._calls == 1 and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
        if self._profiling and self._calls >= 1 + self.profile_dispatches:
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            jax.profiler.stop_trace()
            self._profiling = False
        self._calls += 1

    def observe(self, batches_done: int, out: dict, dispatch: bool = True) -> None:
        if dispatch:
            self.profile_tick(out)
        if self.sink is not None:
            self.sink.write(batches_done, out)

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
    k = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    scan = (
        jax.jit(scan_steps(step_fn), donate_argnums=0)
        if (jit and k > 1)
        else None
    )
    observer = StepObserver(cfg, supports_fused_dispatch=True)

    def after_step(state, out, epoch, i, dispatch=True):
        batches_done = epoch * bpe + i
        observer.observe(batches_done, out, dispatch=dispatch)
        if callbacks.log and cfg.log_interval > 0 and i % cfg.log_interval == 0:
            callbacks.log(epoch, i, bpe, out)
        if (
            callbacks.sample
            and sample_interval > 0
            and batches_done % sample_interval == 0
        ):
            callbacks.sample(state, out, batches_done)

    heavy_keys = None  # out entries that are per-step non-scalars
    for epoch in range(start_epoch, n_epochs):
        pending = []  # buffered (i, batch) tuples for the scan dispatch
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            if scan is None:
                state, out = step(state, *batch)
                after_step(state, out, epoch, i)
                continue
            if heavy_keys is None:
                out_sd = jax.eval_shape(step_fn, state, *batch)[1]
                heavy_keys = set(heavy_out_keys(out_sd))
            if pending and (
                jax.tree_util.tree_leaves(batch)[0].shape[0]
                != jax.tree_util.tree_leaves(pending[0][1])[0].shape[0]
            ):
                # Ragged tail (--ragged_last_batch): can't stack into the
                # fused chunk — flush it below as single-step dispatches.
                pending.append((i, batch))
                break
            pending.append((i, batch))
            if len(pending) < k:
                continue
            first_i = pending[0][0]
            stacked = _stack_batches([b for _, b in pending])
            pending = []
            state, out = scan(state, *stacked)
            observer.profile_tick(out)  # one device dispatch
            # Replay per-inner-step host work from the stacked scalars; the
            # non-scalar outputs (sample grids) come from the chunk's LAST
            # step — a sample fired mid-chunk uses images up to k-1 steps
            # newer than its reference-parity filename (documented
            # deviation; pick k dividing sample_interval for exactness).
            host_out = {
                n: (v if n in heavy_keys else jax.device_get(v))
                for n, v in out.items()
            }
            for j in range(k):
                row = {
                    n: (v if n in heavy_keys else v[j])
                    for n, v in host_out.items()
                }
                after_step(state, row, epoch, first_i + j, dispatch=False)
        # Remainder (epoch tail shorter than k): single-step dispatches.
        for i, batch in pending:
            state, out = step(state, *batch)
            after_step(state, out, epoch, i)
        if callbacks.epoch_end is not None:
            new_state = callbacks.epoch_end(state, epoch)
            if new_state is not None:
                state = new_state
    observer.close()
    return state
