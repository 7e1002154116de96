"""Metrics sink / debug-mode / resume plumbing tests."""

import json
import os

import jax
import numpy as np

from tpugan.models import gan


def test_metrics_jsonl_written(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    cfg = gan.Config(
        n_epochs=1, batch_size=8, latent_dim=8, synthetic_data=True,
        max_batches=3, sample_interval=0, log_interval=0,
        metrics_jsonl=path, output_dir=str(tmp_path),
    )
    gan.run(cfg)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    assert {"step", "d_loss", "g_loss"} <= set(lines[0].keys())
    assert all(np.isfinite(l["d_loss"]) for l in lines)


def test_checkpoint_roundtrip_exact(tmp_path):
    """Full TrainState save/load is bit-exact (crash-consistent resume,
    beyond the reference's weights-only story)."""
    from tpugan.io.checkpoint import load_pytree, save_pytree

    cfg = gan.Config(batch_size=8, latent_dim=8, synthetic_data=True)
    modules = gan.build(cfg)
    state = gan.create_state(cfg, modules)
    step = jax.jit(gan.make_step(cfg, modules))
    imgs = np.random.default_rng(0).integers(0, 255, (8, 28, 28, 1), np.uint8)
    labels = np.zeros(8, np.int32)
    state, _ = step(state, imgs, labels)

    path = str(tmp_path / "state.msgpack")
    save_pytree(state, path)
    template = gan.create_state(cfg, modules)
    restored = load_pytree(template, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Resumed training continues identically.
    s1, o1 = step(state, imgs, labels)
    s2, o2 = step(restored, imgs, labels)
    np.testing.assert_allclose(float(o1["d_loss"]), float(o2["d_loss"]))


def test_reference_named_module_checkpoints(tmp_path):
    from tpugan.io.checkpoint import load_modules, save_modules

    cfg = gan.Config(batch_size=4, latent_dim=8)
    state = gan.create_state(cfg)
    save_modules(
        {"generator": state.params["generator"]}, str(tmp_path), epoch=7,
        stats_by_name={"generator": state.model_state.get("generator")},
    )
    assert os.path.exists(str(tmp_path / "generator_7.pth"))
    loaded, stats = load_modules(
        {"generator": state.params["generator"]}, str(tmp_path), 7,
        {"generator": state.model_state.get("generator")},
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params["generator"]),
        jax.tree_util.tree_leaves(loaded["generator"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # BatchNorm running stats ride along in the same file (torch
    # state_dict semantics — io/checkpoint.py:module_payload).
    for a, b in zip(
        jax.tree_util.tree_leaves(state.model_state["generator"]),
        jax.tree_util.tree_leaves(stats["generator"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_synchronous_loader_mode_yields_identical_batches():
    """--debug_numerics removes the only concurrency in the framework (the
    loader's producer thread, SURVEY.md §5 race surface) without changing
    the delivered batch stream."""
    from tpugan.data.loader import DeviceLoader, set_synchronous

    data = np.random.default_rng(0).integers(0, 255, (37, 8, 8, 1), np.uint8)
    labels = np.arange(37, dtype=np.int32)

    def collect():
        loader = DeviceLoader([data, labels], batch_size=8, seed=3)
        return [tuple(np.asarray(a) for a in b) for b in loader.epoch(0)]

    async_batches = collect()
    set_synchronous(True)
    try:
        sync_batches = collect()
    finally:
        set_synchronous(False)
    assert len(async_batches) == len(sync_batches) == 37 // 8
    for ba, bs in zip(async_batches, sync_batches):
        for a, b in zip(ba, bs):
            np.testing.assert_array_equal(a, b)


def test_debug_numerics_flag_wires_synchronous_pipeline():
    from tpugan.data import loader
    from tpugan.utils.config import config_from_args

    assert not loader._SYNCHRONOUS
    try:
        parsed = config_from_args(gan.Config, ["--debug_numerics"])
        assert parsed.debug_numerics
        assert loader._SYNCHRONOUS
    finally:
        loader.set_synchronous(False)


def test_legacy_params_only_module_checkpoint_loads():
    """Per-module .pth files written before running stats rode along are
    plain params trees; load_module_payload must detect and accept them
    (stats fall back to the template = pre-change behavior)."""
    from tpugan.io.checkpoint import (
        load_module_payload, load_modules, save_pytree,
    )

    cfg = gan.Config(batch_size=4, latent_dim=8)
    state = gan.create_state(cfg)
    import tempfile, os as _os

    with tempfile.TemporaryDirectory() as d:
        # Legacy writer: raw params tree, no payload wrapper.
        save_pytree(state.params["generator"], _os.path.join(d, "generator_3.pth"))
        payload = load_module_payload(
            state.params["generator"],
            _os.path.join(d, "generator_3.pth"),
            state.model_state.get("generator"),
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params["generator"]),
            jax.tree_util.tree_leaves(payload["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # load_modules goes through the same fallback.
        params, stats = load_modules(
            {"generator": state.params["generator"]}, d, 3,
            {"generator": state.model_state.get("generator")},
        )
        assert stats["generator"] is not None


def test_loader_propagates_producer_exceptions():
    """A host_transform failure mid-epoch must raise in the consumer, not
    silently truncate the epoch (the producer thread used to turn any
    exception into a normal end-of-queue sentinel)."""
    import pytest

    from tpugan.data.loader import DeviceLoader

    data = np.zeros((32, 4, 4, 1), np.uint8)

    def bad_transform(batch, epoch, b):
        if b == 2:
            raise RuntimeError("boom at batch 2")
        return batch

    loader = DeviceLoader(
        [data], batch_size=8, shuffle=False, host_transform=bad_transform
    )
    seen = 0
    with pytest.raises(RuntimeError, match="boom at batch 2"):
        for batch in loader.epoch(0):
            seen += 1
    assert seen == 2


def test_readme_test_count_matches_collection():
    """The README's typed test count drifted in rounds 2-4; it is now
    generated (scripts/update_test_count.py) and this guard fails the gate
    whenever a test addition forgets to regenerate it."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "update_test_count.py"), "--check"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
