"""Fused multi-step dispatch (train/loop.py:scan_steps).

The TPU-native loop scans K optimizer steps inside one device dispatch to
amortize host->device latency (the reference dispatches per batch,
gan/gan.py:121-170). These tests pin the contract: numerics identical to K
sequential dispatches, per-step scalar telemetry preserved, heavy outputs
taken from the last inner step.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan.train.loop import Callbacks, run_training, scan_steps


def _tiny_cfg(dcgan, **kw):
    return dcgan.Config(
        img_size=32, channels=1, batch_size=8, synthetic_data=True, **kw
    )


def _batches(n, batch, img):
    rng = np.random.default_rng(7)
    return [
        (
            jnp.asarray(
                rng.integers(0, 255, (batch, img, img, 1), dtype=np.uint8)
            ),
            jnp.zeros((batch,), jnp.int32),
        )
        for _ in range(n)
    ]


def test_scan_matches_sequential_steps():
    from tpugan.models import dcgan

    cfg = _tiny_cfg(dcgan)
    modules = dcgan.build(cfg)
    step = dcgan.make_step(cfg, modules)
    k = 5
    batches = _batches(k, cfg.batch_size, cfg.img_size)

    # Sequential reference.
    state = dcgan.create_state(cfg, modules)
    seq_scalars = []
    for b in batches:
        state, out = jax.jit(step)(state, *b)
        seq_scalars.append(
            {n: float(v) for n, v in out.items() if jnp.ndim(v) == 0}
        )
    seq_state = state

    # One scanned dispatch over the same batches.
    state2 = dcgan.create_state(cfg, modules)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    state2, out2 = jax.jit(scan_steps(step))(state2, *stacked)

    # Same final parameters (identical RNG splits and update order).
    for role in ("generator", "discriminator"):
        a = jax.tree_util.tree_leaves(seq_state.params[role])
        b = jax.tree_util.tree_leaves(state2.params[role])
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)
    assert int(state2.step) == k

    # Scalars stacked per inner step, matching the sequential values.
    for j, row in enumerate(seq_scalars):
        for n, v in row.items():
            assert out2[n].shape == (k,)
            np.testing.assert_allclose(float(out2[n][j]), v, rtol=1e-4,
                                       atol=1e-5)

    # Heavy outputs come from the LAST inner step only (not stacked).
    assert out2["gen_imgs"].shape == (
        cfg.batch_size, cfg.img_size, cfg.img_size, 1
    )


@pytest.mark.slow
def test_run_training_chunked_equals_single(tmp_path):
    from tpugan.models import gan

    def final(k):
        cfg = gan.Config(
            batch_size=16,
            synthetic_data=True,
            n_epochs=1,
            max_batches=7,  # 7 = 2 chunks of 3 + remainder of 1 when k=3
            log_interval=0,
            seed=3,
            steps_per_dispatch=k,
            metrics_jsonl=str(tmp_path / ("m%d.jsonl" % k)),
        )
        modules = gan.build(cfg)
        state = gan.create_state(cfg, modules)
        loader = gan.make_loader(cfg)
        step = gan.make_step(cfg, modules)
        return cfg, run_training(
            cfg, loader, state, step, Callbacks(), n_epochs=1
        )

    cfg1, s1 = final(1)
    cfg3, s3 = final(3)
    for role in s1.params:
        for x, y in zip(
            jax.tree_util.tree_leaves(s1.params[role]),
            jax.tree_util.tree_leaves(s3.params[role]),
        ):
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)
    assert int(s1.step) == int(s3.step) == 7

    # Per-step telemetry preserved: both runs wrote 7 identical-step rows.
    rows1 = [json.loads(l) for l in open(cfg1.metrics_jsonl)]
    rows3 = [json.loads(l) for l in open(cfg3.metrics_jsonl)]
    assert [r["step"] for r in rows1] == [r["step"] for r in rows3]
    assert len(rows3) == 7
    for a, b in zip(rows1, rows3):
        for n in a:
            np.testing.assert_allclose(a[n], b[n], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_chunked_dispatch_composes_with_data_parallel(tmp_path):
    """--steps_per_dispatch under GSPMD DP: stacking batch-sharded arrays
    and scanning over them must compile and keep global-batch semantics
    (runs on the conftest's virtual 8-device mesh via run_mnist_recipe's
    auto-DP path)."""
    from tpugan.models import gan

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device mesh")
    cfg = gan.Config(
        batch_size=16,
        synthetic_data=True,
        n_epochs=1,
        max_batches=4,
        log_interval=0,
        sample_interval=0,
        seed=5,
        steps_per_dispatch=2,
        metrics_jsonl=str(tmp_path / "dp.jsonl"),
        output_dir=str(tmp_path),
    )
    state = gan.run(cfg)
    assert int(state.step) == 4
    rows = [json.loads(l) for l in open(cfg.metrics_jsonl)]
    assert len(rows) == 4
    assert all(np.isfinite(r["d_loss"]) for r in rows)


def test_profiler_traces_fused_dispatches(tmp_path):
    """--profile_dir under --steps_per_dispatch: the trace must span real
    device dispatches (profile ticks count scan() calls, not replayed host
    rows — StepObserver.profile_tick)."""
    from tpugan.models import gan

    cfg = gan.Config(
        batch_size=8,
        latent_dim=8,
        synthetic_data=True,
        n_epochs=1,
        max_batches=6,
        log_interval=0,
        sample_interval=0,
        steps_per_dispatch=2,
        profile_dir=str(tmp_path / "trace"),
        profile_steps=1,
        output_dir=str(tmp_path),
    )
    modules = gan.build(cfg)
    state = gan.create_state(cfg, modules)
    loader = gan.make_loader(cfg)
    step = gan.make_step(cfg, modules)
    run_training(cfg, loader, state, step, Callbacks(), n_epochs=1)
    files = [
        f
        for root, _, fs in __import__("os").walk(cfg.profile_dir)
        for f in fs
    ]
    assert files, "no trace written"
