"""Regression tests for the round-1 code-review findings."""

import json

import numpy as np
import pytest

from tpugan.data import UnpairedLoader


def _domains(na=7, nb=23, size=6):
    a = np.arange(na, dtype=np.uint8).reshape(na, 1, 1, 1) * np.ones(
        (na, size, size, 3), np.uint8
    )
    b = (100 + np.arange(nb, dtype=np.uint8)).reshape(nb, 1, 1, 1) * np.ones(
        (nb, size, size, 3), np.uint8
    )
    return a, b


def test_unpaired_loader_covers_full_b_and_max_length():
    """cyclegan/datasets.py:24-41 semantics: epoch length max(len A, len B),
    B drawn from the FULL set (no min-truncation, no fixed pairing)."""
    a, b = _domains()
    loader = UnpairedLoader(a, b, batch_size=4, seed=0)
    assert len(loader) == 23 // 4  # max(7, 23) // 4 batches
    seen_b = set()
    seen_a = set()
    for epoch in range(6):
        for batch in loader.epoch(epoch):
            assert batch[0].shape[0] == 4 and batch[1].shape[0] == 4
            seen_a.update(np.asarray(batch[0][:, 0, 0, 0]).tolist())
            seen_b.update(np.asarray(batch[1][:, 0, 0, 0]).tolist())
    assert seen_a == set(range(7))  # A cycled beyond its own length
    # All 23 B values reachable (min-truncation would cap at 7 distinct).
    assert len(seen_b) > 7
    assert seen_b <= set(range(100, 123))


def test_unpaired_loader_pairing_varies():
    a, b = _domains(8, 8)
    loader = UnpairedLoader(a, b, batch_size=8, seed=0)
    pairs = set()
    for epoch in range(5):
        (ab, bb) = next(iter(loader.epoch(epoch)))
        pairs.add(tuple(zip(
            np.asarray(ab[:, 0, 0, 0]).tolist(),
            np.asarray(bb[:, 0, 0, 0]).tolist(),
        )))
    assert len(pairs) > 1  # not a fixed A[i]<->B[i] pairing


def test_paired_fallback_on_unequal_cyclegan_layout(tmp_path):
    """paired_or_synthetic must fall back to synthetic pairs (not crash)
    when only an unequal-length unpaired layout exists."""
    from PIL import Image

    from tpugan.data.im2im import paired_or_synthetic

    root = tmp_path / "weird" / "train"
    (root / "A").mkdir(parents=True)
    (root / "B").mkdir(parents=True)
    for i in range(3):
        Image.new("RGB", (8, 8)).save(root / "A" / f"{i}.png")
    for i in range(5):
        Image.new("RGB", (8, 8)).save(root / "B" / f"{i}.png")
    a, b, is_real = paired_or_synthetic(
        str(tmp_path), "weird", 8, 8, synthetic_n=16
    )
    assert not is_real
    assert len(a) == len(b) == 16


def test_eta_logger_scales_by_log_interval(monkeypatch, capsys):
    from tpugan.models import _im2im_common as m

    fake_now = [100.0]
    monkeypatch.setattr(m.time, "time", lambda: fake_now[0])
    eta = m.EtaLogger(n_epochs=1)
    # 50 batches pass in 50 seconds (1 s/batch) before the next log call.
    fake_now[0] += 50.0
    eta.line(0, 50, 100, "[x]")
    out = capsys.readouterr().out
    # 50 batches left at 1 s/batch -> ETA ~ 50 s, NOT 50*50 s.
    assert "0:00:50" in out, out


@pytest.mark.slow
def test_custom_loop_metrics_jsonl(tmp_path):
    """--metrics_jsonl works in the hand-rolled im2im loops (StepObserver)."""
    from tpugan.models import discogan

    path = str(tmp_path / "m.jsonl")
    cfg = discogan.Config(
        n_epochs=1, batch_size=2, img_height=64, img_width=64,
        synthetic_data=True, max_batches=2, sample_interval=0,
        log_interval=0, metrics_jsonl=path, output_dir=str(tmp_path),
    )
    discogan.run(cfg)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert "d_loss" in lines[0] and "g_loss" in lines[0]


def test_cgan_multichannel_uses_torch_element_order():
    import jax
    import jax.numpy as jnp

    from tpugan.models import cgan
    from tpugan.models._common import apply_mod

    cfg = cgan.Config(batch_size=2, channels=3, latent_dim=8)
    modules = cgan.build(cfg)
    state = cgan.create_state(cfg, modules)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    labels = jnp.zeros(2, jnp.int32)
    out, _ = apply_mod(
        modules["generator"], state.params["generator"],
        state.model_state["generator"], z, labels, train=True,
    )
    assert out.shape == (2, cfg.img_size, cfg.img_size, 3)
    d_out, _ = apply_mod(
        modules["discriminator"], state.params["discriminator"], None,
        out, labels, train=False,
    )
    assert d_out.shape == (2, 1)
