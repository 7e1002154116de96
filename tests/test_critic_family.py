"""Smoke + semantics tests for the Wasserstein family (wgan, wgan_gp,
wgan_div, dragan)."""

import jax
import numpy as np
import pytest

from tpugan.models import dragan, wgan, wgan_div, wgan_gp


def _batch(n=8, size=28):
    imgs = np.random.default_rng(0).integers(0, 255, (n, size, size, 1), np.uint8)
    return imgs, np.zeros(n, np.int32)


@pytest.mark.parametrize("mod", [wgan, wgan_gp, wgan_div])
def test_critic_steps_run(mod):
    cfg = mod.Config(batch_size=8, latent_dim=16, synthetic_data=True)
    modules = mod.build(cfg)
    state = mod.create_state(cfg, modules)
    d_step, g_step = mod.make_steps(cfg, modules)
    jd, jg = jax.jit(d_step), jax.jit(g_step)
    imgs, labels = _batch()
    state, d_out = jd(state, imgs, labels)
    assert np.isfinite(float(d_out["d_loss"]))
    state, g_out = jg(state, d_out["z"])
    assert np.isfinite(float(g_out["g_loss"]))
    assert g_out["gen_imgs"].shape == (8, 28, 28, 1)


def test_wgan_weights_clipped():
    cfg = wgan.Config(batch_size=8, latent_dim=16, clip_value=0.01)
    modules = wgan.build(cfg)
    state = wgan.create_state(cfg, modules)
    d_step, _ = wgan.make_steps(cfg, modules)
    imgs, labels = _batch()
    state, _ = jax.jit(d_step)(state, imgs, labels)
    for leaf in jax.tree_util.tree_leaves(state.params["discriminator"]):
        arr = np.asarray(leaf)
        assert arr.min() >= -0.01 - 1e-7 and arr.max() <= 0.01 + 1e-7
    # generator params NOT clipped
    g_max = max(
        np.abs(np.asarray(l)).max()
        for l in jax.tree_util.tree_leaves(state.params["generator"])
    )
    assert g_max > 0.01


def test_wgan_gp_penalty_increases_d_loss_scale():
    # With lambda=10, GP contributes a positive term at init.
    cfg = wgan_gp.Config(batch_size=8, latent_dim=16)
    modules = wgan_gp.build(cfg)
    state = wgan_gp.create_state(cfg, modules)
    imgs, labels = _batch()
    from tpugan.models._common import apply_mod
    from tpugan.train.state import normalize_uint8
    import jax.numpy as jnp

    real = normalize_uint8(jnp.asarray(imgs))

    def d_apply(x):
        out, _ = apply_mod(
            modules["discriminator"],
            state.params["discriminator"],
            state.model_state["discriminator"],
            x,
            train=True,
        )
        return out

    base = -float(jnp.mean(d_apply(real))) + float(jnp.mean(d_apply(real)))
    full = float(
        wgan_gp.d_loss_fn(d_apply, real, real * 0.5, jax.random.PRNGKey(0))
    )
    assert np.isfinite(full)
    assert full != base  # penalty active


def test_dragan_step_and_quirk_mode():
    for quirks in (False, True):
        cfg = dragan.Config(
            batch_size=8, latent_dim=16, img_size=32, reference_quirks=quirks
        )
        modules = dragan.build(cfg)
        state = dragan.create_state(cfg, modules)
        step = jax.jit(dragan.make_step(cfg, modules))
        imgs, labels = _batch(8, 32)
        state, out = step(state, imgs, labels)
        assert np.isfinite(float(out["d_loss"]))
        assert np.isfinite(float(out["g_loss"]))


def test_gp_gradients_finite_when_critic_gradient_is_zero():
    """torch Tensor.norm has subgradient 0 at 0; a plain jnp.sqrt would
    turn a critic dead-zone (dD/dx == 0) into NaN parameter gradients and
    permanently poison the run (ops/penalty.py:_safe_sqrt)."""
    import jax
    import jax.numpy as jnp

    from tpugan.ops.penalty import dragan_penalty, wgan_gp_penalty

    real = jnp.ones((2, 4, 4, 1))
    fake = jnp.zeros((2, 4, 4, 1))
    rng = jax.random.PRNGKey(0)

    def loss(theta):
        # Critic constant in its input -> dD/dx identically zero; theta
        # still reaches the output so there is a parameter gradient path.
        d_fn = lambda x: jnp.sum(x * 0.0) + theta * jnp.ones((x.shape[0],))
        return wgan_gp_penalty(d_fn, real, fake, rng) + dragan_penalty(
            d_fn, real, rng
        )

    g = jax.grad(loss)(jnp.float32(0.5))
    assert np.isfinite(float(g)), "NaN-poisoned gradient at zero norm"
    # Penalty values themselves: ||0|| - 1 squared = 1 each.
    np.testing.assert_allclose(float(loss(jnp.float32(0.5))), 2.0, atol=1e-6)


@pytest.mark.parametrize("mod", [wgan, wgan_gp, wgan_div])
def test_schedule_unit_matches_sequential_steps(mod):
    """make_schedule_unit fused into scan_steps vs the d/g/d... sequence
    of separate jitted dispatches: same RNG chain, same update order, same
    batches — numerically equivalent to ulp-level reassociation (XLA does
    not promise bitwise stability across jit granularities: compiling the
    three sub-steps into one scan body changes instruction selection even
    with the unit's internal optimization_barriers pinning the sub-step
    seams; observed deltas <=2e-9 abs after two units). wgan also covers
    the post-update weight clip."""
    import jax.numpy as jnp

    from tpugan.models._critic_family import make_schedule_unit
    from tpugan.train.loop import scan_steps

    cfg = mod.Config(
        batch_size=6, latent_dim=16, n_critic=2, synthetic_data=True
    )
    modules = mod.build(cfg)
    d_step, g_step = mod.make_steps(cfg, modules)
    rng = np.random.default_rng(0)
    b = [
        (
            jnp.asarray(rng.integers(0, 255, (6, 28, 28, 1), np.uint8)),
            jnp.zeros((6,), jnp.int32),
        )
        for _ in range(4)
    ]
    units = [b[0:2], b[2:4]]

    s1 = mod.create_state(cfg, modules)
    jd, jg = jax.jit(d_step), jax.jit(g_step)
    for u in units:
        s1, d0 = jd(s1, *u[0])
        s1, _ = jg(s1, d0["z"])
        s1, _ = jd(s1, *u[1])

    s2 = mod.create_state(cfg, modules)
    scan = jax.jit(scan_steps(make_schedule_unit(cfg, d_step, g_step)))
    stack = lambda bs: tuple(jnp.stack(x) for x in zip(*bs))
    imgs = jnp.stack([stack(u)[0] for u in units])
    labels = jnp.stack([stack(u)[1] for u in units])
    s2, out = scan(s2, imgs, labels)

    assert out["d_loss"].shape == (2,) and out["g_loss"].shape == (2,)
    assert np.array_equal(np.asarray(s1.rng), np.asarray(s2.rng))
    # Params only: optimizer second moments are squares of tiny gradients,
    # where ulp reassociation produces huge RELATIVE deltas on ~0 values.
    for a, b2 in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=1e-3, atol=1e-5
        )


@pytest.mark.parametrize("mod", [wgan, wgan_gp, wgan_div])
def test_fused_schedule_dispatch_matches_sequential(mod, tmp_path, monkeypatch):
    """--steps_per_dispatch through the REAL run() loop: K schedule units
    per lax.scan dispatch, incl. the epoch tail (a unit short of a
    dispatch + a batch short of a unit flushing unfused). Same schedule,
    same batches, same RNG chain — the unit-level test above pins
    ulp-level equivalence per unit; here buffer donation adds further
    in-place program variants and 7 optimizer steps compound the
    reassociation (observed: <=1.4e-3 relative on the wgan_gp double-
    backward path), so the trajectory comparison carries a training-drift
    tolerance. The RNG chain must still match EXACTLY — any schedule bug
    shows up there first."""
    import json

    monkeypatch.chdir(tmp_path)

    def final_state(steps_per_dispatch):
        cfg = mod.Config(
            batch_size=8,
            latent_dim=16,
            n_critic=2,
            n_epochs=1,
            max_batches=7,  # 3 full units + 1 tail batch
            sample_interval=0,
            log_interval=-1,
            synthetic_data=True,
            steps_per_dispatch=steps_per_dispatch,
            output_dir=str(tmp_path / f"out{steps_per_dispatch}"),
            metrics_jsonl=str(tmp_path / f"m{steps_per_dispatch}.jsonl"),
        )
        return mod.run(cfg)

    def rows_by_step(path):
        rows = [json.loads(ln) for ln in open(path)]
        return {r["step"]: r for r in rows}

    seq = final_state(1)
    fused = final_state(2)  # 2 units/dispatch: 1 dispatch + 1 unit + 1 batch tail
    # Fused telemetry keeps the unfused loop's PER-BATCH granularity: one
    # row per loader batch (d_loss on every batch, g_loss on G batches) —
    # this is the schedule/loop-logic check.
    rs = rows_by_step(tmp_path / "m1.jsonl")
    rf = rows_by_step(tmp_path / "m2.jsonl")
    assert set(rf) == set(rs) == set(range(7))
    assert {s for s, r in rf.items() if "g_loss" in r} == {0, 2, 4, 6}
    for step, row in rf.items():
        for key in ("d_loss", "g_loss"):
            if key in rs[step]:
                np.testing.assert_allclose(
                    row[key], rs[step][key], rtol=1e-4, atol=1e-6
                )
    # End-state params within compounded-reassociation drift (7 optimizer
    # steps of ulp-level divergence through the double-backward path).
    for a, b in zip(
        jax.tree_util.tree_leaves(seq.params),
        jax.tree_util.tree_leaves(fused.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4
        )
    assert np.array_equal(np.asarray(seq.rng), np.asarray(fused.rng))
