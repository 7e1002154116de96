"""Shared machinery for the n_critic Wasserstein family (wgan, wgan_gp,
wgan_div).

Reference control flow (wgan/wgan.py:117-166, wgan_gp/wgan_gp.py:144-203,
wgan_div/wgan_div.py:124-195): the critic trains on EVERY batch with a fresh
z; the generator trains every ``n_critic`` batches reusing the SAME z. The
host mirrors that schedule around two jitted functions (d_step, g_step) —
the z array stays device-resident between them.

All three use template-A MLP G/critic (no sigmoid); they differ in the
critic regularizer (weight clip / GP / W-div penalty) and optimizer
(RMSprop for wgan, Adam for gp/div).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tpugan.data import DeviceLoader, mnist_or_synthetic
from tpugan.io.images import save_image
from tpugan.models._common import apply_mod, init_module
from tpugan.train.state import TrainState, normalize_uint8
from tpugan.nn.blocks import MLPDiscriminator, MLPGenerator


def build_a(cfg):
    img_shape = (cfg.img_size, cfg.img_size, cfg.channels)
    return {
        "generator": MLPGenerator(img_shape=img_shape),
        "discriminator": MLPDiscriminator(sigmoid=False),
    }


def create_state_a(cfg, modules, tx_g, tx_d) -> TrainState:
    rng = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_state = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim), jnp.float32)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, cfg.channels), jnp.float32)
    g_params, g_bs = init_module(modules["generator"], k_g, z, train=True)
    d_params, d_bs = init_module(modules["discriminator"], k_d, img, train=True)
    params = {"generator": g_params, "discriminator": d_params}
    model_state = {"generator": g_bs, "discriminator": d_bs}
    opt_state = {"generator": tx_g.init(g_params), "discriminator": tx_d.init(d_params)}
    return TrainState.create(params, opt_state, k_state, model_state=model_state)


def make_d_step(cfg, modules, tx_d, d_loss_fn: Callable, post_update=None):
    """d_loss_fn(d_apply, real, fake, rng) -> scalar critic loss, where
    d_apply(x) closes over the current critic params. A loss fn that also
    declares a ``d_params`` keyword receives the raw param tree (the fused
    closed-form penalty path needs the leaves, not the closure —
    models/wgan_gp.py:_fused_gp_or_none)."""
    import inspect

    wants_params = "d_params" in inspect.signature(d_loss_fn).parameters
    G, D = modules["generator"], modules["discriminator"]

    def d_step(state: TrainState, imgs_u8, labels):
        del labels
        real = normalize_uint8(imgs_u8)
        rng, k_z, k_pen = jax.random.split(state.rng, 3)
        z = jax.random.normal(k_z, (real.shape[0], cfg.latent_dim))
        fake, g_bs = apply_mod(
            G, state.params["generator"], state.model_state["generator"], z,
            train=True,
        )
        fake = jax.lax.stop_gradient(fake)

        def loss(d_params):
            def d_apply(x):
                out, _ = apply_mod(
                    D, d_params, state.model_state["discriminator"], x, train=True
                )
                return out

            if wants_params:
                return d_loss_fn(d_apply, real, fake, k_pen,
                                 d_params=d_params)
            return d_loss_fn(d_apply, real, fake, k_pen)

        d_loss, d_grads = jax.value_and_grad(loss)(state.params["discriminator"])
        d_up, d_opt = tx_d.update(
            d_grads, state.opt_state["discriminator"], state.params["discriminator"]
        )
        d_params = optax.apply_updates(state.params["discriminator"], d_up)
        if post_update is not None:
            d_params = post_update(d_params)
        new_state = state.replace(
            step=state.step + 1,
            params={**state.params, "discriminator": d_params},
            model_state={**state.model_state, "generator": g_bs},
            opt_state={**state.opt_state, "discriminator": d_opt},
            rng=rng,
        )
        return new_state, {"d_loss": d_loss, "z": z}

    return d_step


def make_g_step(cfg, modules, tx_g):
    G, D = modules["generator"], modules["discriminator"]

    def g_step(state: TrainState, z):
        def loss(g_params):
            gen, g_bs = apply_mod(
                G, g_params, state.model_state["generator"], z, train=True
            )
            d_out, _ = apply_mod(
                D,
                state.params["discriminator"],
                state.model_state["discriminator"],
                gen,
                train=True,
            )
            return -jnp.mean(d_out), (gen, g_bs)

        (g_loss, (gen, g_bs)), g_grads = jax.value_and_grad(loss, has_aux=True)(
            state.params["generator"]
        )
        g_up, g_opt = tx_g.update(
            g_grads, state.opt_state["generator"], state.params["generator"]
        )
        g_params = optax.apply_updates(state.params["generator"], g_up)
        new_state = state.replace(
            params={**state.params, "generator": g_params},
            model_state={**state.model_state, "generator": g_bs},
            opt_state={**state.opt_state, "generator": g_opt},
        )
        return new_state, {"g_loss": g_loss, "gen_imgs": gen}

    return g_step


def make_loader_a(cfg, sharding=None) -> DeviceLoader:
    ds, is_real = mnist_or_synthetic(
        cfg.data_dir,
        img_size=cfg.img_size,
        channels=cfg.channels,
        synthetic=cfg.synthetic_data,
        seed=cfg.seed,
    )
    if not is_real:
        print("[tpugan] MNIST not found on disk — using synthetic dataset")
    return DeviceLoader(
        [ds.images, ds.labels], cfg.batch_size, shuffle=True, seed=cfg.seed,
        sharding=sharding,
    )


def make_schedule_unit(cfg, d_step, g_step):
    """One reference schedule unit as a single jittable step: critic on
    ``n_critic`` consecutive batches, G after the FIRST (reusing that
    batch's z) — the exact host order of wgan_gp.py:144-203 (the G branch
    fires when ``i % n_critic == 0``, i.e. on the unit's first batch).

    ``imgs``/``labels`` carry a leading n_critic axis (one loader batch per
    critic step). Out dict: the G-batch scalars the reference prints
    (d_loss of the unit's first batch + g_loss) and the unit's ``gen_imgs``
    (heavy — under scan_steps only the last unit's survive, which is the
    documented fused-dispatch sampling deviation). Numerics: same RNG
    chain and update order as the unfused host loop, equivalent to
    ulp-level XLA reassociation (bitwise stability across jit
    granularities is not an XLA guarantee — tests/test_critic_family.py
    pins the observed bounds).
    """

    def barrier(tree):
        # The unfused loop materializes the full TrainState at every
        # dispatch boundary; without this, XLA fuses across the sub-step
        # seams (e.g. a param update into the next critic forward) with
        # different rounding and the fused loop drifts measurably (1e-5
        # scale) from the unfused one. optimization_barrier restores
        # dispatch-boundary semantics inside the compiled unit, leaving
        # only ulp-level instruction-selection differences.
        flat, treedef = jax.tree_util.tree_flatten(tree)
        return jax.tree_util.tree_unflatten(
            treedef, jax.lax.optimization_barrier(flat)
        )

    def unit(state, imgs, labels):
        state, d0 = d_step(state, imgs[0], labels[0])
        state, d0 = barrier((state, d0))
        state, g_out = g_step(state, d0["z"])
        state = barrier(state)
        # Every critic batch's d_loss rides along as a scalar (scan_steps
        # stacks scalars per unit) so fused telemetry keeps the unfused
        # loop's per-batch granularity — replay_units rebuilds the rows.
        out = {
            "d_loss": d0["d_loss"],
            "g_loss": g_out["g_loss"],
            "gen_imgs": g_out["gen_imgs"],
        }
        for j in range(1, cfg.n_critic):
            state, dj = d_step(state, imgs[j], labels[j])
            state = barrier(state)
            out["_d_loss%d" % j] = dj["d_loss"]
        return state, out

    return unit


def run_critic_family(cfg, modules, state, d_step, g_step, sample_inside_gstep: bool):
    """Host loop mirroring the reference batches_done accounting.

    sample_inside_gstep=False: wgan style (check every batch, save latest
    G output, batches_done += 1 per batch; wgan.py:160-166).
    sample_inside_gstep=True: wgan_gp/div style (check only on G batches,
    batches_done += n_critic; wgan_gp.py:196-203).

    ``--steps_per_dispatch K`` fuses K schedule units (K*(n_critic+1)
    optimizer steps) into one device dispatch via scan_steps — same RNG
    chain and update order as the unfused loop (ulp-level XLA
    reassociation only; see make_schedule_unit); telemetry/logging keeps
    the reference's G-batch granularity (the only granularity it prints);
    PNG samples use the dispatch's last unit (same deviation as
    train/loop.py's fused path). Epoch tails that don't fill a unit or a
    dispatch flush through the unfused path.
    """
    from tpugan.models._im2im_common import StepObserver
    from tpugan.parallel import auto_sharding, replicate_for

    imgdir = os.path.join(cfg.output_dir, "images")
    os.makedirs(imgdir, exist_ok=True)
    sharding = auto_sharding(cfg.batch_size)
    loader = make_loader_a(cfg, sharding=sharding)
    state = replicate_for(sharding, state)
    k = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    observer = StepObserver(
        cfg,
        supports_fused_dispatch=True,
        # Each fused dispatch covers k schedule units = k*(n_critic+1)
        # optimizer steps — tell the profiler so --profile_steps traces
        # the window it asked for.
        dispatch_steps=k * (cfg.n_critic + 1) if k > 1 else None,
    )
    jd = jax.jit(d_step, donate_argnums=0)
    jg = jax.jit(g_step, donate_argnums=0)
    scan = None
    if k > 1:
        from tpugan.train.loop import _stack_batches, scan_steps

        scan = jax.jit(
            scan_steps(make_schedule_unit(cfg, d_step, g_step)),
            donate_argnums=0,
        )
    bpe = len(loader)
    if cfg.max_batches >= 0:
        bpe = min(bpe, cfg.max_batches)
    batches_done = 0
    last_gen = None

    def save(arr, tag):
        save_image(
            jax.device_get(arr[:25]),
            os.path.join(imgdir, "%d.png" % tag),
            nrow=5,
            normalize=True,
        )

    def log_line(epoch, i, d_loss, g_loss):
        print(
            "[Epoch %d/%d] [Batch %d/%d] [D loss: %f] [G loss: %f]"
            % (
                epoch,
                cfg.n_epochs,
                (batches_done % bpe) if not sample_inside_gstep else i,
                bpe,
                float(d_loss),
                float(g_loss),
            )
        )

    def run_batch(epoch, i, batch):
        """One loader batch through the unfused path (also serves as the
        fused mode's epoch-tail flush)."""
        nonlocal state, batches_done, last_gen
        state, d_out = jd(state, *batch)
        if i % cfg.n_critic != 0:
            observer.observe(epoch * bpe + i, d_out)
        else:
            state, g_out = jg(state, d_out["z"])
            observer.observe(epoch * bpe + i, {**d_out, **g_out})
            last_gen = g_out["gen_imgs"]
            if cfg.log_interval > 0 and i % cfg.log_interval == 0:
                log_line(epoch, i, d_out["d_loss"], g_out["g_loss"])
            if (
                sample_inside_gstep
                and cfg.sample_interval > 0
                and batches_done % cfg.sample_interval == 0
            ):
                save(last_gen, batches_done)
        if not sample_inside_gstep:
            if (
                cfg.sample_interval > 0
                and batches_done % cfg.sample_interval == 0
                and last_gen is not None
            ):
                save(last_gen, batches_done)
            batches_done += 1
        elif i % cfg.n_critic == 0:
            batches_done += cfg.n_critic

    def replay_units(epoch, first_is, out):
        """Replay the host-side work for one fused dispatch from the
        stacked per-batch scalars — one telemetry row per loader batch,
        exactly like the unfused loop (sampling uses the dispatch's LAST
        unit's images — same documented deviation as run_training's fused
        path)."""
        nonlocal batches_done, last_gen
        observer.profile_tick(out)
        host = {n: jax.device_get(v) for n, v in out.items() if n != "gen_imgs"}
        last_gen = out["gen_imgs"]
        for j, i0 in enumerate(first_is):
            for c in range(cfg.n_critic):
                key = "d_loss" if c == 0 else "_d_loss%d" % c
                row = {"d_loss": host[key][j]}
                if c == 0:
                    row["g_loss"] = host["g_loss"][j]
                observer.observe(epoch * bpe + i0 + c, row, dispatch=False)
            if cfg.log_interval > 0 and i0 % cfg.log_interval == 0:
                log_line(epoch, i0, host["d_loss"][j], host["g_loss"][j])
            if sample_inside_gstep:
                if (
                    cfg.sample_interval > 0
                    and batches_done % cfg.sample_interval == 0
                ):
                    save(last_gen, batches_done)
                batches_done += cfg.n_critic
            else:
                for _ in range(cfg.n_critic):
                    if (
                        cfg.sample_interval > 0
                        and batches_done % cfg.sample_interval == 0
                    ):
                        save(last_gen, batches_done)
                    batches_done += 1

    for epoch in range(cfg.n_epochs):
        unit_buf = []  # (i, batch) filling the current schedule unit
        units = []  # (first_i, [batches]) awaiting a full dispatch
        for i, batch in enumerate(loader.epoch(epoch)):
            if cfg.max_batches >= 0 and i >= cfg.max_batches:
                break
            if scan is None:
                run_batch(epoch, i, batch)
                continue
            unit_buf.append((i, batch))
            if len(unit_buf) < cfg.n_critic:
                continue
            units.append((unit_buf[0][0], [b for _, b in unit_buf]))
            unit_buf = []
            if len(units) < k:
                continue
            stacked = _stack_batches(
                [_stack_batches(bs) for _, bs in units]
            )
            first_is = [fi for fi, _ in units]
            units = []
            state, out = scan(state, *stacked)
            replay_units(epoch, first_is, out)
        # Fused-mode epoch tail: units short of a dispatch and batches
        # short of a unit flush through the unfused path (unit alignment
        # is preserved — fi is always a multiple of n_critic).
        for fi, bs in units:
            for off, b in enumerate(bs):
                run_batch(epoch, fi + off, b)
        for i, b in unit_buf:
            run_batch(epoch, i, b)
    observer.close()
    return state
