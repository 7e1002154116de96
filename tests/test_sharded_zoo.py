"""Every trainer recipe runs one schedule unit under GSPMD data-parallel
sharding and matches the single-device step.

The CLI auto-shards ANY recipe whose global batch divides the mesh
(models/_common.py:run_mnist_recipe, parallel/mesh.py:auto_sharding), so
every recipe can reach the sharded path in production; before this module
only 4 of the 32 ever ran under sharding (tests/test_parallel.py). Here each
recipe's own step function(s) — the exact callables run() jits — execute one
full schedule unit twice: once unsharded on device 0 and once with the batch
sharded over a mesh (params replicated, XLA inserts the gradient
all-reduce), and every scalar output plus the updated parameter tree must
agree. Both legs start from the SAME TrainState (same RNG), so the only
permitted difference is GSPMD reduction reassociation.

MNIST-class recipes shard batch 8 over the full 8-device mesh; the
template-C giants shard batch 2 over a 2-device submesh (per-device batch 1
— the same per-device shapes production DP would see — at a CPU-affordable
total cost). The heavy image-to-image recipes are marked slow; the fast gate
still covers every MNIST-class family plus cyclegan/stargan/srgan.
"""

import jax
import numpy as np
import pytest

from tpugan.parallel import batch_sharding, data_mesh, shard_state


def _imgs(n, size, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, size, size, ch), np.uint8)


def _labels(n, hi=10, seed=1):
    return np.random.default_rng(seed).integers(0, hi, n).astype(np.int32)


def _single_step_unit(mod):
    """Default unit: one make_step application over the batch tuple."""

    def unit(cfg, mods, state, batch):
        step = jax.jit(mod.make_step(cfg, mods))
        state, out = step(state, *batch)
        return state, [out]

    return unit


def _critic_unit(mod):
    """wgan/wgan_gp/wgan_div: D step then G step on the critic's z."""

    def unit(cfg, mods, state, batch):
        d_step, g_step = mod.make_steps(cfg, mods)
        state, d_out = jax.jit(d_step)(state, *batch)
        state, g_out = jax.jit(g_step)(state, d_out["z"])
        return state, [d_out, g_out]

    return unit


def _spec():
    """name -> (cfg, batch, unit, marks). Imports deferred so collection
    stays cheap."""
    from tpugan.models import (  # noqa: F401
        aae, acgan, began, bgan, bicyclegan, ccgan, cgan, cluster_gan,
        cogan, context_encoder, cyclegan, dcgan, discogan, dragan, dualgan,
        ebgan, esrgan, gan, infogan, lsgan, munit, pix2pix, pixelda,
        relativistic_gan, sgan, softmax_gan, srgan, stargan, unit, wgan,
        wgan_div, wgan_gp,
    )

    B8 = dict(batch_size=8, latent_dim=16, synthetic_data=True)

    def mnist(mod, size):
        return (
            mod.Config(**B8),
            (_imgs(8, size), _labels(8)),
            _single_step_unit(mod),
            (),
        )

    def cluster_unit(cfg, mods, state, batch):
        full_step, d_step = cluster_gan.make_steps(cfg, mods)
        state, full_out = jax.jit(full_step)(state, *batch)
        state, d_out = jax.jit(d_step)(state, *batch)
        return state, [full_out, d_out]

    def stargan_unit(cfg, mods, state, batch):
        d_step, g_step = stargan.make_steps(cfg, mods)
        imgs, labels = batch
        state, d_out = jax.jit(d_step)(state, imgs, labels)
        state, g_out = jax.jit(g_step)(
            state, imgs, labels, d_out["sampled_c"]
        )
        return state, [d_out, g_out]

    def dualgan_unit(cfg, mods, state, batch):
        d_step, g_step = dualgan.make_steps(cfg, mods)
        state, d_out = jax.jit(d_step)(state, *batch)
        state, g_out = jax.jit(g_step)(state, *batch)
        return state, [d_out, g_out]

    def esrgan_unit(cfg, mods, state, batch):
        warmup_step, full_step = esrgan.make_steps(cfg, mods)
        state, w_out = jax.jit(warmup_step)(state, *batch)
        state, f_out = jax.jit(full_step)(state, *batch)
        return state, [w_out, f_out]

    def scan_step_unit(mod, **mk_kw):
        def unit(cfg, mods, state, batch):
            step = jax.jit(mod.make_step(cfg, mods, **mk_kw))
            state, out = step(state, *batch)
            return state, [out]

        return unit

    two_dom = (_imgs(8, 32, 3, 0), _labels(8), _imgs(8, 32, 3, 2),
               _labels(8, seed=3))
    pair2_64 = (_imgs(2, 64, 3, 0), _imgs(2, 64, 3, 1))
    pair2_128 = (_imgs(2, 128, 3, 0), _imgs(2, 128, 3, 1))
    slow = (pytest.mark.slow,)

    return {
        "gan": mnist(gan, 28),
        "dcgan": mnist(dcgan, 32),
        "lsgan": mnist(lsgan, 32),
        "dragan": mnist(dragan, 32),
        "cgan": mnist(cgan, 32),
        "acgan": mnist(acgan, 32),
        "sgan": mnist(sgan, 32),
        "infogan": mnist(infogan, 32),
        "bgan": mnist(bgan, 28),
        "softmax_gan": mnist(softmax_gan, 28),
        "relativistic_gan": mnist(relativistic_gan, 32),
        "ebgan": mnist(ebgan, 32),
        "began": mnist(began, 32),
        "aae": mnist(aae, 32),
        "wgan": (wgan.Config(**B8), (_imgs(8, 28), _labels(8)),
                 _critic_unit(wgan), ()),
        "wgan_gp": (wgan_gp.Config(**B8), (_imgs(8, 28), _labels(8)),
                    _critic_unit(wgan_gp), ()),
        "wgan_div": (wgan_div.Config(**B8), (_imgs(8, 28), _labels(8)),
                     _critic_unit(wgan_div), ()),
        "cluster_gan": (
            cluster_gan.Config(batch_size=8, latent_dim=12,
                               synthetic_data=True),
            (_imgs(8, 28), _labels(8)), cluster_unit, (),
        ),
        "cogan": (cogan.Config(**B8), two_dom, _single_step_unit(cogan), ()),
        "pixelda": (
            pixelda.Config(batch_size=8, latent_dim=10, n_residual_blocks=1,
                           synthetic_data=True),
            two_dom, _single_step_unit(pixelda), (),
        ),
        "cyclegan": (
            cyclegan.Config(batch_size=8, img_height=64, img_width=64,
                            n_residual_blocks=1, synthetic_data=True),
            (_imgs(8, 64, 3, 0), _imgs(8, 64, 3, 1)),
            scan_step_unit(cyclegan, steps_per_epoch=4), (),
        ),
        "pix2pix": (
            pix2pix.Config(batch_size=2, synthetic_data=True),
            (_imgs(2, 256, 3, 0), _imgs(2, 256, 3, 1)),
            _single_step_unit(pix2pix), slow,
        ),
        "discogan": (
            discogan.Config(batch_size=2, synthetic_data=True),
            pair2_64, _single_step_unit(discogan), (),
        ),
        "dualgan": (
            dualgan.Config(batch_size=2, img_size=128, synthetic_data=True),
            pair2_128, dualgan_unit, slow,
        ),
        "stargan": (
            stargan.Config(batch_size=8, img_height=64, img_width=64,
                           residual_blocks=2, synthetic_data=True),
            (_imgs(8, 64, 3), np.random.default_rng(4).integers(
                0, 2, (8, 5)).astype(np.float32)),
            stargan_unit, (),
        ),
        "unit": (
            unit.Config(batch_size=2, img_height=64, img_width=64,
                        synthetic_data=True),
            pair2_64, scan_step_unit(unit, steps_per_epoch=5), slow,
        ),
        "munit": (
            munit.Config(batch_size=2, img_height=64, img_width=64,
                         synthetic_data=True),
            pair2_64, scan_step_unit(munit, steps_per_epoch=5), slow,
        ),
        "bicyclegan": (
            bicyclegan.Config(batch_size=2, img_height=128, img_width=128,
                              synthetic_data=True),
            pair2_128, _single_step_unit(bicyclegan), slow,
        ),
        "srgan": (
            srgan.Config(batch_size=2, hr_height=64, hr_width=64,
                         synthetic_data=True),
            (_imgs(2, 64, 3),), _single_step_unit(srgan), (),
        ),
        "esrgan": (
            esrgan.Config(batch_size=2, hr_height=64, hr_width=64,
                          residual_blocks=2, synthetic_data=True),
            (_imgs(2, 64, 3),), esrgan_unit, slow,
        ),
        "context_encoder": (
            context_encoder.Config(batch_size=2, synthetic_data=True),
            (_imgs(2, 128, 3),), _single_step_unit(context_encoder), slow,
        ),
        "ccgan": (
            ccgan.Config(batch_size=2, synthetic_data=True),
            (_imgs(2, 128, 3),), _single_step_unit(ccgan), slow,
        ),
    }


_SPEC = _spec()


def _scalars(out):
    return {
        k: float(v)
        for k, v in out.items()
        if np.ndim(v) == 0 and np.issubdtype(np.asarray(v).dtype, np.floating)
    }


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=s[3]) for n, s in sorted(_SPEC.items())],
)
def test_recipe_step_matches_single_device_under_sharding(name):
    cfg, batch, unit_fn, _ = _SPEC[name]
    mod = __import__(f"tpugan.models.{name}", fromlist=[name])
    mods = mod.build(cfg)

    def fresh_state():
        try:
            return mod.create_state(cfg, mods, steps_per_epoch=5)
        except TypeError:
            return mod.create_state(cfg, mods)

    # Leg 1: unsharded on the default device.
    s1, outs1 = unit_fn(cfg, mods, fresh_state(), batch)

    # Leg 2: batch sharded over the mesh, state replicated — the exact
    # placement run()'s auto-DP wiring produces.
    n_dev = 8 if batch[0].shape[0] % 8 == 0 else 2
    mesh = data_mesh(jax.devices()[:n_dev])
    bsh = batch_sharding(mesh)
    sharded_batch = tuple(jax.device_put(x, bsh) for x in batch)
    s8, outs8 = unit_fn(cfg, mods, shard_state(fresh_state(), mesh),
                        sharded_batch)

    for o1, o8 in zip(outs1, outs8):
        sc1, sc8 = _scalars(o1), _scalars(o8)
        assert sc1.keys() == sc8.keys()
        for k in sc1:
            assert np.isfinite(sc8[k]), f"{name}:{k} not finite sharded"
            np.testing.assert_allclose(
                sc1[k], sc8[k], rtol=5e-4, atol=1e-6,
                err_msg=f"{name}:{k} diverges under sharding",
            )
    # Param tolerance: GSPMD reassociation perturbs gradients at ulp level,
    # but Adam's first-step update is ~±lr regardless of gradient magnitude,
    # so a near-zero gradient element can flip sign and land a full 2*lr
    # away (observed: began, 2/64 elements at 2e-4 = one lr unit). Real
    # sharding bugs show up at weight scale (~0.25), orders above this.
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4,
            err_msg=f"{name}: params diverge under sharding",
        )
    # The RNG chain must be identical — schedule bugs show up here first.
    assert np.array_equal(np.asarray(s1.rng), np.asarray(s8.rng))
