"""Tests for srgan + esrgan (super-resolution family) and the VGG backbone."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.models import esrgan, srgan
from tpugan.models._common import apply_mod, init_module
from tpugan.nn.vgg import (
    VGG19Features,
    imagenet_denormalize,
    imagenet_normalize,
)
from tpugan.ops.image import pixel_shuffle


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def test_vgg19_cut_shapes_and_param_parity():
    # srgan cut=18: output stride 4, 256ch; params = 2,325,568 (torch).
    v18 = VGG19Features(cut=18)
    p18, _ = init_module(v18, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert _count(p18) == 2_325_568
    out, _ = apply_mod(v18, p18, None, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 16, 16, 256)
    # esrgan cut=35: stride 16, 512ch, NO final relu; params = 20,024,384.
    v35 = VGG19Features(cut=35)
    p35, _ = init_module(v35, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert _count(p35) == 20_024_384
    out, _ = apply_mod(v35, p35, None, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 4, 4, 512)


def test_imagenet_normalize_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 4, 4, 3)))
    y = imagenet_denormalize(imagenet_normalize(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_pixel_shuffle_matches_torch_ordering():
    import torch

    x = np.random.default_rng(0).normal(size=(2, 3, 4, 16)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = (
        torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert np.allclose(ours, theirs, atol=1e-6)


def test_srgan_step_and_param_parity():
    cfg = srgan.Config(batch_size=2, hr_height=64, hr_width=64, synthetic_data=True)
    modules = srgan.build(cfg)
    state = srgan.create_state(cfg, modules)
    # torch: GeneratorResNet() = 1,550,486; Discriminator = 4,693,697.
    assert _count(state.params["generator"]) == 1_550_486
    assert _count(state.params["discriminator"]) == 4_693_697
    step = jax.jit(srgan.make_step(cfg, modules))
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    state, out = step(state, imgs)
    assert np.isfinite(float(out["d_loss"]))
    assert np.isfinite(float(out["g_loss"]))
    # 4x upsampling: 16px LR -> 64px SR.
    assert out["gen_hr"].shape == (2, 64, 64, 3)
    assert out["imgs_lr"].shape == (2, 16, 16, 3)


def test_esrgan_steps_and_param_parity():
    cfg = esrgan.Config(
        batch_size=2, hr_height=64, hr_width=64, residual_blocks=2,
        synthetic_data=True,
    )
    modules = esrgan.build(cfg)
    state = esrgan.create_state(cfg, modules)
    # torch: GeneratorRRDB(3, 64, 2) = 3,692,483.
    assert _count(state.params["generator"]) == 3_692_483
    warmup_step, full_step = esrgan.make_steps(cfg, modules)
    warmup_step, full_step = jax.jit(warmup_step), jax.jit(full_step)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    state, out = warmup_step(state, imgs)
    assert np.isfinite(float(out["loss_pixel"]))
    state, out = full_step(state, imgs)
    for k in ("d_loss", "g_loss", "loss_content", "loss_GAN", "loss_pixel"):
        assert np.isfinite(float(out[k])), k


def test_esrgan_full_param_parity_23_blocks():
    """Default 23-RRDB generator = 38,549,123 params (torch)."""
    cfg = esrgan.Config(residual_blocks=23, hr_height=64)
    G = esrgan.build(cfg)["generator"]
    p, _ = init_module(G, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    assert _count(p) == 38_549_123


def test_test_on_image_roundtrip(tmp_path):
    """The inference CLI writes images/outputs/sr-<name> at 4x resolution."""
    from PIL import Image

    from tpugan.io.checkpoint import module_payload, save_pytree
    from tpugan.models import test_on_image

    img_path = str(tmp_path / "input.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (16, 16, 3), np.uint8)
    ).save(img_path)
    cfg = test_on_image.Config(
        image_path=img_path, checkpoint_model=str(tmp_path / "g.pth"),
        residual_blocks=1, output_dir=str(tmp_path),
    )
    from tpugan.nn.sr import ESRGANGenerator

    G = ESRGANGenerator(channels=3, filters=64, num_res_blocks=1)
    params, _ = init_module(
        G, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )
    save_pytree(module_payload(params), cfg.checkpoint_model)
    out_path = test_on_image.infer_image(cfg)
    assert os.path.exists(out_path)
    sr = Image.open(out_path)
    # 4x upsample + torchvision save_image's 2px grid border on each side.
    assert sr.size == (68, 68)


def test_srgan_step_pairs_matches_fused_step():
    """make_step == make_step_pairs∘prepare_lr_hr bit-exactly (the pairs
    variant is the head-to-head harness's entry; both must be the same
    train semantics, models/srgan.py)."""
    cfg = srgan.Config(batch_size=2, hr_height=32, hr_width=32,
                       synthetic_data=True)
    modules = srgan.build(cfg)
    state = srgan.create_state(cfg, modules)
    u8 = np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3),
                                           dtype=np.uint8)
    _, out = jax.jit(srgan.make_step(cfg, modules))(state, u8)
    lr, hr = jax.jit(lambda u: srgan.prepare_lr_hr(u, 32))(jnp.asarray(u8))
    _, out2 = jax.jit(srgan.make_step_pairs(cfg, modules))(state, lr, hr)
    assert float(out["d_loss"]) == float(out2["d_loss"])
    assert float(out["g_loss"]) == float(out2["g_loss"])
