"""Native (C++) host pipeline — csrc/host_pipeline.cpp via tpugan.native.

Covers the contract the data layer relies on: gather == numpy fancy
indexing, bicubic resampling BIT-EXACT with PIL (the reference's
transforms.Resize(..., BICUBIC) backend), the fused augmenter matching its
unfused Python composition, and the fallback path staying equivalent.
"""

import numpy as np
import pytest

from tpugan import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 255, shape, dtype=np.uint8)


def test_gather_matches_numpy():
    src = _rand((32, 7, 5, 3))
    idx = np.random.default_rng(1).integers(0, 32, 64)
    np.testing.assert_array_equal(native.gather(src, idx), src[idx])
    # Non-uint8 falls back to numpy.
    f = src.astype(np.float32)
    np.testing.assert_array_equal(native.gather(f, idx), f[idx])


@pytest.mark.parametrize(
    "shape,out_hw",
    [
        ((2, 100, 80, 3), (256, 256)),  # upscale
        ((2, 100, 80, 3), (37, 53)),    # downscale (antialiased support)
        ((2, 64, 64, 1), (128, 128)),   # grayscale
        ((1, 300, 300, 3), (256, 256)),  # mild downscale (cyclegan-ish)
        ((1, 28, 28, 1), (32, 32)),     # mnist -> template-B
    ],
)
def test_resize_bicubic_bit_exact_with_pil(shape, out_hw):
    from PIL import Image

    src = _rand(shape, seed=3)
    oh, ow = out_hw
    out = native.resize_bicubic(src, oh, ow)
    for i in range(shape[0]):
        im = src[i, :, :, 0] if shape[3] == 1 else src[i]
        ref = np.asarray(Image.fromarray(im).resize((ow, oh), Image.BICUBIC))
        if shape[3] == 1:
            ref = ref[..., None]
        np.testing.assert_array_equal(out[i], ref)


def test_augment_batch_matches_unfused_composition():
    src = _rand((4, 120, 90, 3), seed=5)
    rh, rw, ch, cw = 140, 100, 128, 96
    rng = np.random.default_rng(9)
    oy = rng.integers(0, rh - ch + 1, 4)
    ox = rng.integers(0, rw - cw + 1, 4)
    flip = np.array([True, False, True, False])  # exercise both branches

    fused = native.augment_batch(src, (rh, rw), (ch, cw), oy, ox, flip)
    big = native.resize_bicubic(src, rh, rw)
    for i in range(4):
        win = big[i, oy[i] : oy[i] + ch, ox[i] : ox[i] + cw]
        ref = win[:, ::-1] if flip[i] else win
        np.testing.assert_array_equal(fused[i], ref)


def test_hflip_matches_numpy():
    src = _rand((3, 9, 11, 3), seed=7)
    np.testing.assert_array_equal(native.hflip(src), src[:, :, ::-1])


def test_resize_crop_flip_transform_uses_native_and_is_deterministic():
    from tpugan.data.im2im import resize_crop_flip_transform

    t = resize_crop_flip_transform(seed=0, height=32, width=32, indices=(0,))
    batch = (_rand((2, 32, 32, 3), seed=11),)
    a = t(batch, epoch=1, bidx=2)
    b = t(batch, epoch=1, bidx=2)
    np.testing.assert_array_equal(a[0], b[0])
    assert a[0].shape == (2, 32, 32, 3) and a[0].dtype == np.uint8
    c = t(batch, epoch=1, bidx=3)  # different RNG stream -> different crop
    assert not np.array_equal(a[0], c[0])
