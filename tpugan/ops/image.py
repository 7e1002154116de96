"""Image-space ops on NHWC tensors.

The framework is NHWC end-to-end (TPU-native layout: the channel dim lands on
the 128-wide lane dimension). These are the XLA reference implementations of
the ops the reference delegates to torch.nn (PixelShuffle
/root/reference/implementations/srgan/models.py:56, Upsample
dcgan/dcgan.py:55, ReflectionPad2d cyclegan/models.py:47, AvgPool2d
munit/models.py:221); Pallas fast paths live in ``tpugan.ops.pallas_kernels``
and are parity-tested against these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, upscale_factor: int) -> jax.Array:
    """Rearrange (B, H, W, C*r^2) -> (B, H*r, W*r, C).

    Matches torch.nn.PixelShuffle channel ordering: input channel index
    c_in = c_out * r^2 + dy * r + dx (torch NCHW convention translated to
    NHWC).
    """
    b, h, w, c = x.shape
    r = upscale_factor
    c_out = c // (r * r)
    # named_scope -> HLO op_name metadata -> xprof 'tf_op', so device traces
    # can attribute what pixel-shuffle actually costs (BASELINE.json
    # north-star clause; scripts/profile_sr.py).
    with jax.named_scope("pixel_shuffle"):
        # torch PixelShuffle views channels as (C_out, r, r)
        x = x.reshape(b, h, w, c_out, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r(dy), w, r(dx), c_out
        return x.reshape(b, h * r, w * r, c_out)


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor integer upsampling (torch nn.Upsample default)."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize (align_corners=False torch semantics ~ jax.image)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


def reflection_pad_2d(x: jax.Array, pad: int) -> jax.Array:
    """torch nn.ReflectionPad2d(pad) on NHWC.

    Lowered as flipped edge slices + one concat per spatial axis instead of
    ``jnp.pad(mode="reflect")``: the jnp.pad lowering produced ~70 slice +
    150 pad HLOs per CycleGAN ResidualBlockIN across fwd+bwd (BASELINE.md
    256px step profile); this form is 2 slices + 2 reverses + 1 concat per
    axis, with a correspondingly small VJP. TPUGAN_REFLECT_PAD=jnp restores
    the jnp.pad lowering for A/B timing (BASELINE.md records the
    measurements)."""
    import os

    if os.environ.get("TPUGAN_REFLECT_PAD", "concat") == "jnp":
        return jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
        )
    top = jnp.flip(x[:, 1 : pad + 1], axis=1)
    bot = jnp.flip(x[:, -pad - 1 : -1], axis=1)
    x = jnp.concatenate([top, x, bot], axis=1)
    left = jnp.flip(x[:, :, 1 : pad + 1], axis=2)
    right = jnp.flip(x[:, :, -pad - 1 : -1], axis=2)
    return jnp.concatenate([left, x, right], axis=2)


def zero_pad_2d(x: jax.Array, pad) -> jax.Array:
    """torch nn.ZeroPad2d — pad is int or (left, right, top, bottom)."""
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def avg_pool(x: jax.Array, window: int, stride: int, padding: int = 0,
             count_include_pad: bool = True) -> jax.Array:
    """torch nn.AvgPool2d on NHWC (count_include_pad=True default)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    if count_include_pad:
        return summed / (window * window)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    return summed / counts


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))
