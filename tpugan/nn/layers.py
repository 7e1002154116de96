"""flax.linen layer wrappers with PyTorch-parity init and shape semantics.

All spatial tensors are NHWC (TPU-native: channels land on the 128-lane
dimension; XLA tiles convs onto the MXU without layout transposes). The
wrappers exist to pin down three parity concerns the raw flax layers leave
open:

1. init distributions (PyTorch kaiming_uniform(a=sqrt(5)) defaults vs the
   ``weights_init_normal`` N(0,0.02) regime — selected via ``init_mode``);
2. integer padding semantics of torch Conv2d/ConvTranspose2d;
3. BatchNorm/InstanceNorm conventions (torch momentum direction, the
   reference's eccentric ``BatchNorm(C, 0.8)`` eps — see SURVEY.md §5 item 1).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.ops.init import (
    normal_init,
    ones_normal_init,
    torch_bias_uniform,
    torch_kaiming_uniform,
)
from tpugan.ops.image import pixel_shuffle, upsample_nearest, resize_bilinear

Dtype = Any

# Global compute-dtype knob (BaseConfig.dtype wires it): None = float32
# parity; jnp.bfloat16 = mixed precision (bf16 conv/dense compute on the
# MXU, float32 params and norm statistics). Wrappers read it when their own
# ``dtype`` field is unset.
_DEFAULT_COMPUTE_DTYPE = [None]


def set_default_compute_dtype(dtype) -> None:
    """Set the process-wide compute dtype for Conv/ConvTranspose/Linear
    (norms deliberately stay float32 for stable statistics)."""
    _DEFAULT_COMPUTE_DTYPE[0] = dtype


def resolve_dtype(dtype_str: str):
    """Map a BaseConfig.dtype string to the knob value."""
    return {"float32": None, "bfloat16": jnp.bfloat16}[dtype_str]


def _compute_dtype(explicit):
    return explicit if explicit is not None else _DEFAULT_COMPUTE_DTYPE[0]


def _weight_init(mode: str, fan_in: int):
    if mode == "torch":
        return torch_kaiming_uniform(fan_in)
    if mode in ("normal02", "normal02zero"):
        return normal_init(0.0, 0.02)
    if mode == "he":
        # kaiming-normal relu gain on fan_in: preserves activation variance
        # through deep ReLU stacks (used by the random-feature VGG fallback;
        # torch-default U(1/sqrt(fan_in)) decays activations ~0.6x/layer).
        from tpugan.ops.init import kaiming_normal

        return kaiming_normal(fan_in)
    raise ValueError(f"unknown init_mode {mode!r}")


def _bias_init(mode: str, fan_in: int):
    # "normal02zero" = clustergan's initialize_weights: weight ~ N(0,0.02)
    # AND bias zeroed for Conv/ConvTranspose/Linear (clustergan.py:106-116).
    if mode == "normal02zero":
        return nn.initializers.zeros
    return torch_bias_uniform(fan_in)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def flatten_nchw(x: jax.Array) -> jax.Array:
    """torch ``img.view(B, -1)`` parity from an NHWC tensor: flatten in
    (C, H, W) element order so Linear weights transplant exactly
    (tests/test_golden_parity.py). Non-spatial inputs (already (B, F), e.g.
    aae's latent-space discriminator) pass through unchanged."""
    if x.ndim != 4:
        return x.reshape(x.shape[0], -1)
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)


def unflatten_nchw(x: jax.Array, c: int, h: int, w: int) -> jax.Array:
    """torch ``flat.view(B, C, H, W)`` parity, returned as NHWC."""
    return jnp.transpose(x.reshape(x.shape[0], c, h, w), (0, 2, 3, 1))


class Linear(nn.Module):
    """torch.nn.Linear parity (weight & bias U(+-1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True
    init_mode: str = "torch"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=_weight_init(self.init_mode, fan_in),
            bias_init=_bias_init(self.init_mode, fan_in),
            dtype=_compute_dtype(self.dtype),
        )(x)


class _PackConv(nn.Module):
    """Stand-in for the wrapper's ``nn.Conv`` child on tiny-channel
    stride-1 boundary layers, computing through the space-to-depth packed
    lowering (ops/conv_pack.py — measured 3.9 vs 99 TFLOPS for the direct
    lowering of these convs on the 256px CycleGAN step). Param tree is
    IDENTICAL to ``nn.Conv`` (same scope name, param names, shapes,
    fp32 param dtype), so checkpoints/transplants/DP sharding never see
    which compute path ran — and the param structure stays independent of
    input size (the project invariant) because creation precedes routing.
    """

    features: int
    kernel_size: int
    padding: int
    use_bias: bool
    kernel_init: Any
    bias_init: Any
    dtype: Optional[Dtype]
    stride: int = 1
    r: int = 8

    @nn.compact
    def __call__(self, x):
        from flax.linen.dtypes import promote_dtype

        from tpugan.ops.conv_pack import conv_small_channel

        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        return conv_small_channel(
            x, kernel, bias, padding=self.padding, r=self.r, stride=self.stride
        )


class _SplitConv(nn.Module):
    """Channel-split lowering for convs whose input is a CONCATENATION:
    ``conv(concat(t_0..t_n), W) == sum_j conv(t_j, W[:, :, off_j:, :])``
    (exact linearity in the input channels). Used for the esrgan
    DenseResidualBlock (esrgan/models.py:18-45), whose five dense concats
    per block cost 11.3 ms/step of `concatenate` plus 6.0 ms of `add_any`
    duals in the 96.5 ms bf16 256px step (2026-08-19 device trace) — this
    lowering never materializes the concat buffers. Param tree is
    IDENTICAL to ``nn.Conv`` (same scope name via name="Conv_0", param
    names, shapes, fp32 param dtype), so checkpoints/transplants/DP
    sharding never see which path ran. Accumulation grouping differs from
    the one-big-conv form (partials sum in the compute dtype), so parity
    is ~1e-6 relative in fp32, NOT bitwise (tests/test_dense_split.py)."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    kernel_init: Any
    bias_init: Any
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, parts):
        from flax.linen.dtypes import promote_dtype

        k = self.kernel_size
        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        promoted = promote_dtype(*parts, kernel, bias, dtype=self.dtype)
        parts, kernel, bias = promoted[:-2], promoted[-2], promoted[-1]
        out = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            w = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            off += c
            y = jax.lax.conv_general_dilated(
                p,
                w,
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
        if bias is not None:
            out = out + bias
        return out


def _dense_split_enabled() -> bool:
    import os

    return os.environ.get("TPUGAN_DENSE_SPLIT", "0") == "1"


def _pack3_enabled() -> bool:
    import os

    return os.environ.get("TPUGAN_PACK3", "1") == "1"


# Routing floors for the packed path: below these spatial extents the s2d
# reshuffle overhead outweighs the lane win. Module-level so tests can
# lower them to exercise the in-model routing at CPU-friendly sizes.
# Pack factors per arm are measured (scripts/bench_pack_floor.py,
# 2026-08-19 on-chip): r=8 for >=128x128 stride-1 (step-proven on the
# 256px CycleGAN A/B), r=4 for the 64px-class stride-1 stem (3.2x over
# direct; r=4 beat r=8 109.5 -> 96.2 us) and for the stride-2 k=4
# boundary entries (pix2pix_d 325 -> 159 us, r=4 decisively over r=8).
_PACK3_MIN_PIXELS = 128 * 128
_PACK3_MIN_PIXELS_SMALL = 64 * 64   # stride-1 arm, routed with r=4
_PACK3_STRIDED_MIN_PIXELS = 128 * 128  # stride-2 arm (measured at 256px)


class Conv(nn.Module):
    """torch.nn.Conv2d(in, out, k, stride, padding) parity on NHWC.

    Large-spatial tiny-channel boundary convs route to the space-to-depth
    packed lowering — see ops/conv_pack.py for the measured rationale,
    scripts/bench_pack_floor.py for the per-arm floor/pack-factor A/Bs.
    Three measured arms: stride-1 k>=5 <=4ch >=128x128 (the im2im
    c7s1-64/c7s1-3 boundaries, cyclegan/models.py:40-56, r=8,
    step-proven +29%); stride-1 k>=5 <=4ch 64x64-class (the SRGAN c9s1-64
    stem at LR 64px, srgan/models.py:38, r=4, 3.2x in isolation); and
    stride-2 k>=4 <=8ch >=128x128 (the pix2pix-family PatchGAN/UNet
    entry convs, pix2pix/models.py:16-27,114, r=4, 2x in isolation).
    TPUGAN_PACK3=0 restores the direct path everywhere; all paths share
    one param tree."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    init_mode: str = "torch"
    dtype: Optional[Dtype] = None

    def _pack_factor(self, x) -> int:
        """0 = direct lowering; otherwise the measured pack factor r."""
        if x.ndim != 4 or not _pack3_enabled():
            return 0
        k, pixels = self.kernel_size, x.shape[1] * x.shape[2]
        small_ch = min(x.shape[-1], self.features)
        if self.stride == 1 and k >= 5 and small_ch <= 4:
            if pixels >= _PACK3_MIN_PIXELS:
                return 8
            if pixels >= _PACK3_MIN_PIXELS_SMALL:
                return 4
        if (
            self.stride == 2
            and k >= 4
            and small_ch <= 8
            and pixels >= _PACK3_STRIDED_MIN_PIXELS
        ):
            return 4
        return 0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if isinstance(x, (tuple, list)):
            # Caller-declared channel concatenation (dense blocks). Either
            # lower through _SplitConv (never materializes the concat) or
            # fall back to an explicit concatenate + the normal routing —
            # one param tree either way.
            if len(x) == 1:
                x = x[0]
            elif _dense_split_enabled():
                fan_in = sum(p.shape[-1] for p in x) * k * k
                return _SplitConv(
                    features=self.features,
                    kernel_size=k,
                    stride=self.stride,
                    padding=self.padding,
                    use_bias=self.use_bias,
                    kernel_init=_weight_init(self.init_mode, fan_in),
                    bias_init=_bias_init(self.init_mode, fan_in),
                    dtype=_compute_dtype(self.dtype),
                    name="Conv_0",
                )(tuple(x))
            else:
                x = jnp.concatenate(x, axis=-1)
        fan_in = x.shape[-1] * k * k
        r = self._pack_factor(x)
        if r:
            return _PackConv(
                features=self.features,
                kernel_size=k,
                padding=self.padding,
                use_bias=self.use_bias,
                kernel_init=_weight_init(self.init_mode, fan_in),
                bias_init=_bias_init(self.init_mode, fan_in),
                dtype=_compute_dtype(self.dtype),
                stride=self.stride,
                r=r,
                name="Conv_0",
            )(x)
        return nn.Conv(
            self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=_weight_init(self.init_mode, fan_in),
            bias_init=_bias_init(self.init_mode, fan_in),
            dtype=_compute_dtype(self.dtype),
        )(x)


class ConvTranspose(nn.Module):
    """torch.nn.ConvTranspose2d parity: out = (in-1)*s - 2p + k.

    PyTorch counts ConvTranspose fan_in along the *output*-channel dim
    (weight shape (C_in, C_out, k, k) -> fan_in = C_out*k*k).
    Used by cluster_gan/clustergan.py:174-179, pix2pix/models.py:39,
    dualgan/models.py, context_encoder/models.py.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    init_mode: str = "torch"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        fan_in = self.features * k * k  # torch ConvTranspose fan_in quirk
        # The param tree is IDENTICAL regardless of input size or code
        # path: this module owns `kernel`/`bias` directly (HWOI — the
        # lax.conv_transpose(transpose_kernel=True) layout, matching torch
        # IOHW under the interop transpose). An input-size-dependent
        # structure (an earlier revision nested the slow path's params in
        # a flax nn.ConvTranspose child scope) breaks checkpoint/template
        # matching across --img_size values within one architecture.
        kernel = self.param(
            "kernel", _weight_init(self.init_mode, fan_in),
            (k, k, self.features, x.shape[-1]),
        )
        bias = (
            self.param(
                "bias", _bias_init(self.init_mode, fan_in), (self.features,)
            )
            if self.use_bias
            else None
        )
        dt = _compute_dtype(self.dtype)
        if dt is not None:
            x = x.astype(dt)
            kernel = kernel.astype(dt)
            bias = None if bias is None else bias.astype(dt)
        if (k, s, p) == (4, 2, 1) and x.shape[1] * x.shape[2] >= 1024:
            # The zoo's hot configuration (every U-Net up block): use the
            # kernel-segregated decomposition — four dense 2x2 convs instead
            # of one zero-dilated 4x4 conv. Measured on a v5e chip
            # (tpugan/ops/conv_transpose.py): 2.0x fwd / 1.5x bwd at
            # 64x64x512, 1.4x fwd at 128x128x256, but ~parity at 16x16 and
            # below where the interleave overhead dominates — hence the
            # >=32x32 spatial gate (identical params/outputs either way,
            # so the gate never changes numerics, only the schedule).
            from tpugan.ops.conv_transpose import conv_transpose_s2k4p1

            return conv_transpose_s2k4p1(x, kernel, bias)
        y = jax.lax.conv_transpose(
            x, kernel, (s, s),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        if bias is not None:
            y = y + bias
        # torch output size: (in-1)*s - 2p + k ; trim if lax differs.
        want_h = (x.shape[1] - 1) * s - 2 * p + k
        want_w = (x.shape[2] - 1) * s - 2 * p + k
        if y.shape[1] != want_h or y.shape[2] != want_w:
            y = y[:, :want_h, :want_w, :]
        return y


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm1d/2d parity (custom — not flax nn.BatchNorm).

    - ``eps`` is positional in the reference and frequently 0.8 (a latent
      quirk, e.g. gan/gan.py:45) — pass it through verbatim.
    - train mode normalizes with the biased batch variance (exactly torch).
    - running stats follow torch's update rule: ``running <- (1-m)*running
      + m*batch`` with m=momentum=0.1, and the variance folded in is the
      UNBIASED batch variance (N/(N-1)) — torch BatchNorm semantics that
      flax's nn.BatchNorm (biased running var) cannot reproduce. Matters
      for eval-mode inference (esrgan/test_on_image.py:26 calls .eval())
      and for state_dicts exported back to torch.
    - the normalization itself goes through flax's own ``_compute_stats`` /
      ``_normalize`` helpers so the compiled HLO is identical to
      nn.BatchNorm's — keeping the fused K-step dispatch bit-identical to
      sequential dispatches (tests/test_scan_dispatch.py; a hand-rolled
      normalization formula measurably diverged in the gradient's fusion
      rounding between the scan and straight-line contexts).
    - param/stat leaf names (scale/bias, batch_stats mean/var) are kept
      flax-compatible so existing checkpoints and the interop layer load
      unchanged.
    """

    eps: float = 1e-5
    momentum: float = 0.1
    init_mode: str = "torch"  # "torch": scale=1 bias=0; "normal02": N(1,.02)/0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from flax.linen import normalization as fnorm

        feat = x.shape[-1]
        scale_init = (
            nn.initializers.ones if self.init_mode == "torch" else ones_normal_init(0.02)
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        import os

        axes = tuple(range(x.ndim - 1))
        # TPUGAN_BN16=0 restores the flax-helper lowering for sub-fp32
        # inputs (the A/B arm; fp32 inputs always take the flax path).
        sub_fp32 = (
            jnp.dtype(x.dtype).itemsize < 4
            and os.environ.get("TPUGAN_BN16", "1") == "1"
        )
        if train:
            if sub_fp32:
                # bf16 mixed precision: the 2026-08-19 esrgan device trace
                # showed the flax helpers promoting every BN input to f32
                # (materialized f32 maps + an f32 output that converts back
                # before the next conv) — the same pattern the IN fix
                # removed (ops/pallas_kernels.py:instance_norm_xla). f32
                # statistics via two single-pass fused reductions (the
                # convert fuses INTO each reduce; no f32 map exists);
                # E[x^2]-E[x]^2 cancellation in f32 is harmless at bf16
                # input precision.
                mean = jnp.mean(x.astype(jnp.float32), axis=axes)
                msq = jnp.mean(
                    jnp.square(x.astype(jnp.float32)), axis=axes
                )
                var = jnp.maximum(msq - jnp.square(mean), 0.0)
            else:
                mean, var = fnorm._compute_stats(x, axes, self.dtype)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        if sub_fp32:
            # Folded normalize in the compute dtype: y = x*a + b with
            # per-channel f32 vectors a = scale*rsqrt(var+eps),
            # b = bias - mean*a, each rounded to the compute dtype exactly
            # once — a conv scale+shift epilogue XLA fuses. Param
            # names/shapes/dtypes identical to the _normalize-created ones
            # (param-tree invariance across compute dtypes is pinned in
            # tests/test_layers_torch_parity.py).
            scale = self.param("scale", scale_init, (feat,), jnp.float32)
            bias = self.param(
                "bias", nn.initializers.zeros, (feat,), jnp.float32
            )
            a = scale * jax.lax.rsqrt(var + self.eps)
            b = bias - mean * a
            return x * a.astype(x.dtype) + b.astype(x.dtype)
        return fnorm._normalize(
            self, x, mean, var, axes, (-1,), self.dtype, jnp.float32,
            self.eps, True, True, nn.initializers.zeros, scale_init,
        )


class InstanceNorm(nn.Module):
    """torch.nn.InstanceNorm2d parity: per-sample per-channel spatial stats,
    no running stats, affine=False by default (cyclegan/models.py:47 et al.;
    dualgan uses affine=True).

    ``track_running_stats=True`` adds torch's buffer semantics
    (stargan/models.py:23): train mode still normalizes per-instance but
    folds the batch-mean of the instance stats into running buffers
    (variance unbiased over H*W, torch F.instance_norm), and eval mode
    normalizes with the buffers — needed for eval-parity inference and for
    importing reference stargan checkpoints (their state_dicts carry the
    buffers)."""

    affine: bool = False
    eps: float = 1e-5
    init_mode: str = "torch"
    track_running_stats: bool = False
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        from tpugan.ops.pallas_kernels import instance_norm

        if self.track_running_stats:
            feat = x.shape[-1]
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
            )
            if train:
                y = instance_norm(x, eps=self.eps)
                if not self.is_initializing():
                    inst_mean = jnp.mean(x, axis=(1, 2))  # (B, C)
                    inst_var = jnp.var(x, axis=(1, 2))
                    hw = x.shape[1] * x.shape[2]
                    unbiased = inst_var * (hw / max(hw - 1, 1))
                    m = self.momentum
                    ra_mean.value = (
                        (1.0 - m) * ra_mean.value + m * jnp.mean(inst_mean, axis=0)
                    )
                    ra_var.value = (
                        (1.0 - m) * ra_var.value + m * jnp.mean(unbiased, axis=0)
                    )
            else:
                y = (x - ra_mean.value) * jax.lax.rsqrt(
                    ra_var.value + self.eps
                )
        else:
            y = instance_norm(x, eps=self.eps)
        if self.affine:
            c = x.shape[-1]
            scale_init = (
                nn.initializers.ones
                if self.init_mode == "torch"
                else ones_normal_init(0.02)
            )
            scale = self.param("scale", scale_init, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


class LayerNormSpatial(nn.Module):
    """MUNIT's custom LayerNorm (munit/models.py:304-324): normalize over
    (H, W, C) per sample, learnable per-channel affine."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        # torch .std(1) is UNBIASED (munit/models.py:318) — match it.
        n = x.shape[1] * x.shape[2] * x.shape[3]
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True) * (n / max(n - 1, 1))
        std = jnp.sqrt(var)
        y = (x - mean) / (std + self.eps)
        if self.affine:
            c = x.shape[-1]
            gamma = self.param("gamma", nn.initializers.uniform(scale=1.0), (c,))
            beta = self.param("beta", nn.initializers.zeros, (c,))
            y = y * gamma + beta
        return y


class Embedding(nn.Module):
    """torch.nn.Embedding parity (weights ~ N(0,1))."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idx):
        return nn.Embed(
            self.num_embeddings,
            self.features,
            embedding_init=nn.initializers.normal(stddev=1.0),
        )(idx)


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.Dropout(self.rate, deterministic=not train)(x)


class Dropout2d(nn.Module):
    """torch.nn.Dropout2d: drops whole channels (broadcast over H, W)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.Dropout(
            self.rate, broadcast_dims=(1, 2), deterministic=not train
        )(x)


class PixelShuffle(nn.Module):
    upscale_factor: int

    def __call__(self, x):
        return pixel_shuffle(x, self.upscale_factor)


class Upsample(nn.Module):
    """torch.nn.Upsample (default nearest; 'bilinear' supported)."""

    scale_factor: int = 2
    mode: str = "nearest"

    def __call__(self, x):
        if self.mode == "nearest":
            return upsample_nearest(x, self.scale_factor)
        if self.mode == "bilinear":
            return resize_bilinear(
                x, (x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor)
            )
        raise ValueError(self.mode)


class PReLU(nn.Module):
    """torch.nn.PReLU parity: single learnable slope, init 0.25."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init_value), ())
        return jnp.where(x >= 0, x, a * x)
