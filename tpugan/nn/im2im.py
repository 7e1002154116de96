"""Template-C building blocks: U-Net, ResNet generator, PatchGAN.

Sources (all under /root/reference/implementations/):
- U-Net down/up blocks + 8-down/7-up generator: pix2pix/models.py:20-101
- ReflectionPad ResNet generator + residual block: cyclegan/models.py:22-87
- PatchGAN discriminator (4 stride-2 blocks, ZeroPad2d((1,0,1,0)) + 4x4
  head): pix2pix/models.py:109-133 (conditional, cat(A,B)),
  cyclegan/models.py:95-122 (unconditional)

All NHWC. InstanceNorm is affine=False in these scripts (torch default), so
norms carry no params; ``weights_init_normal`` (conv N(0,0.02)) maps to
init_mode="normal02" (pix2pix — biases keep torch init, models.py:6-12) or
"normal02zero" (cyclegan zeroes conv biases too, models.py:6-14).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpugan.nn.layers import (
    Conv,
    ConvTranspose,
    Dropout,
    InstanceNorm,
    Upsample,
    leaky_relu,
)


def reflection_pad(x: jax.Array, pad: int) -> jax.Array:
    """nn.ReflectionPad2d(pad) on NHWC (flip-concat lowering — see
    tpugan.ops.image.reflection_pad_2d for the profile rationale)."""
    from tpugan.ops.image import reflection_pad_2d

    return reflection_pad_2d(x, pad)


def zero_pad_lt(x: jax.Array) -> jax.Array:
    """nn.ZeroPad2d((1, 0, 1, 0)) — pad left and top by one (the PatchGAN
    head's asymmetric pad, pix2pix/models.py:126)."""
    return jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))


class UNetDown(nn.Module):
    """pix2pix/models.py:20-32: Conv(4,2,1,bias=False) -> [InstanceNorm] ->
    LeakyReLU(0.2) -> [Dropout]. ``use_bias=True`` gives the discogan
    variant (discogan/models.py:23); ``affine=True`` the dualgan variant
    (dualgan/models.py:25-27, affine IN params keep torch init)."""

    features: int
    normalize: bool = True
    dropout: float = 0.0
    use_bias: bool = False
    affine: bool = False
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(
            self.features, 4, 2, 1, use_bias=self.use_bias,
            init_mode=self.init_mode,
        )(x)
        if self.normalize:
            x = InstanceNorm(affine=self.affine)(x)
        x = leaky_relu(x, 0.2)
        if self.dropout:
            x = Dropout(self.dropout)(x, train=train)
        return x


class UNetUp(nn.Module):
    """pix2pix/models.py:35-52: ConvTranspose(4,2,1,bias=False) ->
    InstanceNorm -> ReLU -> [Dropout]; concatenates the skip on channels."""

    features: int
    dropout: float = 0.0
    use_bias: bool = False
    affine: bool = False
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        x = ConvTranspose(
            self.features, 4, 2, 1, use_bias=self.use_bias,
            init_mode=self.init_mode,
        )(x)
        x = InstanceNorm(affine=self.affine)(x)
        x = nn.relu(x)
        if self.dropout:
            x = Dropout(self.dropout)(x, train=train)
        return jnp.concatenate([x, skip], axis=-1)


class GeneratorUNet(nn.Module):
    """The pix2pix 8-down/7-up U-Net (pix2pix/models.py:55-101)."""

    out_channels: int = 3
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, x, train: bool = True):
        im = self.init_mode
        d1 = UNetDown(64, normalize=False, init_mode=im)(x, train)
        d2 = UNetDown(128, init_mode=im)(d1, train)
        d3 = UNetDown(256, init_mode=im)(d2, train)
        d4 = UNetDown(512, dropout=0.5, init_mode=im)(d3, train)
        d5 = UNetDown(512, dropout=0.5, init_mode=im)(d4, train)
        d6 = UNetDown(512, dropout=0.5, init_mode=im)(d5, train)
        d7 = UNetDown(512, dropout=0.5, init_mode=im)(d6, train)
        d8 = UNetDown(512, normalize=False, dropout=0.5, init_mode=im)(d7, train)
        u1 = UNetUp(512, dropout=0.5, init_mode=im)(d8, d7, train)
        u2 = UNetUp(512, dropout=0.5, init_mode=im)(u1, d6, train)
        u3 = UNetUp(512, dropout=0.5, init_mode=im)(u2, d5, train)
        u4 = UNetUp(512, dropout=0.5, init_mode=im)(u3, d4, train)
        u5 = UNetUp(256, init_mode=im)(u4, d3, train)
        u6 = UNetUp(128, init_mode=im)(u5, d2, train)
        u7 = UNetUp(64, init_mode=im)(u6, d1, train)
        # final: Upsample -> ZeroPad2d((1,0,1,0)) -> Conv(4, p1) -> Tanh
        y = Upsample(2)(u7)
        y = zero_pad_lt(y)
        y = Conv(self.out_channels, 4, 1, 1, init_mode=im)(y)
        return jnp.tanh(y)


def _residual_remat() -> str:
    """Selective rematerialization policy (DEFAULT ``trunk``): only conv
    boundaries (tagged ``cg_conv_in`` / ``cg_conv_out``) are stashed for
    backward; pads, instance-norm stats and activations are recomputed
    from them. Unlike full nn.remat — measured SLOWER at 256px/batch-1
    (BASELINE.md: recompute of the convs costs more than the stash
    bandwidth saved) — this policy never redoes a conv: wgrads read the
    saved inputs, the elementwise tail re-derives from the saved outputs.
    Modes: ``trunk`` (residual blocks only — the default: measured +10%
    on the CycleGAN 256px step, same-session A/B both orders,
    BASELINE.md), ``names`` (trunk + generator head/tail — measured
    NEUTRAL-TO-NEGATIVE, 22.7 vs 22.93 img/s bf16, kept as the A/B arm;
    see BASELINE.md's rejected-optimizations record), ``off``. All modes
    bit-exact (tests/test_im2im_core.py)."""
    import os

    mode = os.environ.get("TPUGAN_REMAT", "trunk")
    if mode not in ("names", "trunk", "off"):
        # Silently ignoring e.g. TPUGAN_REMAT=1 (the TPUGAN_PALLAS=1
        # spelling) would run the slower path while the user believes
        # remat is forced on — poisoning A/B measurements.
        raise ValueError(
            f"TPUGAN_REMAT={mode!r}: expected 'trunk' (default), 'names', "
            "or 'off'"
        )
    return mode


class ResidualBlockIN(nn.Module):
    """cyclegan/models.py:22-37: ReflectionPad(1)-Conv3-IN-ReLU-
    ReflectionPad(1)-Conv3-IN with identity skip."""

    features: int
    init_mode: str = "normal02zero"

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        from jax.ad_checkpoint import checkpoint_name

        from tpugan.ops.pallas_kernels import instance_norm_act

        y = reflection_pad(x, 1)
        y = checkpoint_name(y, "cg_conv_in")
        y = Conv(self.features, 3, 1, 0, init_mode=self.init_mode)(y)
        y = checkpoint_name(y, "cg_conv_out")
        y = instance_norm_act(y, 0.0)  # fused IN+ReLU under TPUGAN_PALLAS=1
        y = reflection_pad(y, 1)
        y = checkpoint_name(y, "cg_conv_in")
        y = Conv(self.features, 3, 1, 0, init_mode=self.init_mode)(y)
        y = checkpoint_name(y, "cg_conv_out")
        y = InstanceNorm()(y)
        return x + y


class GeneratorResNet(nn.Module):
    """cyclegan/models.py:40-87: c7s1-64, 2x stride-2 down, N residual,
    2x (Upsample + conv) up, c7s1-C, all InstanceNorm/ReLU, reflection pads
    of size ``channels`` at both ends (the reference passes the channel
    count as the pad — a quirk kept verbatim).

    Under ``TPUGAN_REMAT=names`` the head and tail chains additionally run
    inside their own save-only-conv-boundaries regions (same policy as the
    residual trunk). Motivation: the post-IN-stats device trace of the
    43.6 ms bf16 256px step attributed ~2 ms of "data formatting" to
    activation-mask (select_n pred) and layout copies stashed around
    exactly these non-trunk convs. Measured result: NO win — 22.7 vs
    22.93 img/s bf16 (same-session A/B, both orders; the recompute +
    re-stash layout copies give back what the smaller stash saves), so
    the default stays ``trunk`` and ``names`` is kept as the documented
    A/B arm (BASELINE.md rejected-optimizations record)."""

    channels: int
    num_residual_blocks: int
    init_mode: str = "normal02zero"

    def _head(self, x):
        """reflection_pad -> c7s1-64 -> IN+ReLU -> 2x (stride-2 conv ->
        IN+ReLU). Conv boundaries tagged for save_only_these_names."""
        from jax.ad_checkpoint import checkpoint_name

        from tpugan.ops.pallas_kernels import instance_norm_act

        im = self.init_mode
        y = reflection_pad(x, self.channels)
        y = checkpoint_name(y, "cg_conv_in")
        y = Conv(64, 7, 1, 0, init_mode=im)(y)
        y = checkpoint_name(y, "cg_conv_out")
        y = instance_norm_act(y, 0.0)  # fused IN+ReLU under TPUGAN_PALLAS=1
        feats = 64
        for _ in range(2):
            feats *= 2
            y = checkpoint_name(y, "cg_conv_in")
            y = Conv(feats, 3, 2, 1, init_mode=im)(y)
            y = checkpoint_name(y, "cg_conv_out")
            y = instance_norm_act(y, 0.0)
        return y

    def _tail(self, y):
        """2x (Upsample -> conv -> IN+ReLU) -> reflection_pad -> c7s1-C ->
        tanh. Conv boundaries tagged for save_only_these_names."""
        from jax.ad_checkpoint import checkpoint_name

        from tpugan.ops.pallas_kernels import instance_norm_act

        im = self.init_mode
        feats = 256
        for _ in range(2):
            feats //= 2
            y = Upsample(2)(y)
            y = checkpoint_name(y, "cg_conv_in")
            y = Conv(feats, 3, 1, 1, init_mode=im)(y)
            y = checkpoint_name(y, "cg_conv_out")
            y = instance_norm_act(y, 0.0)
        y = reflection_pad(y, self.channels)
        y = checkpoint_name(y, "cg_conv_in")
        y = Conv(self.channels, 7, 1, 0, init_mode=im)(y)
        y = checkpoint_name(y, "cg_conv_out")
        return jnp.tanh(y)

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        head, tail = GeneratorResNet._head, GeneratorResNet._tail
        block_cls = ResidualBlockIN
        mode = _residual_remat()
        if mode != "off":
            policy = jax.checkpoint_policies.save_only_these_names(
                "cg_conv_in", "cg_conv_out"
            )
            block_cls = nn.remat(ResidualBlockIN, policy=policy)
        if mode == "names":
            # Lifted-function remat keeps the compact scope (and so the
            # Conv_*/Upsample_* auto-names and the param tree) identical
            # to the plain method call — pinned by
            # tests/test_im2im_core.py:test_residual_remat_mode_is_bit_exact.
            head = nn.remat(head, policy=policy)
            tail = nn.remat(tail, policy=policy)
        y = head(self, x)
        feats = 256
        for i in range(self.num_residual_blocks):
            # Explicit name: the nn.remat wrapper would otherwise rename
            # the scope (Checkpoint... prefix) and break checkpoint/interop
            # path compatibility between the two modes.
            y = block_cls(
                feats, init_mode=self.init_mode, name=f"ResidualBlockIN_{i}"
            )(y)
        return tail(self, y)


class PatchGAN(nn.Module):
    """The shared PatchGAN discriminator family.

    filters/normalize-first/head-bias parameterize the per-script deltas:
    - pix2pix/models.py:109-133 — 4 blocks, head bias=False, input cat(A,B)
      (concatenation is the caller's job)
    - cyclegan/models.py:95-122 — 4 blocks, head bias=True
    - discogan/models.py:94-120 — 3 blocks (patch H/8)
    Output patch is (H/2^n + const) with the ZeroPad2d((1,0,1,0)) + 4x4 head.
    """

    filters: Sequence[int] = (64, 128, 256, 512)
    head_bias: bool = True
    head_padding: int = 1
    norm: str = "instance"  # "instance" | "batch08" (dualgan/models.py:110)
    init_mode: str = "normal02"

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img
        for i, f in enumerate(self.filters):
            x = Conv(f, 4, 2, 1, init_mode=self.init_mode)(x)
            if i > 0 and self.norm == "instance":
                # Stat-free IN + LeakyReLU tail: one fused kernel under
                # TPUGAN_PALLAS=1 (ops/pallas_kernels.py), XLA composition
                # otherwise — bit-identical either way.
                from tpugan.ops.pallas_kernels import instance_norm_act

                x = instance_norm_act(x, 0.2)
                continue
            if i > 0:
                if self.norm == "batch08":
                    from tpugan.nn.layers import BatchNorm

                    x = BatchNorm(eps=0.8, init_mode=self.init_mode)(
                        x, train=train
                    )
                else:
                    raise ValueError(self.norm)
            x = leaky_relu(x, 0.2)
        x = zero_pad_lt(x)
        return Conv(
            1, 4, 1, self.head_padding, use_bias=self.head_bias,
            init_mode=self.init_mode,
        )(x)
