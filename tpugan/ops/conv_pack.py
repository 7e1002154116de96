"""Space-to-depth packed convolution for tiny-channel boundary layers.

Why this exists (measured, 2026-08-19 device trace of the 256px CycleGAN
step): the reference zoo's image-boundary convolutions — c7s1-64 / c7s1-3
in the ResNet generators (cyclegan/models.py:22-87), the SRGAN c9s1 stem
(srgan/models.py:33-40) — carry a 3-channel operand, and on TPU the
channel dimension is the 128-wide vector-lane/MXU dimension. XLA runs
those convs (and their dgrad/wgrad, whose contraction or output dim is
the 3-channel one) at 1.3-4.6 TFLOPS while every other conv in the same
step runs at ~99 TFLOPS: 14.3 ms of the 62 ms step for 2.5% of the
FLOPs, plus ~4 ms of internal re-blocking copies XLA inserts trying to
repair the layout.

The TPU-native fix is the classic space-to-depth packing (the trick TPU
ResNet stems use): fold r x r spatial blocks into channels so the lane
dimension becomes r^2*C >= 128, and convolve a transformed kernel over
blocks:

    y = depth_to_space_r( conv_KxK( space_to_depth_r(x), PK ) )

with PK[a,b,(q,s,i),(p,t,o)] = W[r*a+q-p, r*b+s-t, i, o] (zero outside
the kernel support) — an exact linear re-expression of the stride-1
convolution, built from the logical kernel with two tiny one-hot
einsums so autodiff flows back to W. The packed conv's FLOPs are
(r*K/k)^2 times the logical conv's (5.2x for k=7, r=8), traded for
~40x better lane utilisation; dgrad and wgrad inherit packed shapes
automatically (4096<->192 channel contractions instead of 3).

Strides are supported when they divide the pack factor (each r-pixel
input block then generates r/s output positions — the one-hot relation
becomes kh = r*a + q - s*p); routing (which layers use it) lives in
nn/layers.py:Conv. Numerics are NOT bitwise-identical to the direct
lowering (different accumulation grouping; fp32 deltas ~1e-6 relative,
pinned in tests/test_conv_pack.py) — TPUGAN_PACK3=0 restores the direct
path.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _pack_onehot(k: int, r: int, s: int = 1) -> np.ndarray:
    """M[kh, a, q, p] = 1 iff r*a + q - s*p == kh, for kh in [0, k).

    One axis of the packed-kernel construction: output phase p (of the
    r//s output positions a block of r input pixels generates under
    logical stride s) matches input slot q of relative input block a
    through logical kernel tap kh. s=1 recovers the stride-1 packing.
    """
    K = packed_kernel_size(k, r, s)
    m = np.zeros((k, K, r, r // s), np.float32)
    for a in range(K):
        for q in range(r):
            for p in range(r // s):
                kh = r * a + q - s * p
                if 0 <= kh < k:
                    m[kh, a, q, p] = 1.0
    return m


def packed_kernel_size(k: int, r: int, s: int = 1) -> int:
    # Largest relative input block touched: kh <= k-1 with q = 0 and the
    # deepest output phase p = r//s - 1 (offset s*p = r - s).
    return 1 + (k - 1 + r - s) // r


def _space_to_depth(x, r: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def _depth_to_space(y, r: int, cout: int):
    b, hb, wb, _ = y.shape
    y = y.reshape(b, hb, wb, r, r, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hb * r, wb * r, cout)


def conv_small_channel(x, kernel, bias=None, padding: int = 0, r: int = 8,
                       stride: int = 1):
    """conv2d (NHWC x HWIO, symmetric zero ``padding``, logical ``stride``
    dividing the pack factor ``r``) computed via space-to-depth packing.
    Exact linear re-expression of

        lax.conv_general_dilated(x, kernel, (stride, stride),
                                 [(p, p), (p, p)])

    for any kernel size/channel counts; profitable when min(Cin, Cout) is
    far below the 128-lane width and the spatial extent is large. Under
    stride s each r-pixel input block generates r//s output positions, so
    the packed conv emits (r//s)^2 * Cout channels per block and the
    result is depth-to-space'd by r//s (the stride-2 k=4 boundary convs
    of the pix2pix/discogan/dualgan U-Nets and PatchGANs,
    pix2pix/models.py:109-133, are the motivating shapes)."""
    kh, kw, cin, cout = kernel.shape
    assert kh == kw, "square kernels only (the zoo uses none other)"
    assert r % stride == 0, "pack factor must be a multiple of the stride"
    k = kh
    ro = r // stride  # output block extent (output positions per block)
    b, h, w, _ = x.shape
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        h, w = h + 2 * padding, w + 2 * padding
    h_out, w_out = (h - k) // stride + 1, (w - k) // stride + 1
    K = packed_kernel_size(k, r, stride)
    # Output rounded up to whole blocks; input must cover n_ob + K - 1 blocks.
    n_obh, n_obw = -(-h_out // ro), -(-w_out // ro)
    # Whole-block coverage, never shrinking: a stride-s tail can leave the
    # (padded) input longer than the K-block window needs; extra blocks
    # just produce extra output blocks that the final slice drops.
    need_h = r * max(n_obh + K - 1, -(-h // r))
    need_w = r * max(n_obw + K - 1, -(-w // r))
    x = jnp.pad(x, ((0, 0), (0, need_h - h), (0, need_w - w), (0, 0)))

    m = jnp.asarray(_pack_onehot(k, r, stride), kernel.dtype)
    # PK[a,b,q,s,i,p,t,o] = sum_{kh,kw} M[kh,a,q,p] M[kw,b,s,t] W[kh,kw,i,o]
    pk = jnp.einsum("haqp,wbst,hwio->abqsipto", m, m, kernel)
    pk = pk.reshape(K, K, r * r * cin, ro * ro * cout)

    xp = _space_to_depth(x, r)
    yp = jax.lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = _depth_to_space(yp, ro, cout)[:, :h_out, :w_out, :]
    if bias is not None:
        y = y + bias.reshape(1, 1, 1, cout)
    return y
