"""Kernel-segregated transposed convolution (stride 2, kernel 4, pad 1).

The zoo's hottest ConvTranspose configuration — every U-Net upsampling
block (pix2pix/models.py:39, discogan, dualgan, ccgan, stargan's ups) —
is ConvTranspose2d(k=4, s=2, p=1). XLA lowers transposed convolution to a
conv with input (lhs) dilation: the input is zero-interleaved 2x in each
axis and a full 4x4 conv runs over the doubled map, so 3/4 of the MACs
multiply structural zeros.

The kernel-segregation identity (cf. the retrieved "Kernel-Segregated
Transpose Convolution" papers, arxiv 2209.03704 / 2502.20493) removes the
waste: each output-pixel parity class (dy, dx) in {0,1}^2 touches a fixed
2x2 sub-grid of the 4x4 kernel, so the transposed conv equals FOUR
stride-1 2x2 convolutions over the undilated input, interleaved into the
output — 4x fewer MACs, all dense MXU work.

Derivation (per axis, s=2, k=4, p=1): out[o] = sum_i in[i] * w[o+1-2i]
with kernel index in [0,4):
  out[2t]   = in[t-1]*w[3] + in[t]*w[1]   (pad top/left by 1)
  out[2t+1] = in[t]*w[2]   + in[t+1]*w[0] (pad bottom/right by 1)

Weight layout follows flax ConvTranspose(transpose_kernel=True):
(kh, kw, C_out, C_in). Parity vs the lax path is tested in
tests/test_conv_transpose_segregated.py; numerics are exact up to fp
reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv_transpose_s2k4p1(x: jax.Array, kernel: jax.Array,
                          bias: jax.Array | None = None) -> jax.Array:
    """Transposed conv, stride 2, 4x4 kernel, padding 1, NHWC.

    x: (B, H, W, Ci); kernel: (4, 4, Co, Ci) [flax transpose layout];
    returns (B, 2H, 2W, Co) == nn.ConvTranspose(..., transpose_kernel=True).
    """
    assert kernel.shape[:2] == (4, 4), kernel.shape
    b, h, w, ci = x.shape
    co = kernel.shape[2]
    # Row taps per output parity: a=0 -> (w3 on t-1, w1 on t);
    #                             a=1 -> (w2 on t, w0 on t+1).
    row_taps = {0: (3, 1), 1: (2, 0)}
    row_pads = {0: (1, 0), 1: (0, 1)}
    dn = lax.conv_dimension_numbers(x.shape, (2, 2, ci, co),
                                    ("NHWC", "HWIO", "NHWC"))
    classes = []
    for a in (0, 1):
        qy0, qy1 = row_taps[a]
        for c in (0, 1):
            qx0, qx1 = row_taps[c]
            # 2x2 sub-kernel: tap order matches input rows (earlier, later).
            sub = jnp.stack(
                [
                    jnp.stack([kernel[qy0, qx0], kernel[qy0, qx1]], axis=0),
                    jnp.stack([kernel[qy1, qx0], kernel[qy1, qx1]], axis=0),
                ],
                axis=0,
            )  # (2, 2, Co, Ci)
            sub = jnp.transpose(sub, (0, 1, 3, 2))  # -> (2, 2, Ci, Co) HWIO
            out = lax.conv_general_dilated(
                x, sub, window_strides=(1, 1),
                padding=(row_pads[a], row_pads[c]),
                dimension_numbers=dn,
            )
            classes.append(out)
    # Interleave: out[2t+a, 2u+c] = classes[2a+c][t, u].
    stacked = jnp.stack(classes, axis=0).reshape(2, 2, b, h, w, co)
    out = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5)).reshape(
        b, 2 * h, 2 * w, co
    )
    if bias is not None:
        out = out + bias
    return out
