"""Pallas TPU fast paths.

Policy (SURVEY.md §7): XLA-first with lax reference implementations and
parity tests; Pallas kernels where a fused single-VMEM-pass wins. The first
such op is **instance normalization** — the dominant norm of the 256px
CycleGAN benchmark graph (cyclegan/models.py: 2 + 2*9 + 2 IN layers per
generator forward, 6 generator forwards per training step): XLA emits
separate reduce / broadcast-multiply HLOs that each re-read the feature map
from HBM, while the kernel below computes mean, variance and the normalized
output in ONE VMEM residency per (batch, spatial-chunk) block.

Layout: NHWC with C on the 128-lane dimension; the (H*W) axis is blocked to
fit VMEM. The backward pass uses the standard instance-norm VJP
    dx = (g - mean(g) - xhat * mean(g * xhat)) * rsqrt(var + eps)
fused the same way via jax.custom_vjp.

Shape guard: the kernel requires the per-sample feature map to fit the
measured VMEM envelope; callers use :func:`instance_norm` which picks the
Pallas path when eligible (TPU backend + size fits + C % 128 == 0 for full
lane utilization) and the XLA reference otherwise. Parity is tested in
interpret mode on CPU (tests/test_pallas_kernels.py) and was verified on a
real v5e chip 2026-08-18: all three kernels, forward AND backward, match
the XLA reference to <2e-5 at eligible shapes (BASELINE.md "Pallas
on-chip validation").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured per-buffer VMEM ceiling for one (1, HW, C) block (bytes).
# Empirical envelope on TPU v5e (2026-08-18, BASELINE.md): every kernel
# here (fwd + bwd) compiles and runs with 2 MiB blocks (64x64x128 fp32);
# 4 MiB blocks hit the compiler's 16 MiB scoped-vmem stack limit (the
# hardest bwd holds ~6-8 block-sized values: g, x, xhat, gh, products,
# dx). Eligibility therefore caps the per-buffer size at 2 MiB rather
# than guessing a total-budget multiplier.
_VMEM_BLOCK_LIMIT = 2 * 1024 * 1024


def _in_fwd_kernel(x_ref, o_ref, mean_ref, rstd_ref, *, eps: float):
    x = x_ref[0]  # (HW, C)
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    o_ref[0] = (x - mean) * rstd
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _in_bwd_kernel(g_ref, x_ref, mean_ref, rstd_ref, dx_ref):
    g = g_ref[0]
    x = x_ref[0]
    mean = mean_ref[0]
    rstd = rstd_ref[0]
    xhat = (x - mean) * rstd
    g_mean = jnp.mean(g, axis=0, keepdims=True)
    gx_mean = jnp.mean(g * xhat, axis=0, keepdims=True)
    dx_ref[0] = (g - g_mean - xhat * gx_mean) * rstd


def _fwd_call(x3, eps, interpret):
    b, hw, c = x3.shape
    return pl.pallas_call(
        functools.partial(_in_fwd_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        ],
        interpret=interpret,
    )(x3)


def _bwd_call(g3, x3, mean, rstd, interpret):
    b, hw, c = x3.shape
    spec = lambda: pl.BlockSpec(
        (1, hw, c), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    small = lambda: pl.BlockSpec(
        (1, 1, c), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    return pl.pallas_call(
        _in_bwd_kernel,
        grid=(b,),
        in_specs=[spec(), spec(), small(), small()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        interpret=interpret,
    )(g3, x3, mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_pallas(x, eps: float = 1e-5, interpret: bool = False):
    """Fused instance norm on NHWC (no affine): one VMEM pass per sample."""
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    y, _, _ = _fwd_call(x3, eps, interpret)
    return y.reshape(b, h, w, c)


def _in_pallas_fwd(x, eps, interpret):
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    y, mean, rstd = _fwd_call(x3, eps, interpret)
    return y.reshape(b, h, w, c), (x3, mean, rstd)


def _in_pallas_bwd(eps, interpret, res, g):
    x3, mean, rstd = res
    b, hw, c = x3.shape
    g3 = g.reshape(b, hw, c)
    dx = _bwd_call(g3, x3, mean, rstd, interpret)
    return (dx.reshape(g.shape),)


instance_norm_pallas.defvjp(_in_pallas_fwd, _in_pallas_bwd)


def instance_norm_xla(x, eps: float = 1e-5):
    """XLA reference (torch.nn.InstanceNorm2d semantics, affine=False).
    Statistics in float32 regardless of compute dtype (mixed-precision
    safety).

    fp32 inputs: the original two-pass mean/var composition (bit-identical
    to every recorded parity/golden number). Sub-fp32 compute dtypes
    (bf16 mixed precision): the 2026-08-19 device trace of the 256px
    CycleGAN step showed XLA materializing a full f32 copy of every IN
    input (x32 had three consumers: both reductions and the normalize) —
    ~2.5 ms/step of f32 copies plus f32-wide elementwise fusions across
    the 36 trunk IN sites. The bf16 branch therefore computes f32
    statistics via two single-pass fused reductions (convert fuses into
    each reduce; no f32 feature map is ever materialized) and normalizes
    in the compute dtype. E[x^2]-E[x]^2 cancellation in f32 is harmless
    at bf16 input precision, and the per-(B,C) stats are rounded to bf16
    exactly once."""
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def pallas_eligible(x) -> bool:
    """Use the Pallas path only on TPU, fp32, lane-aligned channels, and a
    per-sample block that fits the VMEM budget."""
    if x.ndim != 4 or x.dtype != jnp.float32:
        return False
    b, h, w, c = x.shape
    if c % 128 != 0:
        return False
    if h * w * c * 4 > _VMEM_BLOCK_LIMIT:  # measured per-buffer ceiling
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def instance_norm(x, eps: float = 1e-5):
    """Dispatcher: Pallas fused path when opted in AND eligible, XLA
    reference otherwise.

    Default OFF (``TPUGAN_PALLAS=1`` enables). Status 2026-08-18: the axon
    tunnel now compiles Mosaic kernels (round-1's blanket HTTP 500 is
    gone), and every kernel here was validated fwd+bwd on a real v5e chip
    (<2e-5 vs the XLA reference — BASELINE.md "Pallas on-chip
    validation"). One-pass blocks above the measured 2 MiB per-buffer
    envelope fail the compiler's scoped-vmem stack limit
    (:func:`pallas_eligible` guards it); larger maps — the CycleGAN 256px
    trunk included — route to the HW-tiled two-pass kernel
    (:func:`instance_norm_act_tiled`). The path stays OPT-IN on measured
    evidence: the 256px CycleGAN A/B ran 11.2 vs 15.2 img/s — each
    pallas_call is an opaque custom-call boundary that stops XLA fusing
    the IN chains into the conv schedule, which costs more than the fused
    VMEM pass saves on this workload (BASELINE.md result-of-record).
    """
    import os

    if os.environ.get("TPUGAN_PALLAS", "0") == "1":
        if pallas_eligible(x):
            return instance_norm_pallas(x, eps)
        tile = tiled_tile_for(x)
        if tile is not None:
            return instance_norm_act_tiled(x, tile, eps, 1.0)
    return instance_norm_xla(x, eps)


# ---------------------------------------------------------------------------
# Fused instance-norm + activation.
#
# The generator/discriminator chains of the im2im family are Conv -> IN ->
# (Leaky)ReLU; the profiled 256px CycleGAN step (BASELINE.md) is HBM-bound
# in exactly these elementwise stretches. Fusing the activation into the
# norm kernel removes one full feature-map read+write per layer. ``slope``
# selects the activation: 1.0 = identity, 0.0 = ReLU, 0.2 = LeakyReLU(0.2)
# (leaky-relu with slope s generalizes all three).
# ---------------------------------------------------------------------------


def _in_act_fwd_kernel(x_ref, o_ref, mean_ref, rstd_ref, *, eps, slope):
    x = x_ref[0]  # (HW, C)
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    o_ref[0] = jnp.where(xhat >= 0, xhat, slope * xhat)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _in_act_bwd_kernel(g_ref, x_ref, mean_ref, rstd_ref, dx_ref, *, slope):
    g = g_ref[0]
    x = x_ref[0]
    mean = mean_ref[0]
    rstd = rstd_ref[0]
    xhat = (x - mean) * rstd
    gh = g * jnp.where(xhat >= 0, 1.0, slope)  # through the activation
    gh_mean = jnp.mean(gh, axis=0, keepdims=True)
    ghx_mean = jnp.mean(gh * xhat, axis=0, keepdims=True)
    dx_ref[0] = (gh - gh_mean - xhat * ghx_mean) * rstd


def _in_act_fwd_call(x3, eps, slope, interpret):
    b, hw, c = x3.shape
    big = lambda: pl.BlockSpec(
        (1, hw, c), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    small = lambda: pl.BlockSpec(
        (1, 1, c), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_in_act_fwd_kernel, eps=eps, slope=slope),
        grid=(b,),
        in_specs=[big()],
        out_specs=[big(), small(), small()],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        ],
        interpret=interpret,
    )(x3)


def _in_act_bwd_call(g3, x3, mean, rstd, slope, interpret):
    b, hw, c = x3.shape
    big = lambda: pl.BlockSpec(
        (1, hw, c), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    small = lambda: pl.BlockSpec(
        (1, 1, c), lambda i: (i, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_in_act_bwd_kernel, slope=slope),
        grid=(b,),
        in_specs=[big(), big(), small(), small()],
        out_specs=big(),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        interpret=interpret,
    )(g3, x3, mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_act_pallas(
    x, eps: float = 1e-5, slope: float = 1.0, interpret: bool = False
):
    """Fused IN + leaky-relu(slope) on NHWC; one VMEM pass per sample."""
    b, h, w, c = x.shape
    y, _, _ = _in_act_fwd_call(x.reshape(b, h * w, c), eps, slope, interpret)
    return y.reshape(b, h, w, c)


def _in_act_fwd(x, eps, slope, interpret):
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    y, mean, rstd = _in_act_fwd_call(x3, eps, slope, interpret)
    return y.reshape(b, h, w, c), (x3, mean, rstd)


def _in_act_bwd(eps, slope, interpret, res, g):
    x3, mean, rstd = res
    b, hw, c = x3.shape
    dx = _in_act_bwd_call(g.reshape(b, hw, c), x3, mean, rstd, slope, interpret)
    return (dx.reshape(g.shape),)


instance_norm_act_pallas.defvjp(_in_act_fwd, _in_act_bwd)


def instance_norm_act(x, slope: float, eps: float = 1e-5):
    """Dispatcher for the Conv->IN->(Leaky)ReLU chain tail: fused Pallas
    kernel when opted in + eligible, else the XLA reference composition
    (identical semantics — XLA also fuses these, just with extra HBM
    round-trips at 256px feature-map sizes)."""
    import os

    if os.environ.get("TPUGAN_PALLAS", "0") == "1":
        if pallas_eligible(x):
            return instance_norm_act_pallas(x, eps, slope)
        tile = tiled_tile_for(x)
        if tile is not None:
            return instance_norm_act_tiled(x, tile, eps, slope)
    y = instance_norm_xla(x, eps)
    return jnp.where(y >= 0, y, slope * y)


# ---------------------------------------------------------------------------
# Fused AdaIN (munit/models.py:283-298): instance-normalize, then scale and
# shift by the per-sample style prediction — weight/bias are (B, C).
# ---------------------------------------------------------------------------


def _adain_fwd_kernel(x_ref, w_ref, b_ref, o_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    o_ref[0] = xhat * w_ref[0] + b_ref[0]
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _adain_bwd_kernel(
    g_ref, x_ref, w_ref, mean_ref, rstd_ref, dx_ref, dw_ref, db_ref
):
    g = g_ref[0]
    x = x_ref[0]
    mean = mean_ref[0]
    rstd = rstd_ref[0]
    xhat = (x - mean) * rstd
    dw_ref[0] = jnp.sum(g * xhat, axis=0, keepdims=True)
    db_ref[0] = jnp.sum(g, axis=0, keepdims=True)
    gh = g * w_ref[0]  # through the affine
    gh_mean = jnp.mean(gh, axis=0, keepdims=True)
    ghx_mean = jnp.mean(gh * xhat, axis=0, keepdims=True)
    dx_ref[0] = (gh - gh_mean - xhat * ghx_mean) * rstd


def _adain_specs(b, hw, c, interpret):
    space = pl.ANY if interpret else pltpu.VMEM
    big = lambda: pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=space)
    small = lambda: pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=space)
    return big, small


def _adain_fwd_call(x3, w3, b3, eps, interpret):
    b, hw, c = x3.shape
    big, small = _adain_specs(b, hw, c, interpret)
    return pl.pallas_call(
        functools.partial(_adain_fwd_kernel, eps=eps),
        grid=(b,),
        in_specs=[big(), small(), small()],
        out_specs=[big(), small(), small()],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        ],
        interpret=interpret,
    )(x3, w3, b3)


def _adain_bwd_call(g3, x3, w3, mean, rstd, interpret):
    b, hw, c = x3.shape
    big, small = _adain_specs(b, hw, c, interpret)
    return pl.pallas_call(
        _adain_bwd_kernel,
        grid=(b,),
        in_specs=[big(), big(), small(), small(), small()],
        out_specs=[big(), small(), small()],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), x3.dtype),
        ],
        interpret=interpret,
    )(g3, x3, w3, mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def adain_pallas(x, weight, bias, eps: float = 1e-5, interpret: bool = False):
    """Fused AdaIN on NHWC; weight/bias (B, C)."""
    b, h, w, c = x.shape
    y, _, _ = _adain_fwd_call(
        x.reshape(b, h * w, c),
        weight.reshape(b, 1, c), bias.reshape(b, 1, c), eps, interpret,
    )
    return y.reshape(b, h, w, c)


def _adain_fwd(x, weight, bias, eps, interpret):
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    w3 = weight.reshape(b, 1, c)
    y, mean, rstd = _adain_fwd_call(x3, w3, bias.reshape(b, 1, c), eps, interpret)
    return y.reshape(b, h, w, c), (x3, w3, mean, rstd)


def _adain_bwd(eps, interpret, res, g):
    x3, w3, mean, rstd = res
    b, hw, c = x3.shape
    dx, dw, db = _adain_bwd_call(
        g.reshape(b, hw, c), x3, w3, mean, rstd, interpret
    )
    return (dx.reshape(g.shape), dw.reshape(b, c), db.reshape(b, c))


adain_pallas.defvjp(_adain_fwd, _adain_bwd)


# ---------------------------------------------------------------------------
# HW-tiled two-pass instance norm (+ activation).
#
# Feature maps above the single-pass envelope (_VMEM_BLOCK_LIMIT — notably
# the CycleGAN 256px residual trunk at 64x64x256 = 4 MiB/sample,
# cyclegan/models.py ResidualBlock) cannot hold a whole sample in VMEM, so
# statistics and normalization are split into two grid passes over HW
# tiles: pass 1 accumulates per-channel sum / sum-of-squares across tiles
# (grid revisiting: the (1,1,C) accumulator block stays resident across
# the inner grid axis), a cheap XLA epilogue turns them into mean/rstd,
# and pass 2 normalizes (+ activation) tile by tile. The backward uses the
# same structure for the two instance-norm VJP reductions. Variance uses
# SHIFTED moments (sums of x - K with K = the sample's first row) — the
# plain E[x^2] - mean^2 form lost ~|mean|/std digits to cancellation
# (measured 4e-3 fwd / 1e-2 grad error at mean = 100*std); the shifted
# form matches the centered XLA reference to float rounding at any offset
# (pinned in tests/test_pallas_kernels.py).
# ---------------------------------------------------------------------------

_TILE_TARGET = 1024 * 1024  # bytes per (1, T, C) tile buffer


def _tile_hw(hw: int, c: int):
    """Largest divisor T of hw whose (T, C) fp32 tile fits _TILE_TARGET;
    None when no useful tiling exists (tiny budget or near-prime hw)."""
    max_t = _TILE_TARGET // (c * 4)
    if max_t < 8:
        return None
    for t in range(min(hw, max_t), 7, -1):
        if hw % t == 0:
            return t
    return None


def _tiled_specs(t, c, interpret):
    space = pl.ANY if interpret else pltpu.VMEM
    tile = lambda: pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                                memory_space=space)
    small = lambda: pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                 memory_space=space)
    return tile, small


def _tiled_stats_kernel(x_ref, s_ref, q_ref, k_ref):
    """Shifted accumulation: sums of (x - K) and (x - K)^2 with K = the
    sample's first row per channel. A plain E[x^2] - mean^2 pass loses
    ~|mean|/std digits to cancellation (measured 4e-3 fwd error at
    mean = 100*std — exactly the post-ReLU / offset regime over-envelope
    maps can hit); shifting by any value near the data makes the epilogue's
    q/hw - (s/hw)^2 an O(var) - O(var) difference instead of O(mean^2) -
    O(mean^2). K lives in a small output block that stays resident across
    the inner grid axis (same revisiting contract as the accumulators)."""
    j = pl.program_id(1)
    x = x_ref[0]  # (T, C)

    @pl.when(j == 0)
    def _init():
        k = x[0:1]
        xs = x - k
        s_ref[0] = jnp.sum(xs, axis=0, keepdims=True)
        q_ref[0] = jnp.sum(xs * xs, axis=0, keepdims=True)
        k_ref[0] = k

    @pl.when(j > 0)
    def _accumulate():
        xs = x - k_ref[0]
        s_ref[0] += jnp.sum(xs, axis=0, keepdims=True)
        q_ref[0] += jnp.sum(xs * xs, axis=0, keepdims=True)


def _tiled_norm_act_kernel(x_ref, mean_ref, rstd_ref, o_ref, *, slope):
    xhat = (x_ref[0] - mean_ref[0]) * rstd_ref[0]
    o_ref[0] = jnp.where(xhat >= 0, xhat, slope * xhat)


def _tiled_bwd_stats_kernel(g_ref, x_ref, mean_ref, rstd_ref,
                            hs_ref, hx_ref, *, slope):
    j = pl.program_id(1)
    xhat = (x_ref[0] - mean_ref[0]) * rstd_ref[0]
    gh = g_ref[0] * jnp.where(xhat >= 0, 1.0, slope)
    s = jnp.sum(gh, axis=0, keepdims=True)
    t = jnp.sum(gh * xhat, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init():
        hs_ref[0] = s
        hx_ref[0] = t

    @pl.when(j > 0)
    def _accumulate():
        hs_ref[0] += s
        hx_ref[0] += t


def _tiled_bwd_kernel(g_ref, x_ref, mean_ref, rstd_ref, ghm_ref, ghxm_ref,
                      dx_ref, *, slope):
    rstd = rstd_ref[0]
    xhat = (x_ref[0] - mean_ref[0]) * rstd
    gh = g_ref[0] * jnp.where(xhat >= 0, 1.0, slope)
    dx_ref[0] = (gh - ghm_ref[0] - xhat * ghxm_ref[0]) * rstd


def _tiled_fwd_call(x3, t, eps, slope, interpret):
    b, hw, c = x3.shape
    n = hw // t
    tile, small = _tiled_specs(t, c, interpret)
    s, q, k = pl.pallas_call(
        _tiled_stats_kernel,
        grid=(b, n),
        in_specs=[tile()],
        out_specs=[small(), small(), small()],
        out_shape=[jax.ShapeDtypeStruct((b, 1, c), x3.dtype)] * 3,
        interpret=interpret,
    )(x3)
    # Shifted moments (see _tiled_stats_kernel): mean = K + E[x - K],
    # var = E[(x-K)^2] - E[x-K]^2 — both differences are O(var), so no
    # catastrophic cancellation; the max(., 0) only guards float rounding.
    ms = s / hw
    mean = k + ms
    var = jnp.maximum(q / hw - ms * ms, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = pl.pallas_call(
        functools.partial(_tiled_norm_act_kernel, slope=slope),
        grid=(b, n),
        in_specs=[tile(), small(), small()],
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        interpret=interpret,
    )(x3, mean, rstd)
    return y, mean, rstd


def _tiled_bwd_call(g3, x3, mean, rstd, t, slope, interpret):
    b, hw, c = x3.shape
    n = hw // t
    tile, small = _tiled_specs(t, c, interpret)
    hs, hx = pl.pallas_call(
        functools.partial(_tiled_bwd_stats_kernel, slope=slope),
        grid=(b, n),
        in_specs=[tile(), tile(), small(), small()],
        out_specs=[small(), small()],
        out_shape=[jax.ShapeDtypeStruct((b, 1, c), x3.dtype)] * 2,
        interpret=interpret,
    )(g3, x3, mean, rstd)
    return pl.pallas_call(
        functools.partial(_tiled_bwd_kernel, slope=slope),
        grid=(b, n),
        in_specs=[tile(), tile(), small(), small(), small(), small()],
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
        interpret=interpret,
    )(g3, x3, mean, rstd, hs / hw, hx / hw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def instance_norm_act_tiled(x, tile: int, eps: float = 1e-5,
                            slope: float = 1.0, interpret: bool = False):
    """Two-pass tiled IN + leaky-relu(slope) for over-envelope maps."""
    b, h, w, c = x.shape
    y, _, _ = _tiled_fwd_call(x.reshape(b, h * w, c), tile, eps, slope,
                              interpret)
    return y.reshape(b, h, w, c)


def _in_tiled_fwd(x, tile, eps, slope, interpret):
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    y, mean, rstd = _tiled_fwd_call(x3, tile, eps, slope, interpret)
    return y.reshape(b, h, w, c), (x3, mean, rstd)


def _in_tiled_bwd(tile, eps, slope, interpret, res, g):
    x3, mean, rstd = res
    b, hw, c = x3.shape
    dx = _tiled_bwd_call(g.reshape(b, hw, c), x3, mean, rstd, tile, slope,
                         interpret)
    return (dx.reshape(g.shape),)


instance_norm_act_tiled.defvjp(_in_tiled_fwd, _in_tiled_bwd)


def tiled_tile_for(x):
    """HW tile for the two-pass path, or None when the one-pass kernel
    already fits / the shape or backend is ineligible."""
    if x.ndim != 4 or x.dtype != jnp.float32:
        return None
    b, h, w, c = x.shape
    if c % 128 != 0:
        return None
    if h * w * c * 4 <= _VMEM_BLOCK_LIMIT:
        return None  # the single-pass kernel handles it
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:  # pragma: no cover
        return None
    return _tile_hw(h * w, c)
