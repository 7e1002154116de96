"""Fused WGAN-GP penalty for the template-A MLP critic (Pallas north star).

The reference's hardest autodiff pattern is the gradient penalty's
double-backward (wgan_gp/wgan_gp.py:119-138). For the MLP critic
(wgan/wgan.py:65-80: flat img -> 512 -> 256 -> 1, LeakyReLU(0.2), no
sigmoid) both derivative orders have a CLOSED FORM: with
z1 = xW1 + b1, m1 = lrelu'(z1), z2 = lrelu(z1)W2 + b2, m2 = lrelu'(z2),

    dD/dx   = ((w3 * m2) W2^T * m1) W1^T                    per sample
    penalty = mean((||dD/dx|| - 1)^2)

and, because the mask derivatives are zero a.e. (exactly what torch/JAX
autodiff compute for the piecewise-linear activation), the penalty's
parameter gradients are plain matmul chains over the same residuals — no
forward-over-reverse transform needed:

    q   = (2/B) (n-1)/n * g            (0 where n == 0 — torch norm subgrad)
    dW1 = q^T t,   t = (u W2^T) * m1,  u = m2 * w3
    dW2 = s^T u,   s = (q W1) * m1
    dw3 = sum_b m2 * (s W2);           db1 = db2 = db3 = 0

Three implementations ship so the north-star question gets a MEASURED
answer (scripts/bench_gp_pallas.py):

- :func:`mlp_gp_xla` — the closed form as plain XLA ops (same math,
  compiler-scheduled);
- :func:`mlp_gp_pallas` — custom-VJP pair of single-block Pallas kernels:
  the whole critic (weights + activations + both derivative chains) lives
  in VMEM, zero HBM intermediates (~3 MB fwd / ~6 MB bwd, every buffer
  under the measured 2 MiB per-block envelope after padding N0 to the
  128-lane boundary);
- the production default: ops/penalty.py:wgan_gp_penalty via jax.grad
  composition (generic, any critic).

Equality of all three (value AND parameter gradients) is pinned in
tests/test_pallas_critic.py. Production wiring is opt-in
(``TPUGAN_PALLAS_GP=1``) through :func:`fused_gp_or_none` in
models/wgan_gp.py; the dispatcher refuses any critic whose parameter tree
is not exactly the template-A stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLOPE = 0.2  # LeakyReLU slope (wgan/wgan.py:70)

_LANE = 128
_SUBLANE = 8


def extract_mlp_critic(d_params):
    """(w1, b1, w2, b2, w3) when ``d_params`` is exactly the template-A
    critic tree (nn/blocks.py:MLPDiscriminator — Linear_i/Dense_0), else
    None. b3 is excluded on purpose: the penalty is independent of it."""
    try:
        layers = [d_params[f"Linear_{i}"]["Dense_0"] for i in range(3)]
    except (KeyError, TypeError):
        return None
    if set(d_params) != {"Linear_0", "Linear_1", "Linear_2"}:
        return None
    w1, b1 = layers[0]["kernel"], layers[0]["bias"]
    w2, b2 = layers[1]["kernel"], layers[1]["bias"]
    w3 = layers[2]["kernel"]
    if w1.ndim != 2 or w2.ndim != 2 or w3.ndim != 2 or w3.shape[1] != 1:
        return None
    return w1, b1, w2, b2, w3


def _norm_penalty(g):
    """mean((||g|| - 1)^2) with the torch norm-at-0 subgradient (matches
    ops/penalty.py:_safe_sqrt)."""
    sq = jnp.sum(g * g, axis=1)
    safe = jnp.where(sq > 0, sq, 1.0)
    n = jnp.where(sq > 0, jnp.sqrt(safe), 0.0)
    return jnp.mean((n - 1.0) ** 2), n


def _q_from(g, n, ct):
    """dP/dg scaled by the upstream cotangent: (2/B)(n-1)/n * g, 0 at n=0."""
    b = g.shape[0]
    coef = jnp.where(n > 0, (n - 1.0) / jnp.where(n > 0, n, 1.0), 0.0)
    return (ct * 2.0 / b) * coef[:, None] * g


# ---------------------------------------------------------------------------
# Closed form in plain XLA (variant b).
# ---------------------------------------------------------------------------


def _forward_chain(x, w1, b1, w2, b2, w3row):
    z1 = x @ w1 + b1
    m1 = jnp.where(z1 >= 0, 1.0, SLOPE)
    z2 = (z1 * m1) @ w2 + b2
    m2 = jnp.where(z2 >= 0, 1.0, SLOPE)
    u = m2 * w3row
    t = jax.lax.dot_general(u, w2, (((1,), (1,)), ((), ()))) * m1
    g = jax.lax.dot_general(t, w1, (((1,), (1,)), ((), ())))
    return g, m1, m2, t


def _param_grads(q, m1, m2, w1, w2, w3row):
    u = m2 * w3row
    t = jax.lax.dot_general(u, w2, (((1,), (1,)), ((), ()))) * m1
    dw1 = jax.lax.dot_general(q, t, (((0,), (0,)), ((), ())))
    s = jax.lax.dot_general(q, w1, (((1,), (0,)), ((), ()))) * m1
    dw2 = jax.lax.dot_general(s, u, (((0,), (0,)), ((), ())))
    dw3row = jnp.sum(m2 * (s @ w2), axis=0, keepdims=True)
    return dw1, dw2, dw3row


@jax.custom_vjp
def mlp_gp_xla(x, w1, b1, w2, b2, w3):
    """Closed-form penalty, XLA-scheduled. x = flattened interpolates."""
    g, _, _, _ = _forward_chain(x, w1, b1, w2, b2, w3.reshape(1, -1))
    return _norm_penalty(g)[0]


def _xla_fwd(x, w1, b1, w2, b2, w3):
    g, m1, m2, _ = _forward_chain(x, w1, b1, w2, b2, w3.reshape(1, -1))
    p, n = _norm_penalty(g)
    return p, (x, g, n, m1, m2, w1, w2, w3)


def _xla_bwd(res, ct):
    x, g, n, m1, m2, w1, w2, w3 = res
    q = _q_from(g, n, ct)
    dw1, dw2, dw3row = _param_grads(q, m1, m2, w1, w2, w3.reshape(1, -1))
    return (jnp.zeros_like(x), dw1, jnp.zeros_like(w1[0]), dw2,
            jnp.zeros_like(w2[0]), dw3row.reshape(w3.shape))


mlp_gp_xla.defvjp(_xla_fwd, _xla_bwd)


# ---------------------------------------------------------------------------
# Pallas kernels (variant c): one block, everything resident in VMEM.
# ---------------------------------------------------------------------------


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _gp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                   g_ref, m1_ref, m2_ref):
    x, w1, w2 = x_ref[...], w1_ref[...], w2_ref[...]
    z1 = _dot(x, w1, ((1,), (0,))) + b1_ref[...]
    m1 = jnp.where(z1 >= 0, 1.0, SLOPE)
    z2 = _dot(z1 * m1, w2, ((1,), (0,))) + b2_ref[...]
    m2 = jnp.where(z2 >= 0, 1.0, SLOPE)
    u = m2 * w3_ref[...]
    t = _dot(u, w2, ((1,), (1,))) * m1
    g_ref[...] = _dot(t, w1, ((1,), (1,)))
    m1_ref[...] = m1
    m2_ref[...] = m2


def _gp_bwd_kernel(q_ref, m1_ref, m2_ref, w1_ref, w2_ref, w3_ref,
                   dw1_ref, dw2_ref, dw3_ref):
    q, m1, m2 = q_ref[...], m1_ref[...], m2_ref[...]
    w1, w2 = w1_ref[...], w2_ref[...]
    u = m2 * w3_ref[...]
    t = _dot(u, w2, ((1,), (1,))) * m1
    dw1_ref[...] = _dot(q, t, ((0,), (0,)))
    s = _dot(q, w1, ((1,), (0,))) * m1
    dw2_ref[...] = _dot(s, u, ((0,), (0,)))
    dw3_ref[...] = jnp.sum(m2 * _dot(s, w2, ((1,), (0,))), axis=0,
                           keepdims=True)


def _specs(shapes, interpret):
    space = pl.ANY if interpret else pltpu.VMEM
    return [pl.BlockSpec(s, memory_space=space) for s in shapes]


def _pad_lane(v, axis):
    pad = (-v.shape[axis]) % _LANE
    if pad == 0:
        return v
    widths = [(0, 0)] * v.ndim
    widths[axis] = (0, pad)
    return jnp.pad(v, widths)


def pallas_gp_supported(b, n0, n1, n2):
    """Single-block envelope: sublane-aligned batch, lane-aligned hidden
    widths, and the biggest buffer (padded W1) under the measured 2 MiB
    per-block ceiling (BASELINE.md Pallas on-chip validation)."""
    n0p = n0 + ((-n0) % _LANE)
    return (b % _SUBLANE == 0 and n1 % _LANE == 0 and n2 % _LANE == 0
            and n0p * max(n1, b) * 4 <= 2 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def mlp_gp_pallas(x, w1, b1, w2, b2, w3, interpret=False):
    """Fused-VMEM penalty; numerically the closed form above."""
    p, _ = _pallas_fwd_impl(x, w1, b1, w2, b2, w3, interpret)
    return p


def _pallas_fwd_impl(x, w1, b1, w2, b2, w3, interpret):
    bsz, n0 = x.shape
    n1, n2 = w2.shape
    xp, w1p = _pad_lane(x, 1), _pad_lane(w1, 0)
    n0p = xp.shape[1]
    ins = _specs([(bsz, n0p), (n0p, n1), (1, n1), (n1, n2), (1, n2),
                  (1, n2)], interpret)
    outs = _specs([(bsz, n0p), (bsz, n1), (bsz, n2)], interpret)
    g, m1, m2 = pl.pallas_call(
        _gp_fwd_kernel,
        in_specs=ins,
        out_specs=outs,
        out_shape=[jax.ShapeDtypeStruct((bsz, n0p), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, n1), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, n2), jnp.float32)],
        interpret=interpret,
    )(xp, w1p, b1.reshape(1, -1), w2, b2.reshape(1, -1), w3.reshape(1, -1))
    p, n = _norm_penalty(g)
    return p, (g, n, m1, m2, w1p, w2, w3, x.shape, b1, b2)


def _pallas_fwd(x, w1, b1, w2, b2, w3, interpret):
    return _pallas_fwd_impl(x, w1, b1, w2, b2, w3, interpret)


def _pallas_bwd(interpret, res, ct):
    g, n, m1, m2, w1p, w2, w3, x_shape, b1, b2 = res
    bsz, n0p = g.shape
    n1, n2 = w2.shape
    q = _q_from(g, n, ct)
    ins = _specs([(bsz, n0p), (bsz, n1), (bsz, n2), (n0p, n1), (n1, n2),
                  (1, n2)], interpret)
    outs = _specs([(n0p, n1), (n1, n2), (1, n2)], interpret)
    dw1p, dw2, dw3row = pl.pallas_call(
        _gp_bwd_kernel,
        in_specs=ins,
        out_specs=outs,
        out_shape=[jax.ShapeDtypeStruct((n0p, n1), jnp.float32),
                   jax.ShapeDtypeStruct((n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((1, n2), jnp.float32)],
        interpret=interpret,
    )(q, m1, m2, w1p, w2, w3.reshape(1, -1))
    n0 = x_shape[1]
    return (jnp.zeros(x_shape, jnp.float32), dw1p[:n0], jnp.zeros_like(b1),
            dw2, jnp.zeros_like(b2), dw3row.reshape(w3.shape))


mlp_gp_pallas.defvjp(_pallas_fwd, _pallas_bwd)
