"""Parameter initializers with PyTorch-parity distributions.

The reference relies on two init regimes:

1. PyTorch layer defaults — ``nn.Linear``/``nn.Conv2d`` use
   kaiming_uniform(a=sqrt(5)) for weights, which reduces to
   U(-1/sqrt(fan_in), 1/sqrt(fan_in)); biases use the same bound.
2. ``weights_init_normal`` — conv weights ~ N(0, 0.02), BatchNorm scale
   ~ N(1, 0.02) with zero bias (e.g. /root/reference/implementations/
   dcgan/dcgan.py:36-42), applied by 14+ scripts.

These are reimplemented here as flax-style ``init(key, shape, dtype)``
callables. fan_in is passed explicitly by the layer wrappers in
``tpugan.nn.layers`` because PyTorch's fan accounting differs per layer type
(ConvTranspose2d counts the *output*-channel dim as fan_in).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_kaiming_uniform(fan_in: int | None = None):
    """kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    If ``fan_in`` is None it is inferred as prod(shape[:-1]) — correct for
    flax Dense kernels (in, out) and Conv kernels (kh, kw, in, out).
    """

    def init(key, shape, dtype=jnp.float32):
        fi = fan_in if fan_in is not None else int(jnp.prod(jnp.array(shape[:-1])))
        bound = 1.0 / math.sqrt(max(fi, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """PyTorch Linear/Conv bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(mean: float = 0.0, std: float = 0.02):
    """N(mean, std) — the ``weights_init_normal`` conv-weight distribution."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal(fan: int):
    """N(0, sqrt(2/fan)) — kaiming-normal with relu gain. Pass fan_out for
    torchvision-ResNet parity (kaiming_normal_(mode='fan_out')) or fan_in
    for activation-variance-preserving init of forward passes (the "he"
    init_mode of tpugan.nn.layers)."""

    def init(key, shape, dtype=jnp.float32):
        std = math.sqrt(2.0 / max(fan, 1))
        return std * jax.random.normal(key, shape, dtype)

    return init


def ones_normal_init(std: float = 0.02):
    """N(1.0, std) — the ``weights_init_normal`` BatchNorm scale distribution."""

    return normal_init(mean=1.0, std=std)
