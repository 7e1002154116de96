"""Functional training state.

One pytree carries everything the reference keeps in Python objects scattered
through a script (modules, two+ optimizers, the epoch counter, implicit
global RNG, BEGAN's k, CycleGAN's replay buffer): params/opt_state are dicts
keyed by module role ("generator", "discriminator", ...) so multi-module
recipes (munit checkpoints 6 modules, munit/munit.py:283-288) stay uniform.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array  # int32 scalar
    params: Any  # dict[str, params pytree]
    model_state: Any  # dict[str, batch_stats] (possibly empty dicts)
    opt_state: Any  # dict[str, optax state]
    rng: jax.Array  # PRNG key
    aux: Any = None  # model-specific loop-carried state

    @classmethod
    def create(cls, params, opt_state, rng, model_state=None, aux=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state if model_state is not None else {},
            opt_state=opt_state,
            rng=rng,
            aux=aux,
        )


def normalize_uint8(x: jax.Array, mean: float = 0.5, std: float = 0.5) -> jax.Array:
    """On-device (x/255 - mean)/std — the transforms.Normalize((0.5), (0.5))
    step of nearly every reference script, moved past the H2D copy so input
    ships as uint8."""
    return (x.astype(jnp.float32) / 255.0 - mean) / std
