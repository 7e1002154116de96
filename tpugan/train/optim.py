"""Optimizers with torch.optim parity.

- adam_torch: torch.optim.Adam semantics (bias-corrected moments,
  eps outside the sqrt, L2 weight_decay folded into the gradient *before*
  the moments — the clustergan config, clustergan.py:380-384).
- rmsprop_torch: torch.optim.RMSprop semantics — v = a*v + (1-a)*g^2,
  update g/(sqrt(v)+eps) with eps OUTSIDE the sqrt (optax's default RMS
  places eps inside; wgan/wgan.py:105-106 depends on torch's form).
- linear_decay_schedule: the shared LambdaLR rule
  (cyclegan/utils.py:36-44): factor = 1 - max(0, epoch + offset -
  decay_start) / (n_epochs - decay_start), stepped per epoch.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp
import optax


def adam_torch(
    lr: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def rmsprop_torch(
    lr: Union[float, Callable],
    alpha: float = 0.99,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def init(params):
        return {"v": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        v = jax.tree_util.tree_map(
            lambda vi, g: alpha * vi + (1 - alpha) * g * g, state["v"], grads
        )
        updates = jax.tree_util.tree_map(
            lambda g, vi: g / (jnp.sqrt(vi) + eps), grads, v
        )
        return updates, {"v": v}

    return optax.chain(
        optax.GradientTransformation(init, update),
        optax.scale_by_learning_rate(lr),
    )


def linear_decay_schedule(
    base_lr: float,
    n_epochs: int,
    decay_start_epoch: int,
    steps_per_epoch: int,
    offset: int = 0,
) -> Callable[[jax.Array], jax.Array]:
    """LambdaLR(step -> lr) evaluated per optimizer step but changing only at
    epoch boundaries, matching scheduler.step() per epoch.

    Floors at lr=0 once the decay window is exhausted. The reference's
    lambda (cyclegan/utils.py:36-44) goes NEGATIVE past epoch ``n_epochs``
    — a negative lr turns every update into gradient ASCENT and the run
    explodes deterministically (measured: a miswired steps_per_epoch=1
    crossed zero at step 200 and sent the cyclegan64 FID leg to d_loss
    ~8e4 at the same step on every seed). No reference run ever trains
    past n_epochs, so the floor is exactly LambdaLR on every step the
    reference can take; past the end it is a safety divergence-by-design
    (pinned in tests/test_im2im_core.py)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        frac = jnp.maximum(0, epoch + offset - decay_start_epoch) / (
            n_epochs - decay_start_epoch
        )
        return base_lr * jnp.maximum(0.0, 1.0 - frac)

    return schedule


def clip_params(params, clip_value: float):
    """WGAN weight clipping (wgan/wgan.py:139-141): clamp every parameter to
    [-clip_value, clip_value] after the optimizer step."""
    return jax.tree_util.tree_map(
        lambda p: jnp.clip(p, -clip_value, clip_value), params
    )
