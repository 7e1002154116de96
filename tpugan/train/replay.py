"""On-device replay buffer (CycleGAN's fake-image history).

Reference: /root/reference/implementations/cyclegan/utils.py:13-33 —
``ReplayBuffer(max_size=50).push_and_pop(batch)``: per batch ELEMENT,
sequentially: while the buffer isn't full, store the element and return it;
once full, with probability 0.5 swap it with a uniformly random stored
element (returning the old one), else return it unchanged.

Here the buffer is a fixed-size device tensor + count carried in
``TrainState.aux``; the per-element sequential semantics are reproduced with
``lax.scan`` over the batch (the reference's fill-then-maybe-swap order is
preserved within a batch). RNG: draws come from the step PRNG key instead of
Python ``random`` — same distribution, different stream (documented
deviation, SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def replay_init(max_size: int, item_shape: Tuple[int, ...]) -> dict:
    return {
        "data": jnp.zeros((max_size,) + tuple(item_shape), jnp.float32),
        "count": jnp.zeros((), jnp.int32),
    }


def replay_push_and_pop(buf: dict, batch: jax.Array, rng: jax.Array):
    """Returns (new_buf, out_batch) with utils.py:19-33 semantics."""
    batch = batch.astype(buf["data"].dtype)  # buffer stays float32
    max_size = buf["data"].shape[0]

    def one(carry, inp):
        data, count = carry
        element, key = inp
        k_coin, k_idx = jax.random.split(key)

        def push(_):
            new_data = jax.lax.dynamic_update_index_in_dim(
                data, element, jnp.minimum(count, max_size - 1), 0
            )
            return new_data, count + 1, element

        def maybe_swap(_):
            coin = jax.random.uniform(k_coin) > 0.5
            idx = jax.random.randint(k_idx, (), 0, max_size)

            def swap(_):
                old = data[idx]
                new_data = jax.lax.dynamic_update_index_in_dim(
                    data, element, idx, 0
                )
                return new_data, count, old

            return jax.lax.cond(coin, swap, lambda _: (data, count, element), None)

        new_data, new_count, out = jax.lax.cond(
            count < max_size, push, maybe_swap, None
        )
        return (new_data, new_count), out

    keys = jax.random.split(rng, batch.shape[0])
    (data, count), outs = jax.lax.scan(
        one, (buf["data"], buf["count"]), (batch, keys)
    )
    return {"data": data, "count": count}, outs
