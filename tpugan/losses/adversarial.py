"""Pure loss functions with torch.nn loss-parity semantics.

Every function maps jnp arrays -> scalar, mean-reduced over all elements
(torch default reduction). Targets may be scalars (broadcast) — the reference
always compares against constant `valid`/`fake` tensors
(/root/reference/implementations/gan/gan.py:125-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce(probs: jax.Array, target) -> jax.Array:
    """torch.nn.BCELoss parity: log terms clamped at -100 (torch clamps to
    keep BCE finite at p∈{0,1})."""
    probs = probs.astype(jnp.float32)  # losses always accumulate in f32
    target = jnp.broadcast_to(jnp.asarray(target, probs.dtype), probs.shape)
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def bce_with_logits(logits: jax.Array, target) -> jax.Array:
    """torch.nn.BCEWithLogitsLoss parity (numerically stable)."""
    logits = logits.astype(jnp.float32)
    target = jnp.broadcast_to(jnp.asarray(target, logits.dtype), logits.shape)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse(pred: jax.Array, target) -> jax.Array:
    """torch.nn.MSELoss — the LSGAN-family adversarial loss."""
    pred = pred.astype(jnp.float32)
    target = jnp.broadcast_to(jnp.asarray(target, pred.dtype), pred.shape)
    return jnp.mean((pred - target) ** 2)


def l1(pred: jax.Array, target) -> jax.Array:
    """torch.nn.L1Loss."""
    pred = pred.astype(jnp.float32)
    target = jnp.broadcast_to(jnp.asarray(target, pred.dtype), pred.shape)
    return jnp.mean(jnp.abs(pred - target))


def cross_entropy_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch.nn.CrossEntropyLoss(logits, int labels), mean-reduced."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def cross_entropy_on_softmax(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Reproduces the reference's double-softmax quirk: several scripts feed
    Softmax outputs into CrossEntropyLoss (acgan/acgan.py:100,113,
    sgan/sgan.py:99,112, infogan/infogan.py:111,126) — i.e. CE treats the
    probabilities as logits. Parity requires doing the same."""
    return cross_entropy_logits(probs, labels)


def nll_from_log_probs(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """torch.nn.NLLLoss on log-probabilities."""
    picked = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def boundary_seeking(d_out: jax.Array) -> jax.Array:
    """BGAN generator loss 0.5*mean((log D - log(1-D))^2)
    (bgan/bgan.py:85-90)."""
    return 0.5 * jnp.mean((jnp.log(d_out) - jnp.log(1.0 - d_out)) ** 2)


def pullaway(embeddings: jax.Array) -> jax.Array:
    """EBGAN pull-away term as the reference computes it
    (ebgan/ebgan.py:140-146): (sum of pairwise cosine similarity - N) /
    (N(N-1)). NOTE: the EBGAN paper squares the similarity; the reference
    does not — parity keeps the reference's form."""
    e = embeddings.reshape(embeddings.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(e * e, axis=1, keepdims=True))
    ne = e / norm
    sim = ne @ ne.T
    n = e.shape[0]
    return (jnp.sum(sim) - n) / (n * (n - 1))


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, exp(logvar)) || N(0,1)), summed (bicyclegan convention,
    bicyclegan/bicyclegan.py:184)."""
    return 0.5 * jnp.sum(jnp.exp(logvar) + mu**2 - logvar - 1.0)
