"""Pallas kernel parity tests (interpret mode — runs on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpugan.ops.pallas_kernels import (
    instance_norm_pallas,
    instance_norm_xla,
    pallas_eligible,
)


def _x(b=2, h=8, w=8, c=128, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(1.5, 2.0, (b, h, w, c)),
        jnp.float32,
    )


def test_forward_parity_with_xla():
    x = _x()
    got = instance_norm_pallas(x, 1e-5, True)  # interpret mode
    want = instance_norm_xla(x, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradient_parity_with_xla():
    x = _x(seed=1)

    def loss_pallas(x):
        return jnp.sum(jnp.sin(instance_norm_pallas(x, 1e-5, True)))

    def loss_xla(x):
        return jnp.sum(jnp.sin(instance_norm_xla(x, 1e-5)))

    g1 = jax.grad(loss_pallas)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_eps_flows_through():
    x = _x(seed=2)
    a = instance_norm_pallas(x, 0.8, True)
    b = instance_norm_xla(x, 0.8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # Different eps -> different output.
    c = instance_norm_xla(x, 1e-5)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_eligibility_rules():
    assert not pallas_eligible(jnp.zeros((2, 8, 8, 3)))  # C not lane-aligned
    assert not pallas_eligible(jnp.zeros((2, 8, 8, 128), jnp.bfloat16))
    big = jnp.zeros((1, 256, 256, 256))  # 64 MB block > budget
    assert not pallas_eligible(big)
    # On CPU the backend gate keeps the XLA path even for eligible shapes.
    x = jnp.zeros((2, 8, 8, 128))
    assert pallas_eligible(x) == (jax.default_backend() == "tpu")
