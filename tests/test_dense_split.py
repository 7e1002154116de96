"""Channel-split lowering of convs over concatenated inputs
(nn/layers.py:_SplitConv; esrgan/models.py:18-45 dense blocks).

conv(concat(parts), W) == sum_j conv(part_j, W[:, :, off_j:, :]) exactly in
math; accumulation grouping differs, so the pinned bar is ~1e-6 relative in
fp32 (same bar as the packed-conv lowering), with an identical param tree so
checkpoints/transplants never see which path ran.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tree_close(a, b, rtol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=1e-5
        )


def test_dense_block_split_param_tree_and_parity(monkeypatch):
    from tpugan.nn.sr import DenseResidualBlock

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8, 16)), jnp.float32
    )
    blk = DenseResidualBlock(filters=16)

    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "0")
    v0 = blk.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "1")
    v1 = blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(
        jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)
    ):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert jnp.array_equal(a, b)

    def loss(variables, mode):
        monkeypatch.setenv("TPUGAN_DENSE_SPLIT", mode)
        y = blk.apply(variables, x)
        return jnp.sum(y * y), y

    (l0, y0), g0 = jax.value_and_grad(loss, has_aux=True)(v0, "0")
    (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(v0, "1")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    _tree_close(g0, g1, rtol=5e-4)


def test_esrgan_generator_split_parity(monkeypatch):
    from tpugan.nn.sr import ESRGANGenerator

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 8, 8, 3)), jnp.float32
    )
    g = ESRGANGenerator(channels=3, filters=16, num_res_blocks=1)
    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "0")
    v = g.init(jax.random.PRNGKey(0), x)
    y0 = g.apply(v, x)
    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "1")
    v1 = g.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    y1 = g.apply(v, x)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-5, atol=1e-5)


def test_single_element_list_unwraps(monkeypatch):
    from tpugan.nn.layers import Conv

    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "1")
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 6, 6, 4)), jnp.float32
    )
    c = Conv(8, 3, 1, 1)
    v = c.init(jax.random.PRNGKey(0), [x])
    ya = c.apply(v, [x])
    yb = c.apply(v, x)
    assert jnp.array_equal(ya, yb)


def test_split_respects_bias_and_bf16(monkeypatch):
    from tpugan.nn.layers import Conv

    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "1")
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(2, 6, 6, 5)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 6, 6, 7)), jnp.float32)
    c = Conv(8, 3, 1, 1, dtype=jnp.bfloat16)
    v = c.init(jax.random.PRNGKey(0), [a, b])
    y_split = c.apply(v, [a, b])
    assert y_split.dtype == jnp.bfloat16
    monkeypatch.setenv("TPUGAN_DENSE_SPLIT", "0")
    y_cat = c.apply(v, [a, b])
    np.testing.assert_allclose(
        np.asarray(y_split, np.float32),
        np.asarray(y_cat, np.float32),
        rtol=0.1,
        atol=0.1,
    )
