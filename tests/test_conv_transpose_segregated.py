"""Kernel-segregated transposed-conv parity (the hot k4/s2/p1 fast path)."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import torch

from tpugan.nn.layers import ConvTranspose
from tpugan.ops.conv_transpose import conv_transpose_s2k4p1


def test_matches_lax_dilated_path():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 9, 7, 5)), jnp.float32)
    mod = fnn.ConvTranspose(
        6, kernel_size=(4, 4), strides=(2, 2),
        padding=[(2, 2), (2, 2)], transpose_kernel=True,
    )
    variables = mod.init(jax.random.PRNGKey(1), x)
    want = mod.apply(variables, x)
    got = conv_transpose_s2k4p1(
        x, variables["params"]["kernel"], variables["params"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matches_torch_conv_transpose2d():
    rng = np.random.default_rng(2)
    # 32x32 engages the segregated fast path (spatial gate >= 1024).
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    layer = ConvTranspose(4, 4, 2, 1)
    params, _ = (
        layer.init(jax.random.PRNGKey(3), x)["params"],
        None,
    )
    got = layer.apply({"params": params}, x)

    t = torch.nn.ConvTranspose2d(3, 4, 4, stride=2, padding=1)
    # flax transpose layout (kh, kw, out, in) -> torch (in, out, kh, kw).
    t.weight.data = torch.from_numpy(
        np.asarray(params["kernel"]).transpose(3, 2, 0, 1).copy()
    )
    t.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())
    with torch.no_grad():
        want = (
            t(torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    assert got.shape == want.shape == (2, 64, 64, 4)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gradients_match_dilated_path():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (4, 4, 3, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (3,)), jnp.float32)
    mod = fnn.ConvTranspose(
        3, kernel_size=(4, 4), strides=(2, 2),
        padding=[(2, 2), (2, 2)], transpose_kernel=True,
    )

    def loss_ref(x, k, b):
        return jnp.sum(
            jnp.sin(mod.apply({"params": {"kernel": k, "bias": b}}, x))
        )

    def loss_seg(x, k, b):
        return jnp.sum(jnp.sin(conv_transpose_s2k4p1(x, k, b)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    g_seg = jax.grad(loss_seg, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(g_ref, g_seg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_non_hot_configs_keep_lax_path():
    # k=3/s=2/p=1 (cluster_gan variants etc.) must still work via flax.
    x = jnp.zeros((1, 5, 5, 2))
    layer = ConvTranspose(3, 3, 2, 1)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(variables, x)
    assert y.shape == (1, 9, 9, 3)  # (5-1)*2 - 2 + 3


def test_param_tree_structure_independent_of_input_size():
    """The fast/slow path gate (>=32x32 spatial) must never change WHERE
    params live: checkpoints and interop templates are built at one
    --img_size and loaded at another."""
    from tpugan.nn.layers import ConvTranspose

    m = ConvTranspose(16, 4, 2, 1)
    small = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
    large = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 8)))

    def paths(tree, pre=()):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out += paths(v, pre + (k,))
            else:
                out.append(pre + (k,))
        return out

    assert paths(dict(small["params"])) == paths(dict(large["params"]))
    # Same init RNG stream too: identical seeds give identical values.
    for a, b in zip(
        jax.tree_util.tree_leaves(small["params"]),
        jax.tree_util.tree_leaves(large["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
