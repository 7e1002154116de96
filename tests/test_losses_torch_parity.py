"""Loss + gradient-penalty parity against torch (values AND parameter grads).

The WGAN-GP test reproduces compute_gradient_penalty
(/root/reference/implementations/wgan_gp/wgan_gp.py:119-138) in torch with a
tiny critic, transplants the same weights into a jax critic, and asserts the
penalty value and d(penalty)/d(critic params) agree — the double-backward
path that four model families depend on.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from tpugan import losses
from tpugan.ops.penalty import dragan_penalty, wdiv_penalty, wgan_gp_penalty

TOL = dict(rtol=1e-4, atol=1e-5)


def test_bce_parity():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, size=(8, 1)).astype(np.float32)
    t = rng.integers(0, 2, size=(8, 1)).astype(np.float32)
    theirs = tnn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    ours = float(losses.bce(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(ours, theirs, **TOL)


def test_bce_with_logits_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 1)).astype(np.float32) * 3
    t = rng.integers(0, 2, size=(8, 1)).astype(np.float32)
    theirs = tnn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(t)).item()
    ours = float(losses.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, theirs, **TOL)


def test_mse_l1_parity():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(5, 3)).astype(np.float32)
    b = rng.normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.mse(jnp.asarray(a), jnp.asarray(b))),
        tnn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)).item(),
        **TOL,
    )
    np.testing.assert_allclose(
        float(losses.l1(jnp.asarray(a), jnp.asarray(b))),
        tnn.L1Loss()(torch.from_numpy(a), torch.from_numpy(b)).item(),
        **TOL,
    )


def test_cross_entropy_parity():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(6,))
    theirs = tnn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    ours = float(
        losses.cross_entropy_logits(jnp.asarray(logits), jnp.asarray(labels))
    )
    np.testing.assert_allclose(ours, theirs, **TOL)


class _TorchCritic(tnn.Module):
    def __init__(self):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Linear(12, 16), tnn.LeakyReLU(0.2), tnn.Linear(16, 1)
        )

    def forward(self, x):
        return self.net(x.view(x.shape[0], -1))


def _jax_critic_apply(tc):
    w1 = jnp.asarray(tc.net[0].weight.detach().numpy().T)
    b1 = jnp.asarray(tc.net[0].bias.detach().numpy())
    w2 = jnp.asarray(tc.net[2].weight.detach().numpy().T)
    b2 = jnp.asarray(tc.net[2].bias.detach().numpy())
    params = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}

    def apply(p, x):
        h = x.reshape(x.shape[0], -1) @ p["w1"] + p["b1"]
        h = jnp.where(h >= 0, h, 0.2 * h)
        return h @ p["w2"] + p["b2"]

    return params, apply


def _torch_gp(tc, real, fake, alpha):
    interp = (alpha * real + (1 - alpha) * fake).requires_grad_(True)
    d_i = tc(interp)
    ones = torch.ones_like(d_i)
    grads = torch.autograd.grad(
        d_i, interp, grad_outputs=ones, create_graph=True, retain_graph=True
    )[0]
    grads = grads.view(grads.size(0), -1)
    return ((grads.norm(2, dim=1) - 1) ** 2).mean()


def test_wgan_gp_penalty_value_and_grads():
    rng = np.random.default_rng(4)
    real = rng.normal(size=(6, 12)).astype(np.float32)
    fake = rng.normal(size=(6, 12)).astype(np.float32)
    alpha = rng.uniform(size=(6, 1)).astype(np.float32)

    tc = _TorchCritic()
    gp_t = _torch_gp(tc, torch.from_numpy(real), torch.from_numpy(fake),
                     torch.from_numpy(alpha))
    gp_t.backward()
    def g(p):
        # b2 never influences dD/dx, so torch leaves .grad = None (== 0).
        return p.grad.numpy() if p.grad is not None else np.zeros(p.shape, np.float32)

    torch_grads = {
        "w1": g(tc.net[0].weight).T,
        "b1": g(tc.net[0].bias),
        "w2": g(tc.net[2].weight).T,
        "b2": g(tc.net[2].bias),
    }

    params, apply = _jax_critic_apply(tc)
    alpha_j = jnp.asarray(alpha)

    def penalty(p):
        interp = alpha_j * jnp.asarray(real) + (1 - alpha_j) * jnp.asarray(fake)
        grads = jax.grad(lambda xi: jnp.sum(apply(p, xi)))(interp)
        norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))
        return jnp.mean((norms - 1.0) ** 2)

    val, grads = jax.value_and_grad(penalty)(params)
    np.testing.assert_allclose(float(val), gp_t.item(), **TOL)
    for k in torch_grads:
        np.testing.assert_allclose(
            np.asarray(grads[k]), torch_grads[k], rtol=1e-3, atol=1e-5
        )


def test_wdiv_penalty_value():
    # Matches wgan_div/wgan_div.py:148-163 with k=2, p=6 on a linear critic.
    rng = np.random.default_rng(5)
    real = rng.normal(size=(4, 8)).astype(np.float32)
    fake = rng.normal(size=(4, 8)).astype(np.float32)
    w = rng.normal(size=(8, 1)).astype(np.float32)

    def d_fn(x):
        return x @ jnp.asarray(w)

    ours = float(wdiv_penalty(d_fn, jnp.asarray(real), jnp.asarray(fake)))
    # Linear critic: grad == w for every sample.
    norm_p = (np.sum(w**2)) ** 3  # (sum g^2)^(p/2), p=6
    expect = float((norm_p + norm_p)) * 2 / 2  # mean over samples = same
    np.testing.assert_allclose(ours, expect, rtol=1e-4)


def test_penalties_finite_on_conv_critic():
    from tpugan.nn.blocks import DCGANDiscriminator

    d = DCGANDiscriminator(sigmoid=False)
    img = jnp.zeros((4, 16, 16, 1))
    variables = d.init(jax.random.PRNGKey(0), img, train=False)

    def d_fn(x):
        return d.apply(variables, x, train=False)

    k = jax.random.PRNGKey(1)
    real = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 1))
    fake = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 1))
    for val in [
        wgan_gp_penalty(d_fn, real, fake, k),
        dragan_penalty(d_fn, real, k),
        wdiv_penalty(d_fn, real, fake),
    ]:
        assert np.isfinite(float(val))


def test_pullaway_matches_reference_formula():
    # ebgan/ebgan.py:140-146 — sums RAW cosine similarity (not squared).
    rng = np.random.default_rng(6)
    e = rng.normal(size=(5, 7)).astype(np.float32)
    et = torch.from_numpy(e)
    norm = torch.sqrt(torch.sum(et**2, -1, keepdim=True))
    ne = et / norm
    sim = torch.matmul(ne, ne.transpose(1, 0))
    n = e.shape[0]
    expect = ((torch.sum(sim) - n) / (n * (n - 1))).item()
    ours = float(losses.pullaway(jnp.asarray(e)))
    np.testing.assert_allclose(ours, expect, rtol=1e-4)
