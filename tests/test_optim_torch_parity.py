"""Direct numerical parity of tpugan optimizer update rules vs torch.optim.

train/optim.py claims torch semantics for adam_torch / rmsprop_torch /
linear_decay_schedule; until now those claims were verified only
transitively (FID head-to-heads). Here the SAME initial params receive the
SAME gradient sequence on both sides for N steps and the parameter trees
are asserted equal to <=1e-6 after every step:

- adam_torch vs torch.optim.Adam at the zoo's configs (gan/gan.py:112-113
  Adam(2e-4, 0.5, 0.999); clustergan.py:380-384 Adam with
  weight_decay=2.5e-5 — L2 folded into the gradient before the moments);
- rmsprop_torch vs torch.optim.RMSprop (wgan/wgan.py:105-106,
  RMSprop(5e-5), eps OUTSIDE the sqrt);
- linear_decay_schedule composed with Adam vs torch LambdaLR stepped per
  epoch (cyclegan/cyclegan.py:93-102 + cyclegan/utils.py:36-44), across a
  decay boundary.
"""

import numpy as np
import optax
import torch
import jax.numpy as jnp

from tpugan.train.optim import adam_torch, linear_decay_schedule, rmsprop_torch

N_STEPS = 12


def _problem(seed, shapes=((4, 3), (3,), (2, 2, 3))):
    rng = np.random.default_rng(seed)
    params = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grads = [
        [rng.normal(scale=0.5, size=s).astype(np.float32) for s in shapes]
        for _ in range(N_STEPS)
    ]
    return params, grads


def _run_torch(params, grads, make_opt, scheduler_fn=None, steps_per_epoch=None):
    tp = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params]
    opt = make_opt(tp)
    sched = scheduler_fn(opt) if scheduler_fn else None
    trees = []
    for step, gs in enumerate(grads):
        opt.zero_grad()
        for p, g in zip(tp, gs):
            p.grad = torch.from_numpy(g.copy())
        opt.step()
        # Reference pattern: scheduler.step() once per EPOCH, after the
        # epoch's batches (cyclegan.py:274-277).
        if sched is not None and (step + 1) % steps_per_epoch == 0:
            sched.step()
        trees.append([p.detach().numpy().copy() for p in tp])
    return trees


def _run_tpugan(params, grads, tx):
    tree = [jnp.asarray(p) for p in params]
    state = tx.init(tree)
    trees = []
    for gs in grads:
        updates, state = tx.update([jnp.asarray(g) for g in gs], state, tree)
        tree = optax.apply_updates(tree, updates)
        trees.append([np.asarray(t) for t in tree])
    return trees


def _assert_trajectories(ours, theirs):
    for step, (a, b) in enumerate(zip(ours, theirs)):
        for i, (x, y) in enumerate(zip(a, b)):
            np.testing.assert_allclose(
                x, y, rtol=1e-6, atol=1e-6,
                err_msg=f"step {step} leaf {i}",
            )


def test_adam_torch_matches_torch_adam():
    # gan/gan.py:112-113 config: Adam(lr=2e-4, betas=(0.5, 0.999)).
    params, grads = _problem(0)
    theirs = _run_torch(
        params, grads,
        lambda p: torch.optim.Adam(p, lr=2e-4, betas=(0.5, 0.999)),
    )
    ours = _run_tpugan(params, grads, adam_torch(2e-4, 0.5, 0.999))
    _assert_trajectories(ours, theirs)


def test_adam_torch_weight_decay_matches_torch():
    # clustergan.py:380-384: Adam(1e-4, (0.5, 0.9), weight_decay=2.5e-5).
    # Use a large decay so a placement slip (decoupled-AdamW style vs
    # torch's L2-into-the-gradient) would exceed the tolerance.
    params, grads = _problem(1)
    theirs = _run_torch(
        params, grads,
        lambda p: torch.optim.Adam(
            p, lr=1e-4, betas=(0.5, 0.9), weight_decay=0.05
        ),
    )
    ours = _run_tpugan(
        params, grads, adam_torch(1e-4, 0.5, 0.9, weight_decay=0.05)
    )
    _assert_trajectories(ours, theirs)


def test_rmsprop_torch_matches_torch_rmsprop():
    # wgan/wgan.py:105-106: RMSprop(lr=5e-5) — torch defaults alpha=0.99,
    # eps=1e-8 OUTSIDE the sqrt. Scale one gradient leaf down so the
    # eps placement (inside vs outside sqrt) is numerically visible.
    params, grads = _problem(2)
    for gs in grads:
        gs[1] *= 1e-3
    theirs = _run_torch(
        params, grads, lambda p: torch.optim.RMSprop(p, lr=5e-5)
    )
    ours = _run_tpugan(params, grads, rmsprop_torch(5e-5))
    _assert_trajectories(ours, theirs)


def test_linear_decay_adam_matches_torch_lambdalr():
    # cyclegan/utils.py:36-44 LambdaLR wired to Adam (cyclegan.py:93-102),
    # stepped once per epoch; 4 epochs x 3 steps crossing decay_start=2.
    n_epochs, decay_start, steps_per_epoch = 4, 2, 3
    params, grads = _problem(3)

    def factor(epoch):
        return 1.0 - max(0, epoch + 0 - decay_start) / (n_epochs - decay_start)

    theirs = _run_torch(
        params, grads,
        lambda p: torch.optim.Adam(p, lr=2e-4, betas=(0.5, 0.999)),
        scheduler_fn=lambda o: torch.optim.lr_scheduler.LambdaLR(o, factor),
        steps_per_epoch=steps_per_epoch,
    )
    sched = linear_decay_schedule(2e-4, n_epochs, decay_start, steps_per_epoch)
    ours = _run_tpugan(params, grads, adam_torch(sched, 0.5, 0.999))
    _assert_trajectories(ours, theirs)


def test_linear_decay_offset_resume_epoch():
    # --epoch resume: LambdaLR(n_epochs, offset=opt.epoch, decay_epoch)
    # (cyclegan.py:94-102). offset shifts the factor so a resumed run at
    # epoch 3 of 9 decays as if steps had already happened. The 12-step
    # trajectory consumes factors at epoch+offset = 3..8 — exactly the
    # reference-reachable domain (`for epoch in range(opt.epoch,
    # opt.n_epochs)` never evaluates a factor at >= n_epochs, where torch's
    # lambda goes negative and ours floors at 0 by design — that
    # divergence is pinned in test_im2im_core.py).
    n_epochs, decay_start, steps_per_epoch, offset = 9, 2, 2, 3
    params, grads = _problem(4)

    def factor(epoch):
        return 1.0 - max(0, epoch + offset - decay_start) / (
            n_epochs - decay_start
        )

    theirs = _run_torch(
        params, grads,
        lambda p: torch.optim.Adam(p, lr=2e-4, betas=(0.5, 0.999)),
        scheduler_fn=lambda o: torch.optim.lr_scheduler.LambdaLR(o, factor),
        steps_per_epoch=steps_per_epoch,
    )
    sched = linear_decay_schedule(
        2e-4, n_epochs, decay_start, steps_per_epoch, offset=offset
    )
    ours = _run_tpugan(params, grads, adam_torch(sched, 0.5, 0.999))
    _assert_trajectories(ours, theirs)
