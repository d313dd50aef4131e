"""Optimizer/schedule trajectory parity vs torch.

The reference trains with ``optim.AdamW`` (or Nesterov SGD) over param
groups from ``set_weight_decay`` — every 1-D parameter (and ``.bias``)
exempt from decay (``libs/utils/optimizer.py:41-55``) — under a
``CosineAnnealingLR`` stepped PER ITERATION with
``T_max = len(trainset) * epochs // world_size`` (``trainVIL.py:117,253``).

These tests run the same multi-step update trajectory through our optax
``build_optimizer`` (``phnet_tpu/train/optimizer.py``) and through the
actual torch optimizers on an identical parameter tree with identical
analytic gradients, and assert the parameter values agree step by step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from phnet_tpu.config import TrainConfig
from phnet_tpu.train.optimizer import build_optimizer, cosine_schedule

STEPS = 12
T_MAX = 12  # reference quirk: total_steps already divided by world size


def _param_tree(rng):
    """Representative leaves: conv kernel (4-D), dense kernel (2-D),
    bias / norm scale (1-D, decay-exempt)."""
    return {
        "conv": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
                 "bias": rng.normal(size=(8,)).astype(np.float32)},
        "dense": {"kernel": rng.normal(size=(16, 8)).astype(np.float32)},
        "norm": {"scale": rng.normal(size=(16,)).astype(np.float32)},
    }


# per-leaf gradient scale so every leaf gets a distinct, deterministic grad
_GRAD_SCALE = {"conv/kernel": 0.7, "conv/bias": -1.3,
               "dense/kernel": 2.1, "norm/scale": 0.4}


def _loss_jax(params):
    total = 0.0
    for k, scale in _GRAD_SCALE.items():
        a, b = k.split("/")
        total = total + jnp.sum(jnp.sin(scale * params[a][b]))
    return total


def _loss_torch(tensors):
    total = torch.zeros(())
    for k, scale in _GRAD_SCALE.items():
        total = total + torch.sum(torch.sin(scale * tensors[k]))
    return total


def _torch_trajectory(tree, solver, tcfg):
    tensors = {f"{a}/{b}": torch.nn.Parameter(torch.from_numpy(v.copy()))
               for a, sub in tree.items() for b, v in sub.items()}
    has_decay = [p for p in tensors.values() if p.ndim > 1]
    no_decay = [p for p in tensors.values() if p.ndim == 1]
    groups = [{"params": has_decay},
              {"params": no_decay, "weight_decay": 0.0}]
    if solver == "adamw":
        opt = torch.optim.AdamW(groups, lr=tcfg.learning_rate,
                                betas=tuple(tcfg.momentum),
                                weight_decay=tcfg.weight_decay)
    else:
        opt = torch.optim.SGD(groups, lr=tcfg.learning_rate,
                              momentum=tcfg.momentum[0], nesterov=True,
                              weight_decay=tcfg.weight_decay)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=T_MAX)
    traj = []
    for _ in range(STEPS):
        opt.zero_grad()
        _loss_torch(tensors).backward()
        opt.step()
        sched.step()  # per iteration, trainVIL.py:253
        traj.append({k: p.detach().numpy().copy()
                     for k, p in tensors.items()})
    return traj


def _jax_trajectory(tree, solver, tcfg):
    params = jax.tree.map(jnp.asarray, tree)
    tx = build_optimizer(dataclasses.replace(tcfg, solver=solver), T_MAX)
    state = tx.init(params)
    grad_fn = jax.jit(jax.grad(_loss_jax))
    traj = []
    for _ in range(STEPS):
        grads = grad_fn(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        traj.append({f"{a}/{b}": np.asarray(v)
                     for a, sub in params.items() for b, v in sub.items()})
    return traj


@pytest.mark.parametrize("solver", ["adamw", "sgd"])
def test_update_trajectory_matches_torch(solver):
    rng = np.random.default_rng(7)
    tree = _param_tree(rng)
    tcfg = TrainConfig(learning_rate=5e-4, weight_decay=1e-3,
                       momentum=(0.9, 0.999), grad_clip_norm=0.0)
    ours = _jax_trajectory(tree, solver, tcfg)
    ref = _torch_trajectory(tree, solver, tcfg)
    for step, (o, r) in enumerate(zip(ours, ref)):
        for k in r:
            np.testing.assert_allclose(
                o[k], r[k], rtol=2e-5, atol=2e-7,
                err_msg=f"{solver} step {step} leaf {k}")


def test_cosine_schedule_matches_torch_per_step_lr():
    """The lr actually applied at every iteration equals torch's
    CosineAnnealingLR sequence (closed form holds for eta_min=0)."""
    lr0 = 5e-4
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=T_MAX)
    ours = cosine_schedule(lr0, T_MAX)
    torch_lrs, our_lrs = [], []
    for t in range(STEPS):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(t)))
        opt.step()
        sched.step()
    # our schedule evaluates in f32 (it runs jitted on device); torch's is
    # f64 — tail values near eta_min carry ~1e-6 relative f32 noise
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-12)


def test_decay_masking_is_1d_exemption():
    """AdamW with huge decay: 1-D leaves must be untouched by decay (match
    a no-decay run), multi-D leaves must shrink — pins decay_mask to the
    reference's set_weight_decay split."""
    rng = np.random.default_rng(3)
    tree = _param_tree(rng)
    base = TrainConfig(learning_rate=0.0, weight_decay=0.0,
                       momentum=(0.9, 0.999), grad_clip_norm=0.0)
    # lr=0 removes the gradient term entirely... torch AdamW applies decay
    # multiplicatively scaled by lr, so use lr>0 with zero grads instead.
    tcfg = dataclasses.replace(base, learning_rate=0.1, weight_decay=0.5)
    params = jax.tree.map(jnp.asarray, tree)
    tx = build_optimizer(tcfg, T_MAX)
    state = tx.init(params)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_g, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(new["conv"]["bias"], tree["conv"]["bias"])
    np.testing.assert_allclose(new["norm"]["scale"], tree["norm"]["scale"])
    assert np.all(np.abs(new["dense"]["kernel"])
                  < np.abs(tree["dense"]["kernel"]))


def test_fused_adamw_equals_optax_adamw():
    """fused_adamw (one flat vector, TrainConfig.fused_optimizer=True)
    reproduces optax.adamw(mask=decay_mask) step for step on a mixed
    pytree (2-D decayed, 1-D exempt), including the cosine schedule and
    per-layer LR scales."""
    import dataclasses

    import jax
    import optax

    from phnet_tpu.config import TrainConfig
    from phnet_tpu.train.optimizer import (
        build_optimizer, cosine_schedule, decay_mask, fused_adamw,
        scale_updates_by_tree,
    )

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(7,)).astype(np.float32)),
        "inner": {"k": jnp.asarray(rng.normal(size=(3, 3, 2)).astype(np.float32))},
    }
    scales = {"w": 0.5, "b": 1.0, "inner": {"k": 0.9}}
    sched = cosine_schedule(1e-3, 50)

    ref = optax.chain(
        optax.adamw(learning_rate=sched, b1=0.9, b2=0.999,
                    weight_decay=1e-2, mask=decay_mask),
        scale_updates_by_tree(scales),
    )
    fused = fused_adamw(sched, b1=0.9, b2=0.999, weight_decay=1e-2,
                        lr_scales=scales)

    s_ref, s_fus = ref.init(params), fused.init(params)
    p_ref = p_fus = params
    for i in range(5):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32)), params)
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_fus, s_fus = fused.update(g, s_fus, p_fus)
        for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_fus)):
            np.testing.assert_allclose(np.array(a), np.array(b),
                                       rtol=1e-6, atol=1e-9)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fus = optax.apply_updates(p_fus, u_fus)

    # the TrainConfig switch selects each path
    assert TrainConfig().fused_optimizer is True
    cfg_off = dataclasses.replace(TrainConfig(), fused_optimizer=False)
    tx_off = build_optimizer(cfg_off, 100)
    assert "mu" not in (tx_off.init(params) if isinstance(
        tx_off.init(params), dict) else {})
