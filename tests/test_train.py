"""Training step tests: gradient flow, loss decrease, sharded multi-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import LossConfig, TrainConfig
from phnet_tpu.losses import LaneCriterion
from phnet_tpu.models import PHNet
from phnet_tpu.parallel import batch_sharding, make_mesh, replicate_sharding, shard_params
from phnet_tpu.train import build_optimizer, create_train_state, make_train_step

from test_model import make_labels, tiny_cfg


def setup_training(cfg, b, t, seed=0, loss_style="blend_all"):
    model = PHNet(cfg)
    rng = np.random.default_rng(seed)
    frames = jnp.array(
        rng.normal(size=(b, t, cfg.img_h, cfg.img_w, 3)), jnp.float32)
    labels = make_labels(rng, b, t, cfg)
    tcfg = TrainConfig(loss=LossConfig(style=loss_style))
    criterion = LaneCriterion(cfg, tcfg.loss)
    tx = build_optimizer(tcfg, total_steps=1000)
    state = create_train_state(
        model, cfg, jax.random.key(seed), frames, labels, tx)
    step = make_train_step(model, criterion, tx)
    return model, state, step, frames, labels


def test_train_step_loss_decreases():
    cfg = tiny_cfg()
    model, state, step, frames, labels = setup_training(cfg, b=1, t=2)
    jstep = jax.jit(step)
    losses = []
    for i in range(6):
        state, metrics = jstep(state, frames, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses)), losses
    assert float(metrics["grad_norm"]) > 0
    # overfitting a fixed batch: loss should drop
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_train_step_blend_cls_style():
    cfg = tiny_cfg(n_lengths=1, separate_offset_head=True)
    model, state, step, frames, labels = setup_training(
        cfg, b=1, t=2, loss_style="blend_cls")
    jstep = jax.jit(step)
    state, metrics = jstep(state, frames, labels, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_train_step_runs():
    """Data(4) x model(2) mesh on 8 virtual CPU devices: full step executes
    and matches structure; gradients psum over the data axis implicitly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg()
    mesh = make_mesh(8, model_parallel=2)
    model, state, step, frames, labels = setup_training(cfg, b=4, t=2)

    param_sh = shard_params(state.params, mesh, min_size=1024)
    state = state.replace(
        params=jax.device_put(state.params, param_sh),
        batch_stats=jax.device_put(
            state.batch_stats, replicate_sharding(mesh)),
        opt_state=jax.device_put(state.opt_state, replicate_sharding(mesh)),
    )
    bs = batch_sharding(mesh)
    frames = jax.device_put(frames, bs)
    labels = jax.device_put(labels, bs)

    jstep = jax.jit(step)
    state2, metrics = jstep(state, frames, labels, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # params updated
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.array(p0), np.array(p1))
    # at least one param is actually model-sharded
    shardings = [x.sharding.spec for x in jax.tree.leaves(state2.params)]
    assert any("model" in str(s) for s in shardings)


def test_sharded_matches_single_device():
    """Loss on the sharded mesh equals the unsharded loss for the same batch."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = tiny_cfg()
    model, state, step, frames, labels = setup_training(cfg, b=4, t=2, seed=3)
    jstep = jax.jit(step)
    _, m_single = jstep(state, frames, labels, jax.random.key(0))

    mesh = make_mesh(4, model_parallel=1)
    bs = batch_sharding(mesh)
    state_r = state.replace(
        params=jax.device_put(state.params, replicate_sharding(mesh)),
        batch_stats=jax.device_put(state.batch_stats, replicate_sharding(mesh)),
        opt_state=jax.device_put(state.opt_state, replicate_sharding(mesh)),
    )
    _, m_shard = jstep(
        state_r, jax.device_put(frames, bs), jax.device_put(labels, bs),
        jax.random.key(0))
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4)
