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


def test_criterion_reuses_model_assignment():
    """The criterion must not re-solve the second branch's Hungarian
    assignment: the model scan already solved it for the memory write and
    ships it in TrainFrameOut.matched_sec (reference flow: one assignment
    feeding both loss and saveMemory, RouterV4.py:495-507)."""
    import phnet_tpu.losses.criterion as crit_mod
    from phnet_tpu.losses.assign import assign_frame as real_assign
    from phnet_tpu.models.phnet import TrainFrameOut

    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    s, b, t, a = 2, 1, 2, cfg.head.num_priors
    labels = make_labels(rng, b, t, cfg)
    pred_fir = jnp.array(rng.normal(size=(t, s, b, a, cfg.lane.dim)), jnp.float32)
    pred_sec = jnp.array(rng.normal(size=(t, s, b, a, cfg.lane.dim)), jnp.float32)
    diff = jnp.array(rng.uniform(size=(t, s, b, a)), jnp.float32)

    # the matches the model scan would have produced
    spec = cfg.lane
    matched_sec = jnp.stack([
        jnp.stack([
            jnp.stack([
                real_assign(pred_sec[ti, si, bi], labels[bi, ti],
                            labels[bi, ti, :, 1] == 1.0, spec,
                            cfg.img_w, cfg.img_h)
                for bi in range(b)])
            for si in range(s)])
        for ti in range(t)])

    criterion = LaneCriterion(cfg, LossConfig(style="blend_all"))
    calls = {"n": 0}

    def counting_assign(*args, **kw):
        calls["n"] += 1
        return real_assign(*args, **kw)

    orig = crit_mod.assign_frame
    crit_mod.assign_frame = counting_assign
    try:
        outs = TrainFrameOut(pred_fir, pred_sec, diff, matched_sec)
        loss_shared, _ = criterion(outs, labels)
        n_with = calls["n"]
    finally:
        crit_mod.assign_frame = orig

    # only the first branch solves (S stages traced once under vmap)
    assert n_with == s, n_with
    # and reusing the match is numerically identical to re-solving it
    loss_solo, _ = jax.vmap(
        lambda pf, ps, df, lab: jax.vmap(
            criterion.frame_loss, in_axes=(1, 1, 1, 0))(pf, ps, df, lab)
    )(pred_fir, pred_sec, diff, labels.swapaxes(0, 1))
    np.testing.assert_allclose(
        float(loss_shared), float(loss_solo.mean()), rtol=1e-6)


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


def test_sharded_model2_matches_single_device():
    """Tensor-sharding the fat head kernels over model=2 must not change
    the numbers: loss AND grad_norm of the data(2)xmodel(2) step equal the
    unsharded single-device step on the same batch (VERDICT r3 #8 — the
    model axis certified numerically, not just structurally)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = tiny_cfg()
    model, state, step, frames, labels = setup_training(cfg, b=2, t=2, seed=4)
    jstep = jax.jit(step)
    s_single, m_single = jstep(state, frames, labels, jax.random.key(0))

    mesh = make_mesh(4, model_parallel=2)
    param_sh = shard_params(state.params, mesh, min_size=1024)
    state_sh = state.replace(
        params=jax.device_put(state.params, param_sh),
        batch_stats=jax.device_put(
            state.batch_stats, replicate_sharding(mesh)),
        opt_state=jax.device_put(state.opt_state, replicate_sharding(mesh)),
    )
    bs = batch_sharding(mesh)
    s_shard, m_shard = jstep(
        state_sh, jax.device_put(frames, bs), jax.device_put(labels, bs),
        jax.random.key(0))
    # at least one param must actually be model-sharded for this to test
    # anything
    specs = [str(x.sharding.spec) for x in jax.tree.leaves(s_shard.params)]
    assert any("model" in s for s in specs), specs
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m_single["grad_norm"]), float(m_shard["grad_norm"]), rtol=2e-3)
    # updated parameters agree too (optimizer ran on identical grads)
    p_a = jax.tree.leaves(s_single.params)
    p_b = jax.tree.leaves(s_shard.params)
    worst = max(
        float(np.max(np.abs(np.array(a, np.float32) - np.array(b, np.float32))))
        for a, b in zip(p_a, p_b))
    assert worst < 5e-3, worst


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 over B=2: one optimizer update on the micro-average.
    The criterion is a batch mean, so the accumulated loss/grads equal the
    full-batch step's up to BatchNorm forward statistics (which see the
    micro-batch); dropout rngs differ per micro-batch, so compare with a
    modest tolerance and assert the bookkeeping exactly."""
    cfg = tiny_cfg()
    model, state, step1, frames, labels = setup_training(cfg, b=2, t=2)
    tcfg = TrainConfig(loss=LossConfig(style="blend_all"))
    criterion = LaneCriterion(cfg, tcfg.loss)
    tx = build_optimizer(tcfg, total_steps=1000)
    step2 = make_train_step(model, criterion, tx, accum_steps=2)

    s_full, m_full = jax.jit(step1)(state, frames, labels, jax.random.key(9))
    s_acc, m_acc = jax.jit(step2)(state, frames, labels, jax.random.key(9))

    assert int(s_acc.step) == int(s_full.step) == int(state.step) + 1
    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_full["loss"]), rtol=0.05)
    # criterion metrics are means — accumulation must NOT inflate them by
    # accum_steps (they differ only by BN-stats/dropout micro-batch noise)
    for k in m_full:
        if k in ("loss", "grad_norm"):
            continue
        np.testing.assert_allclose(
            float(m_acc[k]), float(m_full[k]), rtol=0.25, atol=1e-3,
            err_msg=k)
    # one update applied, comparable magnitude
    d_full = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_full.params, state.params)
    d_acc = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_acc.params, state.params)
    assert max(jax.tree_util.tree_leaves(d_acc)) > 0
    np.testing.assert_allclose(
        float(m_acc["grad_norm"]), float(m_full["grad_norm"]), rtol=0.25)

    # indivisible batch is an explicit error
    with pytest.raises(ValueError):
        make_train_step(model, criterion, tx, accum_steps=3)(
            state, frames, labels, jax.random.key(0))
