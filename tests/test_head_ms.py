"""Multi-scale head variant (Router4OLV2 equivalent) tests."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from phnet_tpu.config import (
    BackboneConfig, HeadConfig, LaneSpec, MemoryConfig, ModelConfig,
    NeckConfig, TestParams,
)
from phnet_tpu.models import PHNet

from test_model import make_labels


def tiny_ms_cfg():
    return ModelConfig(
        img_h=96,
        img_w=192,
        lane=LaneSpec(n_offsets=24, n_lengths=1),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32),
                                out_indices=(0, 1, 2)),
        neck=NeckConfig(in_channels=(8, 16, 24), out_channels=(4, 8, 16),
                        num_outs=3),
        head=HeadConfig(
            num_priors=32,
            fc_hidden_dim=32,  # shared decode width
            decoder_ffn_dim=64,
            variant="multi",
            ms_sample_points=(6, 12, 24),
            ms_channels=(16, 8, 4),  # constant C*P = 96
        ),
        memory=MemoryConfig(window=3, slots_per_frame=5),
        test=TestParams(conf_threshold=0.3, nms_thres=20.0, nms_topk=4),
        max_lanes=4,
        routing="hard",
    )


def test_multiscale_forward_train_and_infer():
    cfg = tiny_ms_cfg()
    model = PHNet(cfg)
    rng = np.random.default_rng(0)
    b, t = 1, 3
    frames = jnp.array(rng.normal(size=(b, t, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    labels = make_labels(rng, b, t, cfg)

    variables = jax.jit(lambda r, f, l: model.init(r, f, l, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, labels)
    outs, mem = jax.jit(
        lambda v, f, l, r: model.apply(
            v, f, l, train=True, rngs={"dropout": r}, mutable=["batch_stats"])
    )(variables, frames, labels, jax.random.key(2))[0]
    a, dim = cfg.head.num_priors, cfg.lane.dim
    assert outs.pred_fir.shape == (t, 3, b, a, dim)
    assert np.isfinite(np.array(outs.pred_fir)).all()
    assert np.isfinite(np.array(outs.pred_sec)).all()
    # additive pos-encoding: memory feature width == decode width
    assert mem.values.shape[-1] == cfg.head.fc_hidden_dim

    outs_i, _ = jax.jit(lambda v, f: model.apply(v, f, None, train=False))(
        variables, frames)
    assert outs_i.kept.shape == (t, b, cfg.test.nms_topk, dim)


def test_multiscale_gradients_flow():
    from phnet_tpu.config import LossConfig, TrainConfig
    from phnet_tpu.losses import LaneCriterion
    from phnet_tpu.train import build_optimizer, create_train_state, make_train_step

    cfg = tiny_ms_cfg()
    model = PHNet(cfg)
    rng = np.random.default_rng(1)
    frames = jnp.array(rng.normal(size=(1, 2, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    labels = make_labels(rng, 1, 2, cfg)
    tcfg = TrainConfig(loss=LossConfig(style="blend_cls", use_lane_iou=True))
    criterion = LaneCriterion(cfg, tcfg.loss)
    tx = build_optimizer(tcfg, 100)
    state = create_train_state(model, cfg, jax.random.key(0), frames, labels, tx)
    step = jax.jit(make_train_step(model, criterion, tx))
    losses = []
    for i in range(4):
        state, metrics = step(state, frames, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_multiscale_int8_inference():
    """quantize='int8' wires into the multiscale head's DynamicConvs; the
    quantized inference graph must run and stay close to f32."""
    import dataclasses

    cfg = tiny_ms_cfg()
    model = PHNet(cfg)
    rng = np.random.default_rng(1)
    frames = jnp.array(rng.normal(size=(1, 2, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    outs_f, _ = model.apply(variables, frames, None, train=False)
    model_q = PHNet(dataclasses.replace(cfg, quantize="int8"))
    outs_q, _ = model_q.apply(variables, frames, None, train=False)
    assert outs_q.kept.shape == outs_f.kept.shape
    assert np.isfinite(np.array(outs_q.kept)).all()
    # numerical closeness on random (untrained) weights is not meaningful
    # at the post-NMS surface — the trained-model quality bound lives in
    # tests/test_e2e_quality.py (quantized F1 gate)

def test_multiscale_stage0_hoist_forward():
    """head.variant='multi' + stage0_hoist=True must not raise: the hoist
    call only forwards dyn_pre_permuted when pre-permuted weights are
    actually in play (base LaneHead), since the multi-scale
    stage0_forward doesn't take the kwarg (ADVICE r4 regression)."""
    cfg = dataclasses.replace(
        tiny_ms_cfg(),
        head=dataclasses.replace(tiny_ms_cfg().head, stage0_hoist=True))
    model = PHNet(cfg)
    rng = np.random.default_rng(3)
    frames = jnp.array(rng.normal(size=(1, 2, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    outs, _ = jax.jit(lambda v, f: model.apply(v, f, None, train=False))(
        variables, frames)
    assert np.isfinite(np.array(outs.kept)).all()
