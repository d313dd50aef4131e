"""End-to-end quality gate on synthetic clips.

The only quality oracle available without the real datasets: train a small
model to overfit synthetic lane clips, run the FULL inference pipeline
(scan + routing + NMS + Lane decode + CULane txt emission), score with the
CULane metric, and assert F1@0.5 above a pinned floor. This closes the
loop the reference closes with ``testVIL.py`` -> ``evaluate_iou.py`` and
turns "the pipeline runs" into a number that can regress.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import (
    BackboneConfig, Config, DataConfig, HeadConfig, LaneSpec, LossConfig,
    MemoryConfig, ModelConfig, NeckConfig, TestParams, TrainConfig,
)
from phnet_tpu.data import SyntheticVideoDataset
from phnet_tpu.evaluation import (
    aggregate_results, culane_metric, read_lines_txt,
)
from phnet_tpu.losses import LaneCriterion
from phnet_tpu.models import PHNet
from phnet_tpu.pipeline import InferencePipeline
from phnet_tpu.train import build_optimizer, create_train_state, make_train_step

H, W = 96, 192


def quality_cfg():
    model = ModelConfig(
        img_h=H, img_w=W,
        lane=LaneSpec(n_offsets=18, n_lengths=2),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32)),
        neck=NeckConfig(in_channels=(16, 24, 32), out_channels=16, num_outs=3),
        head=HeadConfig(num_priors=48, sample_points=8, fc_hidden_dim=16,
                        prior_feat_channels=16, decoder_ffn_dim=32),
        memory=MemoryConfig(window=0, slots_per_frame=5),
        test=TestParams(conf_threshold=0.35, nms_thres=12.0, nms_topk=4),
        max_lanes=4,
    )
    return Config(model=model, data=DataConfig(img_h=H, img_w=W, max_lanes=4),
                  train=TrainConfig(loss=LossConfig()))


def test_synthetic_overfit_f1_floor(tmp_path):
    """Train 400 steps on one synthetic clip; full emit->score pipeline on
    the same clip must reach F1@0.5 >= 0.9 (pinned regression floor)."""
    cfg = quality_cfg()
    model = PHNet(cfg.model)
    ds = SyntheticVideoDataset(
        n_videos=1, frames_per_video=4, img_h=H, img_w=W,
        spec=cfg.model.lane, max_lanes=cfg.model.max_lanes, seed=5)
    clip = ds[0]
    frames = jnp.asarray(clip["frames"])[None]
    labels = jnp.asarray(clip["labels"])[None]

    tcfg = dataclasses.replace(cfg.train, learning_rate=2e-3)
    tx = build_optimizer(tcfg, total_steps=2500)
    state = create_train_state(
        model, cfg.model, jax.random.key(0), frames, labels, tx)
    step = jax.jit(make_train_step(
        model, LaneCriterion(cfg.model, tcfg.loss), tx))

    losses = []
    for i in range(400):
        state, metrics = step(state, frames, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred_dir = str(tmp_path / "pred")
    anno_dir = str(tmp_path / "anno")
    pipe = InferencePipeline(cfg, variables, chunk=4)
    stats = pipe.run_and_emit(ds, pred_dir, anno_dir, fmt="vil")
    assert stats["frames"] == 4

    results = []
    import glob

    for pf in sorted(glob.glob(os.path.join(pred_dir, "*", "*.lines.txt"))):
        af = pf.replace(pred_dir, anno_dir)
        results.append(culane_metric(
            read_lines_txt(pf), read_lines_txt(af), (H, W, 3)))
    agg = aggregate_results(results)
    # pinned floor: an overfit model must nail its own training clip
    assert agg["F1"] >= 0.9, agg
    assert agg["miou"] >= 0.75, agg

    # both quantized serving paths (ops/quant.py: w8a8 "int8" and
    # weight-only "w8") must clear the same floor with the SAME weights —
    # quantization noise is renormalized by the chain LayerNorms and must
    # not cost detection quality
    for mode in ("int8", "w8"):
        cfg_q = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize=mode))
        pred_q = str(tmp_path / f"pred_{mode}")
        pipe_q = InferencePipeline(cfg_q, variables, chunk=4)
        stats_q = pipe_q.run_and_emit(ds, pred_q, None, fmt="vil")
        assert stats_q["frames"] == 4
        results_q = []
        for pf in sorted(glob.glob(os.path.join(pred_q, "*", "*.lines.txt"))):
            af = pf.replace(pred_q, anno_dir)
            results_q.append(culane_metric(
                read_lines_txt(pf), read_lines_txt(af), (H, W, 3)))
        agg_q = aggregate_results(results_q)
        assert agg_q["F1"] >= 0.9, (mode, agg_q)


def quality_cfg_ol():
    """OL-flavoured gate config: 1-length lane vector, separate offsets
    head, learned pos encoding, soft routing, blend_cls + LaneIoU loss —
    the full OpenLane path at toy scale."""
    model = ModelConfig(
        img_h=H, img_w=W,
        lane=LaneSpec(n_offsets=18, n_lengths=1),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32)),
        neck=NeckConfig(in_channels=(16, 24, 32), out_channels=16, num_outs=3),
        head=HeadConfig(num_priors=48, sample_points=8, fc_hidden_dim=16,
                        prior_feat_channels=16, decoder_ffn_dim=32,
                        pos_encoding="learned", separate_offset_head=True),
        memory=MemoryConfig(window=5, slots_per_frame=5),
        # conf 0.5 as in the real OL preset: the blend_cls criterion's
        # recall-heavy focal alpha (0.1, 0.9) over-fires at VIL's 0.35
        test=TestParams(conf_threshold=0.5, nms_thres=12.0, nms_topk=4),
        max_lanes=4,
        routing="soft",
    )
    loss = LossConfig(style="blend_cls", use_lane_iou=True,
                      focal_alpha=(0.1, 0.9), cls_weight=8.0,
                      reg_weight=0.5, iou_weight=1.5)
    return Config(model=model, data=DataConfig(img_h=H, img_w=W, max_lanes=4),
                  train=TrainConfig(loss=loss))


def quality_cfg_ms():
    """Multi-scale gate config (Router4OLV2 path at toy scale): per-stage
    sample points / channels, ConvRouter, DynamicConvV2 geometry, tuple
    FPN out_channels — the whole ``head_ms`` stack."""
    model = ModelConfig(
        img_h=H, img_w=W,
        lane=LaneSpec(n_offsets=18, n_lengths=1),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32)),
        neck=NeckConfig(in_channels=(16, 24, 32), out_channels=(8, 12, 16),
                        num_outs=3),
        head=HeadConfig(variant="multi", num_priors=48, fc_hidden_dim=32,
                        decoder_ffn_dim=64, pos_encoding="sine",
                        pos_temperature=64.0, pos_normalize=False,
                        separate_offset_head=False,
                        ms_sample_points=(6, 8, 12), ms_channels=(16, 12, 8)),
        memory=MemoryConfig(window=5, slots_per_frame=5),
        test=TestParams(conf_threshold=0.5, nms_thres=12.0, nms_topk=4),
        max_lanes=4,
        routing="hard",
    )
    loss = LossConfig(style="blend_cls", use_lane_iou=True,
                      focal_alpha=(0.1, 0.9), cls_weight=8.0,
                      reg_weight=0.5, iou_weight=1.5)
    return Config(model=model, data=DataConfig(img_h=H, img_w=W, max_lanes=4),
                  train=TrainConfig(loss=loss))


def quality_cfg_prop():
    """Prior-propagation gate config (Router4OLV3 path at toy scale):
    ``propagate_priors`` head with the V3 one-frame carry, soft routing."""
    model = ModelConfig(
        img_h=H, img_w=W,
        lane=LaneSpec(n_offsets=18, n_lengths=1),
        backbone=BackboneConfig(in_channels=(8, 16, 24, 32)),
        neck=NeckConfig(in_channels=(16, 24, 32), out_channels=16, num_outs=3),
        head=HeadConfig(num_priors=48, sample_points=8, fc_hidden_dim=16,
                        prior_feat_channels=16, decoder_ffn_dim=32,
                        pos_encoding="learned", separate_offset_head=True,
                        propagate_priors=True),
        memory=MemoryConfig(window=1, slots_per_frame=4),
        test=TestParams(conf_threshold=0.5, nms_thres=12.0, nms_topk=4),
        max_lanes=4,
        routing="soft",
    )
    loss = LossConfig(style="blend_cls", use_lane_iou=True,
                      focal_alpha=(0.1, 0.9), cls_weight=8.0,
                      reg_weight=0.5, iou_weight=1.5)
    return Config(model=model, data=DataConfig(img_h=H, img_w=W, max_lanes=4),
                  train=TrainConfig(loss=loss))


def _overfit_and_score(cfg, tmp_path, steps=200, lr=4e-3, seed=7):
    """Shared gate body: overfit one synthetic clip, run the full
    emit->score pipeline, return (first_loss, last_loss, aggregate)."""
    import glob

    model = PHNet(cfg.model)
    ds = SyntheticVideoDataset(
        n_videos=1, frames_per_video=4, img_h=H, img_w=W,
        spec=cfg.model.lane, max_lanes=cfg.model.max_lanes, seed=seed)
    clip = ds[0]
    frames = jnp.asarray(clip["frames"])[None]
    labels = jnp.asarray(clip["labels"])[None]

    tcfg = dataclasses.replace(cfg.train, learning_rate=lr)
    tx = build_optimizer(tcfg, total_steps=2500)
    state = create_train_state(
        model, cfg.model, jax.random.key(0), frames, labels, tx)
    step = jax.jit(make_train_step(
        model, LaneCriterion(cfg.model, tcfg.loss), tx))
    losses = []
    for i in range(steps):
        state, metrics = step(state, frames, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred_dir = str(tmp_path / "pred")
    anno_dir = str(tmp_path / "anno")
    pipe = InferencePipeline(cfg, variables, chunk=4)
    stats = pipe.run_and_emit(ds, pred_dir, anno_dir, fmt="vil")
    assert stats["frames"] == 4
    results = []
    for pf in sorted(glob.glob(os.path.join(pred_dir, "*", "*.lines.txt"))):
        af = pf.replace(pred_dir, anno_dir)
        results.append(culane_metric(
            read_lines_txt(pf), read_lines_txt(af), (H, W, 3)))
    return losses, aggregate_results(results)


def _train_multi_and_score_heldout(cfg, tmp_path, n_train, n_test, steps_list,
                                   lr, seed_train=21, seed_test=99):
    """Generalization gate body: train one batched step over ``n_train``
    synthetic clips, score the full emit->score pipeline on ``n_test``
    UNSEEN clips (same generator, disjoint seeds) at each checkpoint in
    ``steps_list``. Returns (losses, [(train_agg, heldout_agg), ...]).

    Scoring several checkpoints and gating on the best mirrors the OL
    overfit gate's protocol: the toy trajectory is chaotic (fma/fusion
    differences between machines visibly shift WHERE the generalization
    peak lands), so the gate tests that the pipeline can express a
    generalizing solution, not that the peak lands on one exact step."""
    import glob

    model = PHNet(cfg.model)
    ds_tr = SyntheticVideoDataset(
        n_videos=n_train, frames_per_video=4, img_h=H, img_w=W,
        spec=cfg.model.lane, max_lanes=cfg.model.max_lanes, seed=seed_train)
    ds_te = SyntheticVideoDataset(
        n_videos=n_test, frames_per_video=4, img_h=H, img_w=W,
        spec=cfg.model.lane, max_lanes=cfg.model.max_lanes, seed=seed_test)
    frames = jnp.asarray(
        np.stack([ds_tr[i]["frames"] for i in range(n_train)]))
    labels = jnp.asarray(
        np.stack([ds_tr[i]["labels"] for i in range(n_train)]))

    tcfg = dataclasses.replace(cfg.train, learning_rate=lr)
    tx = build_optimizer(tcfg, total_steps=2500)
    state = create_train_state(
        model, cfg.model, jax.random.key(0), frames, labels, tx)
    step = jax.jit(make_train_step(
        model, LaneCriterion(cfg.model, tcfg.loss), tx))

    def _score(variables, ds, tag):
        pred_dir = str(tmp_path / f"pred_{tag}")
        anno_dir = str(tmp_path / f"anno_{tag}")
        pipe = InferencePipeline(cfg, variables, chunk=4)
        pipe.run_and_emit(ds, pred_dir, anno_dir, fmt="vil")
        results = []
        for pf in sorted(glob.glob(
                os.path.join(pred_dir, "*", "*.lines.txt"))):
            af = pf.replace(pred_dir, anno_dir)
            results.append(culane_metric(
                read_lines_txt(pf), read_lines_txt(af), (H, W, 3)))
        return aggregate_results(results)

    losses, scored, done = [], [], 0
    for ckpt in steps_list:
        for i in range(done, ckpt):
            state, metrics = step(state, frames, labels, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        done = ckpt
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        scored.append((_score(variables, ds_tr, f"train{ckpt}"),
                       _score(variables, ds_te, f"heldout{ckpt}")))
    return losses, scored


def test_synthetic_generalization_f1_floor(tmp_path):
    """Held-out gate, VIL preset (VERDICT r3 #5): train on 4 clips, score 3
    clips the model never saw. Unlike the overfit gates this catches
    learning-dynamics regressions (e.g. a loss-term scale error that still
    overfits). Floor from a measured margin, not fiat — and pinned to the
    WEAKEST observed environment: the held-out trajectory at this toy
    scale is chaotic across matmul precisions/hosts (measured best-of-
    {400,600} F1: 0.667 under default precision, 0.478 under the suite's
    HIGHEST precision on a 1-core host), so the gate floors at F1 >= 0.38
    / mIoU >= 0.40. That is far above what a real learning-dynamics
    regression produces (a mis-scaled loss term leaves held-out F1 near
    0 while still overfitting the train clips), which is what this gate
    exists to catch."""
    losses, scored = _train_multi_and_score_heldout(
        quality_cfg(), tmp_path, n_train=4, n_test=3,
        steps_list=(400, 600), lr=2e-3)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert max(tr["F1"] for tr, _ in scored) >= 0.8, scored
    best = max((te for _, te in scored), key=lambda a: a["F1"])
    assert best["F1"] >= 0.38, scored
    assert best["miou"] >= 0.40, scored


def test_synthetic_generalization_f1_floor_ol(tmp_path):
    """Held-out gate, OL preset (soft routing, separate offsets head,
    window-5 memory, blend_cls + LaneIoU criterion). Calibration sweep
    2026-08-20: held-out F1 0.590 / mIoU 0.550 at step 400 (0.603 at 600,
    plateaued) -> floor F1 >= 0.45 / mIoU >= 0.45 at the best of two
    checkpoints (400/600)."""
    losses, scored = _train_multi_and_score_heldout(
        quality_cfg_ol(), tmp_path, n_train=4, n_test=3,
        steps_list=(400, 600), lr=4e-3)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])
    assert max(tr["F1"] for tr, _ in scored) >= 0.8, scored
    best = max((te for _, te in scored), key=lambda a: a["F1"])
    assert best["F1"] >= 0.45, scored
    assert best["miou"] >= 0.45, scored


def test_synthetic_generalization_f1_floor_multiscale(tmp_path):
    """Held-out gate, multi-scale preset (VERDICT r4 #5 — this preset
    previously had only an overfit gate). Calibration (2026-08-21,
    1-core CPU host, HIGHEST precision): held-out F1 0.538/0.556, mIoU
    0.655/0.664 at steps 400/600 -> floors F1 >= 0.40 / mIoU >= 0.45
    with the same chaotic-toy-trajectory margin policy as the VIL gate
    (pinned to the weakest observed environment, far above the ~0 a real
    learning-dynamics regression produces)."""
    losses, scored = _train_multi_and_score_heldout(
        quality_cfg_ms(), tmp_path, n_train=4, n_test=3,
        steps_list=(400, 600), lr=4e-3)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])
    assert max(tr["F1"] for tr, _ in scored) >= 0.8, scored
    best = max((te for _, te in scored), key=lambda a: a["F1"])
    assert best["F1"] >= 0.40, scored
    assert best["miou"] >= 0.45, scored


def test_synthetic_generalization_f1_floor_propagate(tmp_path):
    """Held-out gate, prior-propagation preset (VERDICT r4 #5).
    Calibration (2026-08-21, same host/policy): held-out F1 0.500/0.509,
    mIoU 0.681/0.649 at steps 400/600 -> floors F1 >= 0.38 /
    mIoU >= 0.45."""
    losses, scored = _train_multi_and_score_heldout(
        quality_cfg_prop(), tmp_path, n_train=4, n_test=3,
        steps_list=(400, 600), lr=4e-3)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])
    assert max(tr["F1"] for tr, _ in scored) >= 0.8, scored
    best = max((te for _, te in scored), key=lambda a: a["F1"])
    assert best["F1"] >= 0.38, scored
    assert best["miou"] >= 0.45, scored


def test_synthetic_overfit_f1_floor_multiscale(tmp_path):
    """Multi-scale preset gate (measured sweep 2026-08-19: lr=4e-3 seed=7
    reaches F1=1.000 / mIoU 0.942 by step 200)."""
    losses, agg = _overfit_and_score(quality_cfg_ms(), tmp_path)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert agg["F1"] >= 0.9, agg
    assert agg["miou"] >= 0.75, agg


def test_synthetic_overfit_f1_floor_propagate(tmp_path):
    """Prior-propagation preset gate (measured sweep 2026-08-19: lr=4e-3
    seed=7 reaches F1=1.000 by step 200; later steps degrade at this lr,
    so the gate scores exactly at 200). The mIoU at step 200 is unstable
    across machines (measured 0.93 on one host, 0.65 on another — the
    overfit trajectory at this lr is chaotic and fma/fusion differences
    diverge it), so only a loose mIoU floor is pinned; F1 is the gate
    criterion and is stable."""
    losses, agg = _overfit_and_score(quality_cfg_prop(), tmp_path)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert agg["F1"] >= 0.9, agg
    assert agg["miou"] >= 0.6, agg


def test_synthetic_overfit_f1_floor_ol(tmp_path):
    """Same gate through the OpenLane preset's full path (soft routing,
    separate offsets head, window-5 memory, blend_cls criterion). The toy
    overfit trajectory is non-monotonic (router/branch dynamics), so the
    gate scores two checkpoints and requires the BEST to clear the floor
    — it tests the pipeline's ability to express the solution, not
    optimizer monotonicity. (Measured sweep: lr=4e-3 reaches F1=1.0 by
    step 200 and mIoU>=0.93 from step 400; lr=2e-3 stalls near 0.78 at
    step 800.)"""
    import glob

    cfg = quality_cfg_ol()
    model = PHNet(cfg.model)
    ds = SyntheticVideoDataset(
        n_videos=1, frames_per_video=4, img_h=H, img_w=W,
        spec=cfg.model.lane, max_lanes=cfg.model.max_lanes, seed=7)
    clip = ds[0]
    frames = jnp.asarray(clip["frames"])[None]
    labels = jnp.asarray(clip["labels"])[None]

    tcfg = dataclasses.replace(cfg.train, learning_rate=4e-3)
    tx = build_optimizer(tcfg, total_steps=2500)
    state = create_train_state(
        model, cfg.model, jax.random.key(0), frames, labels, tx)
    step = jax.jit(make_train_step(
        model, LaneCriterion(cfg.model, tcfg.loss), tx))

    def score(state, tag):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred_dir = str(tmp_path / f"pred{tag}")
        anno_dir = str(tmp_path / f"anno{tag}")
        pipe = InferencePipeline(cfg, variables, chunk=4)
        stats = pipe.run_and_emit(ds, pred_dir, anno_dir, fmt="vil")
        assert stats["frames"] == 4
        results = []
        for pf in sorted(glob.glob(
                os.path.join(pred_dir, "*", "*.lines.txt"))):
            af = pf.replace(pred_dir, anno_dir)
            results.append(culane_metric(
                read_lines_txt(pf), read_lines_txt(af), (H, W, 3)))
        return aggregate_results(results)

    losses, aggs = [], []
    for i in range(600):
        state, metrics = step(state, frames, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))
        if i + 1 in (400, 600):
            aggs.append(score(state, str(i + 1)))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    best_f1 = max(a["F1"] for a in aggs)
    best_miou = max(a["miou"] for a in aggs)
    assert best_f1 >= 0.9, aggs
    assert best_miou >= 0.75, aggs
