"""Tests for auxiliary utilities: flow, masks, tusimple accuracy, video
metrics, torch weight import, grad-CAM, dynamic-k assigner."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_flow_quantize_roundtrip():
    from phnet_tpu.data.flow import dequantize_flow, quantize_flow

    rng = np.random.default_rng(0)
    flow = rng.uniform(-80, 80, (16, 32, 2)).astype(np.float32)
    u, v = quantize_flow(flow)
    assert u.dtype == np.uint8
    back = dequantize_flow(u, v, img_h=16, img_w=32)
    np.testing.assert_allclose(back[..., 0] * 32, flow[..., 0], atol=0.8)
    np.testing.assert_allclose(back[..., 1] * 16, flow[..., 1], atol=0.8)


def test_farneback_flow_translation():
    from phnet_tpu.data.flow import dense_two_frame_flow

    rng = np.random.default_rng(1)
    base = (rng.uniform(0, 255, (64, 96)).astype(np.uint8))
    import cv2
    base = cv2.GaussianBlur(base, (7, 7), 2)
    shifted = np.roll(base, 3, axis=1)  # 3 px right shift
    flow = dense_two_frame_flow(base, shifted)
    inner = flow[16:-16, 16:-16, 0]
    assert abs(np.median(inner) - 3.0) < 1.0


def test_mask_utils(tmp_path):
    from phnet_tpu.utils.masks import (
        convert_mask_to_one_hot, convert_one_hot_to_mask, mask_iou,
        topk_accuracy, write_mask,
    )

    mask = np.zeros((8, 8), np.uint8)
    mask[:4] = 1
    mask[4:, :4] = 2
    oh = convert_mask_to_one_hot(mask, 3)
    assert oh.shape == (8, 8, 4)
    np.testing.assert_array_equal(convert_one_hot_to_mask(oh, 3), mask)
    assert mask_iou(oh.transpose(2, 0, 1)[1:3], oh.transpose(2, 0, 1)[1:3]) == pytest.approx(1.0)

    p = write_mask(mask, str(tmp_path / "m.png"))
    from PIL import Image
    back = np.array(Image.open(p))
    np.testing.assert_array_equal(back, mask)

    pred = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    acc1, acc2 = topk_accuracy(pred, np.array([1, 0, 0]), (1, 2))
    assert acc1 == pytest.approx(100 * 2 / 3)
    assert acc2 == pytest.approx(100.0)


def test_tusimple_accuracy():
    from phnet_tpu.evaluation.tusimple_acc import evaluate_accuracy

    def lane(x0, slope):
        ys = np.linspace(100, 380, 15)
        return np.stack([x0 + slope * (380 - ys), ys], 1)

    gt = [[lane(200, 0.2), lane(500, -0.1)]]
    res = evaluate_accuracy([[lane(202, 0.2), lane(500, -0.1)]], gt, img_h=384)
    assert res["accuracy"] > 0.95 and res["fp_rate"] == 0 and res["fn_rate"] == 0
    res2 = evaluate_accuracy([[lane(202, 0.2)]], gt, img_h=384)
    assert res2["fn_rate"] == pytest.approx(0.5)
    res3 = evaluate_accuracy([[lane(202, 0.2), lane(640, 0.3)]], gt, img_h=384)
    assert res3["fp_rate"] == pytest.approx(0.5)


def test_video_metrics():
    from phnet_tpu.evaluation.video_metrics import evaluate_video_masks, f_boundary, jaccard

    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    assert jaccard(m, m) == 1.0
    assert f_boundary(m, m) == 1.0
    shifted = np.roll(m, 2, axis=0)
    assert 0.5 < jaccard(m, shifted) < 1.0
    res = evaluate_video_masks([m] * 4, [m, m, shifted, shifted])
    assert res["J"]["mean"] > 0.8
    assert res["J"]["decay"] > 0  # quality drops over the clip


def test_torch_resnet_import_equivalence():
    """flax backbone with imported torch weights == the torch model."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    # torchvision-style resnet18 with canonical parameter names
    class Block(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = self.downsample(x) if self.downsample else x
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    class TorchResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(Block(64, 64), Block(64, 64))
            self.layer2 = tnn.Sequential(Block(64, 128, 2), Block(128, 128))
            self.layer3 = tnn.Sequential(Block(128, 256, 2), Block(256, 256))
            self.layer4 = tnn.Sequential(Block(256, 512, 2), Block(512, 512))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            outs = []
            for l in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = l(x)
                outs.append(x)
            return outs

    tmodel = TorchResNet18().eval()
    # randomize batch-norm stats so eval mode is nontrivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    from phnet_tpu.models.resnet import ResNetBackbone
    from phnet_tpu.utils.torch_import import import_resnet_state_dict

    backbone = ResNetBackbone(depth=18)
    x = np.random.default_rng(0).normal(size=(1, 64, 96, 3)).astype(np.float32)
    variables = backbone.init(jax.random.key(0), jnp.array(x), train=False)
    params, stats = import_resnet_state_dict(sd)
    # structure match
    assert set(params.keys()) == set(variables["params"].keys())
    outs_flax = backbone.apply(
        {"params": params, "batch_stats": stats}, jnp.array(x), train=False)
    with torch.no_grad():
        outs_torch = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for of, ot in zip(outs_flax, outs_torch):
        np.testing.assert_allclose(
            np.array(of), ot.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_grad_cam_runs():
    from phnet_tpu.models import PHNet
    from phnet_tpu.utils.gradcam import grad_cam, overlay_cam

    from test_model import tiny_cfg

    cfg = tiny_cfg()
    model = PHNet(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.array(rng.normal(size=(1, 2, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    cams = grad_cam(model, variables, frames, level=0)
    assert cams.shape == (2, cfg.img_h, cfg.img_w)
    assert np.all(cams >= 0) and np.all(cams <= 1 + 1e-6)
    img = np.zeros((cfg.img_h, cfg.img_w, 3), np.uint8)
    over = overlay_cam(img, cams[0])
    assert over.shape == img.shape


def test_dynamic_k_assign():
    from phnet_tpu.losses.assign import dynamic_k_assign

    a, l = 40, 3
    rng = np.random.default_rng(0)
    cost = jnp.array(rng.normal(size=(a, l)).astype(np.float32))
    iou = jnp.array(rng.uniform(0, 1, (a, l)).astype(np.float32))
    valid = jnp.array([True, True, False])
    match = np.array(dynamic_k_assign(cost, iou, valid))
    assert match.shape == (a, l)
    assert match[:, 2].sum() == 0  # invalid target unmatched
    assert match[:, 0].sum() >= 1 and match[:, 1].sum() >= 1
    assert np.all(match.sum(1) <= 1)  # each prior matched to <= 1 target


def test_dynamic_k_frame_recovers_obvious_assignment():
    """dynamic_k_frame (the ModelConfig.train_assigner="dynamic_k" SimOTA
    fast path) on near-perfect predictions must assign each valid target
    its own generating prior — agreeing with the Hungarian path — and
    satisfy the one-prior-per-target contract shapes."""
    from phnet_tpu.config import LaneSpec
    from phnet_tpu.losses.assign import assign_frame, dynamic_k_frame

    spec = LaneSpec(n_offsets=24, n_lengths=1)
    img_w, img_h = 192, 96
    a, l = 30, 4
    rng = np.random.default_rng(3)
    # targets: distinct, well-separated lanes (xs in px)
    targets = np.full((l, spec.dim), -1e5, np.float32)
    targets[:, 0], targets[:, 1] = 0.0, 1.0
    for i in range(l):
        targets[i, 2:5] = (0.0, 0.15 + 0.2 * i, 0.5)
        targets[i, spec.col_length] = 0.8
        targets[i, spec.col_xs:] = np.linspace(
            20 + 40 * i, 30 + 40 * i, spec.n_offsets)
    valid = np.array([True, True, True, False])

    preds = np.array(rng.normal(0, 0.02, (a, spec.dim)), np.float32)
    preds[:, :2] = (-4.0, -4.0)
    # priors 5/12/19 reproduce targets 0/1/2 (xs relative)
    for pi, ti in [(5, 0), (12, 1), (19, 2)]:
        preds[pi, :2] = (-4.0, 4.0)
        preds[pi, 2:5] = targets[ti, 2:5]
        preds[pi, spec.col_length] = targets[ti, spec.col_length]
        preds[pi, spec.col_xs:] = targets[ti, spec.col_xs:] / (img_w - 1)

    got = np.array(dynamic_k_frame(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(valid),
        spec, img_w, img_h))
    hung = np.array(assign_frame(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(valid),
        spec, img_w, img_h))
    assert got.shape == (l,) and got.dtype == np.int32
    np.testing.assert_array_equal(got[:3], [5, 12, 19])
    np.testing.assert_array_equal(got[:3], hung[:3])


def test_train_step_with_dynamic_k_assigner():
    """A train forward+backward with train_assigner="dynamic_k" runs and
    produces finite loss/grads (the SimOTA fast-path wiring)."""
    import dataclasses

    import jax

    from phnet_tpu.models import PHNet
    from test_model import make_labels, tiny_cfg

    cfg = dataclasses.replace(tiny_cfg(window=3), train_assigner="dynamic_k")
    model = PHNet(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.array(rng.normal(size=(1, 3, cfg.img_h, cfg.img_w, 3)),
                       jnp.float32)
    labels = make_labels(rng, 1, 3, cfg)
    variables = jax.jit(lambda r, f, l: model.init(r, f, l, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames, labels)

    def loss_fn(params):
        outs, _ = model.apply(
            {**variables, "params": params}, frames, labels, train=True,
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"])[0]
        return (outs.pred_sec.mean() + outs.pred_fir.mean())

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in flat)


def test_visualization(tmp_path):
    from phnet_tpu.data import synthetic_clip
    from phnet_tpu.geometry import Lane
    from phnet_tpu.utils.visualize import render_frame, save_video_visualization

    clip = synthetic_clip(seed=0, t=2, img_h=96, img_w=192)
    pts = np.stack([np.linspace(0.3, 0.5, 8), np.linspace(0.2, 1.0, 8)], 1)
    lanes = [[Lane(points=pts)]] * 2
    img = render_frame(clip["frames"][0], lanes[0], clip["points"][0])
    assert img.shape == (96, 192, 3) and img.dtype == np.uint8
    paths = save_video_visualization(
        clip["frames"], lanes, str(tmp_path), gt_points=clip["points"])
    assert len(paths) == 2
    import os
    assert all(os.path.exists(p) for p in paths)


def test_profiler_stage_breakdown():
    """Profiling subsystem (SURVEY §5.1 gap): stage timings + XLA cost
    analysis + roofline fields come back populated on a tiny model."""
    from test_model import tiny_cfg
    from phnet_tpu.utils.profiler import (
        cost_summary, format_breakdown, latency_profile, stage_breakdown,
    )

    report = stage_breakdown(tiny_cfg(), chunk=2, iters=1)
    assert set(report) == {"sync", "encode", "detect", "e2e", "nms"}
    for name in ("encode", "detect", "e2e"):
        r = report[name]
        assert r["ms_per_frame"] > 0
        assert r["flops"] > 0
        assert r["bound"] in ("compute", "memory")
        assert 0 <= r["mfu"]
    table = format_breakdown(report)
    assert "encode" in table and "GFLOP" in table

    # latency_profile on a trivial blocking step
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8, 8))
    lat = latency_profile(lambda: np.array(f(x)), iters=5, warmup=1)
    assert lat["p50_ms"] > 0 and lat["p99_ms"] >= lat["p50_ms"]

    cs = cost_summary(lambda x: x @ x, jnp.ones((64, 64)))
    assert cs["flops"] > 0 and cs["roofline_ms"] > 0


def test_xplane_parser_roundtrip(tmp_path):
    """Hand-encode a tiny XSpace protobuf on the wire and check the
    dependency-free parser recovers planes, op names, and durations."""
    from phnet_tpu.utils.xplane import (
        device_op_totals, find_xplane_files, op_report, parse_xspace,
    )

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def ld(fnum, payload):  # length-delimited field
        return varint((fnum << 3) | 2) + varint(len(payload)) + payload

    def vi(fnum, val):  # varint field
        return varint(fnum << 3) + varint(val)

    def event(mid, dur):
        return ld(4, vi(1, mid) + vi(3, dur))  # XLine.events

    def line(events):
        return ld(3, vi(1, 1) + ld(2, b"XLA Ops") + b"".join(events))

    def emeta(mid, name):
        entry = vi(1, mid) + ld(2, vi(1, mid) + ld(2, name.encode()))
        return ld(4, entry)  # XPlane.event_metadata map entry

    def plane(name, lines, metas):
        return ld(
            1, vi(1, 7) + ld(2, name.encode()) + b"".join(lines) + b"".join(metas)
        )

    tpu = plane(
        "/device:TPU:0",
        [line([event(1, 5_000_000), event(2, 1_000_000), event(1, 2_500_000)])],
        [emeta(1, "fusion.42"), emeta(2, "copy.7")],
    )
    host = plane("/host:CPU", [line([event(3, 9_000_000)])], [emeta(3, "python")])
    space = tpu + host

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "h.xplane.pb").write_bytes(space)

    files = find_xplane_files(str(tmp_path))
    assert len(files) == 1
    planes = parse_xspace(files[0])
    assert [p.name for p in planes] == ["/device:TPU:0", "/host:CPU"]

    rows = device_op_totals(planes)
    assert rows[0] == ("fusion.42", 7_500_000, 2)
    assert rows[1] == ("copy.7", 1_000_000, 1)
    # host plane excluded
    assert all(n != "python" for n, _, _ in rows)

    report = op_report(str(tmp_path), top=5)
    assert "fusion.42" in report and "TOTAL" in report
