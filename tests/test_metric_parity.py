"""Reference-direct metric parity.

Imports the ACTUAL reference scoring code — ``evaluation/evaluateVIL.py``'s
``culane_metric`` (the LaneATT python CULane metric the reference's
published numbers are quoted from, ``evaluateVIL.py:58-77``) and
``evaluation/evalTemporalVIL.py``'s ``LaneEval_Temporal`` matcher
(``:121-294``) — with only its process-pool/shapely imports stubbed, and
compares our ``evaluation/culane_metric.py`` and ``evaluation/temporal.py``
on randomized synthetic lane sets: TP/FP/FN, per-prediction IoUs, and
Ns/Nj/Nm must agree exactly.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from test_reference_parity import _stub, ref  # noqa: F401

from phnet_tpu.evaluation.culane_metric import culane_metric
from phnet_tpu.evaluation.temporal import temporal_metric_video

REF_EVAL = "/root/reference/evaluation"


def _load_ref_module(name):
    _stub("p_tqdm", t_map=lambda f, *xs: list(map(f, *xs)),
          p_map=lambda f, *xs: list(map(f, *xs)))
    _stub("shapely")
    _stub("shapely.geometry", LineString=object, Polygon=object)
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF_EVAL, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_eval(ref):
    if not os.path.isdir(REF_EVAL):
        pytest.skip("reference evaluation tree not mounted")
    return types.SimpleNamespace(
        vil=_load_ref_module("evaluateVIL"),
        temporal=_load_ref_module("evalTemporalVIL"),
    )


def _random_lanes(rng, n_lanes, h, w, jitter=25.0):
    """Plausible lane polylines: mostly-vertical point chains bottom->top,
    float coords, variable point counts (>= 2 after dedup)."""
    lanes = []
    for _ in range(n_lanes):
        n_pts = int(rng.integers(2, 14))
        ys = np.sort(rng.uniform(0.25 * h, h - 1, n_pts))[::-1]
        x0 = rng.uniform(0.1 * w, 0.9 * w)
        slope = rng.uniform(-0.5, 0.5)
        xs = x0 + slope * (h - ys) + rng.normal(0, jitter, n_pts)
        xs = np.clip(xs, 0, w - 1)
        lane = [(float(x), float(y)) for x, y in zip(xs, ys)]
        if len(dict.fromkeys(lane)) >= 2:
            lanes.append(lane)
    return lanes


def _perturbed(rng, lanes, h, w, drop_p=0.25, extra_p=0.3, noise=12.0):
    """Predictions derived from GT: jittered copies, some dropped, some
    spurious — so TP/FP/FN and jitter counts all occur."""
    preds = []
    for lane in lanes:
        if rng.uniform() < drop_p:
            continue
        pts = [(float(np.clip(x + rng.normal(0, noise), 0, w - 1)),
                float(y)) for x, y in lane]
        if len(dict.fromkeys(pts)) >= 2:
            preds.append(pts)
    if rng.uniform() < extra_p:
        preds.extend(_random_lanes(rng, 1, h, w))
    return preds


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("iou_threshold", [0.5, 0.8])
def test_frame_metric_parity(ref_eval, seed, iou_threshold):
    """culane_metric == evaluateVIL.culane_metric per frame: TP/FP/FN
    exact, per-prediction IoUs to f64 noise. ~100 frames across the
    parametrization."""
    rng = np.random.default_rng(seed)
    h, w = 370, 640
    for frame in range(5):
        anno = _random_lanes(rng, int(rng.integers(0, 6)), h, w)
        pred = _perturbed(rng, anno, h, w)
        shape = (h, w, 3)
        ref_tp, ref_fp, ref_fn, ref_ious, ref_hits = ref_eval.vil.culane_metric(
            pred, anno, shape, width=30, iou_threshold=iou_threshold,
            official=True)
        tp, fp, fn, ious, hits = culane_metric(
            pred, anno, shape, width=30, iou_threshold=iou_threshold)
        assert (tp, fp, fn) == (ref_tp, ref_fp, ref_fn), (
            f"seed {seed} frame {frame}")
        np.testing.assert_allclose(ious, ref_ious, rtol=0, atol=1e-12,
                                   err_msg=f"seed {seed} frame {frame}")
        assert np.array_equal(hits, np.asarray(ref_hits, bool))


def _ref_temporal_video(ref_eval, annotations, predictions, shape,
                        iou_threshold):
    """Drive the actual LaneEval_Temporal state machine
    (evalTemporalVIL.py:199-294) on in-memory per-frame lane lists."""
    tmod = ref_eval.temporal
    v = tmod.LaneEval_Temporal(cfg=types.SimpleNamespace(num_t=1))
    v.num_t = 1
    v.iou_threshold = iou_threshold
    v.Ns = v.Nj = v.Nm = 0
    results_s = [tmod.culane_metric2(p, a, shape, width=30)
                 for p, a in zip(predictions, annotations)]
    ns = nj = nm = 0
    for j in range(len(annotations)):
        v.shape = shape
        if j == 0:
            v.forward_for_dict_initialization()
        else:
            v.forward_for_dict_memorization()
        v.data["pred"]["t-0"] = predictions[j]
        v.data["anno"]["t-0"] = annotations[j]
        v.data["results"]["t-0"] = results_s[j]
        v.memory_t += 1
        if j > 0:
            v.matching_lane_instance()  # NOTE: default 0.5 match threshold
            s, jj, m = v.metric_per_inter_frame()
            ns, nj, nm = ns + s, nj + jj, nm + m
    return ns, nj, nm


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("iou_threshold", [0.5, 0.8])
def test_temporal_metric_parity(ref_eval, seed, iou_threshold):
    """temporal_metric_video == the actual LaneEval_Temporal Ns/Nj/Nm
    counts over a synthetic video, incl. the reference's always-0.5
    GT-to-GT match threshold in the IoU-0.8 run."""
    rng = np.random.default_rng(seed + 40)
    h, w = 370, 640
    shape = (h, w, 3)
    t_frames = 6

    # temporally coherent GT: drift one base set across frames
    base = _random_lanes(rng, int(rng.integers(2, 5)), h, w, jitter=5.0)
    annotations, predictions = [], []
    for t in range(t_frames):
        anno = []
        for lane in base:
            pts = [(float(np.clip(x + 3.0 * t + rng.normal(0, 2), 0, w - 1)),
                    float(y)) for x, y in lane]
            anno.append(pts)
        # the reference's metric_per_inter_frame indexes `results` with
        # python-list [] placeholders when a frame has zero predictions
        # (culane_metric2:80-83) and would crash; keep >= 1 pred per frame
        pred = _perturbed(rng, anno, h, w, drop_p=0.35, noise=18.0)
        if not pred:
            pred = _perturbed(rng, anno, h, w, drop_p=0.0, noise=18.0)
        annotations.append(anno)
        predictions.append(pred)

    ref_counts = _ref_temporal_video(
        ref_eval, annotations, predictions, shape, iou_threshold)
    ours = temporal_metric_video(
        annotations, predictions, [shape] * t_frames, width=30,
        iou_threshold=iou_threshold)
    assert ours == ref_counts, f"seed {seed}: {ours} vs {ref_counts}"
    assert sum(ref_counts) > 0
