"""Evaluation stack tests: emission round-trip, CULane metric, temporal metric."""

import numpy as np
import pytest

from phnet_tpu.evaluation import (
    aggregate_results,
    aggregate_temporal,
    culane_match,
    culane_metric,
    read_lines_txt,
    temporal_metric_video,
    write_gt_txt,
    write_pred_txt,
)
from phnet_tpu.geometry import Lane

SHAPE = (384, 768, 3)


def lane_pts(x0, slope, n=10, y0=380, y1=100):
    ys = np.linspace(y0, y1, n)
    return [(x0 + slope * (y0 - y), float(y)) for y in ys]


def test_culane_metric_perfect_match():
    lanes = [lane_pts(200, 0.2), lane_pts(500, -0.1)]
    tp, fp, fn, ious, hits = culane_metric(lanes, lanes, SHAPE)
    assert (tp, fp, fn) == (2, 0, 0)
    np.testing.assert_allclose(ious, 1.0, atol=1e-6)


def test_culane_metric_miss_and_false_positive():
    anno = [lane_pts(200, 0.2), lane_pts(500, -0.1)]
    pred = [lane_pts(205, 0.2), lane_pts(700, 0.3)]  # one close, one bogus
    tp, fp, fn, ious, hits = culane_metric(pred, anno, SHAPE)
    assert tp == 1 and fp == 1 and fn == 1
    assert hits.tolist() == [True, False]


def test_culane_metric_empty_cases():
    lanes = [lane_pts(300, 0.0)]
    assert culane_metric([], lanes, SHAPE)[:3] == (0, 0, 1)
    assert culane_metric(lanes, [], SHAPE)[:3] == (0, 1, 0)


def test_aggregate_results():
    lanes = [lane_pts(200, 0.2)]
    r1 = culane_metric(lanes, lanes, SHAPE)
    r2 = culane_metric([lane_pts(700, 0.3)], lanes, SHAPE)
    agg = aggregate_results([r1, r2])
    assert agg["TP"] == 1 and agg["FP"] == 1 and agg["FN"] == 1
    assert 0 < agg["F1"] < 1
    assert 0 < agg["miou"] <= 1


def test_emission_roundtrip(tmp_path):
    pts = np.stack([np.linspace(0.3, 0.5, 8), np.linspace(0.2, 1.0, 8)], 1)
    lane = Lane(points=pts)
    p = write_pred_txt(str(tmp_path), "vid0", "00000", [lane], (1080, 1920), "vil")
    back = read_lines_txt(p)
    assert len(back) == 1
    # reversed order, int coords of x*W, y*H
    assert back[0][0] == (int(0.5 * 1920), int(1.0 * 1080))
    # OL half-scale + crop offset
    p2 = write_pred_txt(str(tmp_path), "vid0", "00001", [lane], (800, 1920), "ol")
    back2 = read_lines_txt(p2)
    np.testing.assert_allclose(back2[0][0], (0.5 * 1920 / 2, (1.0 * 800 + 480) / 2), atol=0.05)
    # short lanes skipped
    short = Lane(points=pts[:2])
    p3 = write_pred_txt(str(tmp_path), "vid0", "00002", [short], (1080, 1920), "vil")
    assert read_lines_txt(p3) == []


def test_gt_emission(tmp_path):
    pts = np.array(lane_pts(300, 0.1))
    p = write_gt_txt(str(tmp_path), "vid0", "00000", [pts])
    back = read_lines_txt(p)
    assert len(back) == 1 and len(back[0]) == len(pts)


def test_temporal_metric_stable_vs_flicker():
    anno_f = [lane_pts(200, 0.2), lane_pts(500, -0.1)]
    shapes = [SHAPE] * 3
    annos = [anno_f] * 3
    # stable predictions: both lanes every frame
    preds = [anno_f] * 3
    ns, nj, nm = temporal_metric_video(annos, preds, shapes)
    assert (ns, nj, nm) == (4, 0, 0)
    # flicker: second lane missing in the middle frame only
    preds2 = [anno_f, [anno_f[0]], anno_f]
    ns, nj, nm = temporal_metric_video(annos, preds2, shapes)
    assert nj == 2 and ns == 2 and nm == 0
    # fully missed lane: 2 transitions x (lane0 stable, lane1 missed)
    preds3 = [[anno_f[0]]] * 3
    ns, nj, nm = temporal_metric_video(annos, preds3, shapes)
    assert (ns, nj, nm) == (2, 0, 2)
    agg = aggregate_temporal([(ns, nj, nm)])
    assert agg["Rs"] == 0.5 and agg["Rm"] == 0.5


def test_culane_match_shapes():
    a = [lane_pts(200, 0.2)]
    b = [lane_pts(210, 0.2), lane_pts(600, 0.0)]
    row, col, ious = culane_match(a, b, SHAPE)
    assert ious.shape == (1, 2)
    assert row.tolist() == [0]


# ---------------------------------------------------------------------------
# frozen fixtures (datalist + shape list), reference format compatibility
# ---------------------------------------------------------------------------
def test_fixture_freeze_roundtrip(tmp_path):
    from phnet_tpu.evaluation.fixtures import (
        freeze, load_datalist, load_shape_list, pairs_from_datalist,
    )

    entries = ["vidA/00000", "vidA/00003", "vidB/00010"]
    shapes = [(720, 1280, 3)] * 3
    paths = freeze(entries, str(tmp_path), "VIL", shapes)
    assert load_datalist(paths["txt"]) == entries
    assert load_datalist(paths["pickle"]) == entries
    assert load_shape_list(paths["shape_list"]) == shapes
    pairs = pairs_from_datalist(entries, "/p", "/a")
    assert pairs[0] == ("/p/vidA/00000.lines.txt", "/a/vidA/00000.lines.txt")
    assert len(pairs) == 3


def test_fixture_reads_reference_pickles():
    """Our loader must consume the reference's own pinned fixtures."""
    import os

    ref = "/root/reference/evaluation"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not mounted")
    from phnet_tpu.evaluation.fixtures import load_datalist, load_shape_list

    dl = load_datalist(os.path.join(ref, "datalistVIL.pickle"))
    txt = load_datalist(os.path.join(ref, "datalistVIL.txt"))
    assert dl == txt and len(dl) == 2000
    shapes = load_shape_list(os.path.join(ref, "shape_list.pickle"))
    assert len(shapes) == len(dl) and len(shapes[0]) == 3


def test_fixture_enumerate_vil100(tmp_path):
    """enumerate_vil100 matches the datalist entry format <video>/<frame>."""
    import json

    import yaml

    from phnet_tpu.evaluation.fixtures import enumerate_vil100, freeze

    root = tmp_path / "d"
    (root / "VIL100" / "data").mkdir(parents=True)
    yaml.safe_dump(
        {"sequences": [{"name": "v_test", "set": "test"},
                       {"name": "v_train", "set": "train"}]},
        open(root / "VIL100" / "data" / "db_info.yaml", "w"))
    for vid in ("v_test", "v_train"):
        (root / "VIL100" / "Json" / vid).mkdir(parents=True)
        for i in range(3):
            json.dump({}, open(
                root / "VIL100" / "Json" / vid / f"{i:05d}.jpg.json", "w"))
    entries = enumerate_vil100(str(root), "test")
    assert entries == ["v_test/00000", "v_test/00001", "v_test/00002"]
    freeze(entries, str(tmp_path / "fx"), "VIL")
