"""Native C++ evaluator vs an EXACT transcription of the official scorer.

``phnet_tpu/evaluation/official_oracle.py`` reproduces the reference
binary's semantics verbatim (spline.cpp splineInterpTimes + cal_fun TDMA,
cv::line rasterization at the configured thickness, the hungarianGraph.hpp
KM matcher with its 1e-2 slack, counter.cpp counting). That makes it the
ground truth for the repo's own dependency-free native evaluator
(``native/culane_eval.cpp``), whose documented deviations (single
chord-length spline, round-capped stamping) were previously only
cross-checked against the independent python LaneATT metric.

Round 4: the native evaluator is now an EXACT port (per-segment official
spline, a pixel-exact replica of this OpenCV's integer thick-line
rasterizer incl. its inflate-by-thickness pre-clip, the verbatim KM
matcher) — NEAR_EPS is 0: TP/FP/FN and per-frame mious must agree
exactly at every threshold, including on an enlarged adversarial fixture
holding 500+ matched pairs engineered to sit within 0.02 of the
threshold (test_near_threshold_exactness).
"""

import os
from pathlib import Path

import numpy as np
import pytest

from phnet_tpu.evaluation import native_eval as ne
from phnet_tpu.evaluation import read_lines_txt
from phnet_tpu.evaluation.official_oracle import (
    _km_match, official_count_im_pair, official_evaluate,
    official_lane_similarity, spline_interp_times,
)

from test_native_eval import H, W, synthetic_pairs  # noqa: F401 (fixture)

NEAR_EPS = 0.0

pytestmark = pytest.mark.skipif(
    not ne.native_available(), reason="native evaluator not buildable")


# ---------- oracle self-checks -------------------------------------------
def test_spline_straight_line_stays_straight():
    pts = [(100.0, 380.0), (120.0, 300.0), (140.0, 220.0), (160.0, 140.0)]
    res = spline_interp_times(pts, 50)
    # all interped points lie on x = 100 + 0.25*(380-y)
    xs_expect = 100.0 + 0.25 * (380.0 - res[:, 1])
    np.testing.assert_allclose(res[:, 0], xs_expect, atol=1e-3)
    np.testing.assert_allclose(res[0], pts[0], atol=1e-5)
    np.testing.assert_allclose(res[-1], pts[-1], atol=1e-5)


def test_spline_two_point_linear():
    res = spline_interp_times([(0.0, 0.0), (50.0, 100.0)], 50)
    assert len(res) == 51
    np.testing.assert_allclose(res[:, 1], np.linspace(0, 100, 51), atol=1e-4)
    np.testing.assert_allclose(res[:, 0], res[:, 1] / 2.0, atol=1e-4)


def test_km_match_total_weight_near_optimal():
    """The official KM (with its 1e-2 slack) must reach the optimal
    assignment weight up to slack * min(m, n)."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(3)
    for _ in range(20):
        m, n = rng.integers(1, 6, 2)
        mat = rng.uniform(0, 1, (m, n))
        match = _km_match([list(r) for r in mat])
        got = sum(mat[i][j] for i, j in enumerate(match) if j >= 0)
        ri, ci = linear_sum_assignment(-mat)
        best = mat[ri, ci].sum()
        assert got >= best - 1e-2 * min(m, n) - 1e-9, (mat, match)
        # 1:1 matching
        used = [j for j in match if j >= 0]
        assert len(used) == len(set(used))


def test_lane_similarity_identity_and_disjoint():
    lane = [(200.0, 380.0), (220.0, 300.0), (250.0, 200.0)]
    far = [(600.0, 380.0), (620.0, 300.0), (650.0, 200.0)]
    assert official_lane_similarity(lane, lane, H, W, 30) == 1.0
    assert official_lane_similarity(lane, far, H, W, 30) == 0.0
    assert official_lane_similarity([(1.0, 2.0)], lane, H, W, 30) == 0.0


def test_count_im_pair_empty_semantics():
    lane = [(200.0, 380.0), (220.0, 300.0), (250.0, 200.0)]
    r = official_count_im_pair([], [], H, W)
    assert (r["tp"], r["fp"], r["fn"], r["miou"]) == (0, 0, 0, 1.0)
    r = official_count_im_pair([], [lane], H, W)
    assert (r["tp"], r["fp"], r["fn"], r["miou"]) == (0, 1, 0, 0.0)
    r = official_count_im_pair([lane], [], H, W)
    assert (r["tp"], r["fp"], r["fn"], r["miou"]) == (0, 0, 1, 0.0)


# ---------- native evaluator vs the official oracle -----------------------
@pytest.mark.parametrize("iou_thr", [0.5, 0.8])
def test_native_vs_official_oracle(synthetic_pairs, iou_thr):  # noqa: F811
    """NEAR_EPS == 0: the exact port must agree frame-by-frame with the
    oracle — no near-threshold flips allowed anywhere."""
    assert NEAR_EPS == 0.0
    nat = ne.evaluate_pairs(synthetic_pairs, W, H, 30, iou_thr)
    tot = {"tp": 0, "fp": 0, "fn": 0}
    sim_sum, n_pred = 0.0, 0
    miou_sum = 0.0
    for pf, af in synthetic_pairs:
        anno, det = read_lines_txt(af), read_lines_txt(pf)
        o = official_count_im_pair(anno, det, H, W, 30, iou_thr)
        n1 = ne.evaluate_pairs([(pf, af)], W, H, 30, iou_thr)
        assert (o["tp"], o["fp"], o["fn"]) == \
            (n1["TP"], n1["FP"], n1["FN"]), (pf, o, n1)
        assert abs(o["miou"] - n1["miou_official"]) < 1e-12, (pf, o, n1)
        for k in ("tp", "fp", "fn"):
            tot[k] += o[k]
        sim_sum += sum(o["sim"])
        n_pred += len(det)
        miou_sum += o["miou"]

    assert (tot["tp"], tot["fp"], tot["fn"]) == \
        (nat["TP"], nat["FP"], nat["FN"])
    # raw IoU mass, same weighting as the native aggregate
    assert abs(sim_sum / n_pred - nat["miou"]) < 1e-9, (
        sim_sum / n_pred, nat["miou"])
    # the official aggregate: mean per-frame miou (evaluate.cpp:170-187)
    assert abs(miou_sum / len(synthetic_pairs) - nat["miou_official"]) < 1e-9


def test_official_aggregate_shape(synthetic_pairs):  # noqa: F811
    frames = [(read_lines_txt(af), read_lines_txt(pf))
              for pf, af in synthetic_pairs]
    agg = official_evaluate(frames, H, W, 30, 0.5)
    assert agg["tp"] + agg["fn"] == sum(len(a) for a, _ in frames)
    assert 0.0 <= agg["F1"] <= 1.0
    assert 0.0 <= agg["miou"] <= 1.0


# ---------- enlarged near-threshold adversarial fixture -------------------
def _write_frame(path, lanes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for lane in lanes:
            f.write(" ".join(f"{x:.2f} {y:.2f}" for x, y in lane) + "\n")


def _slanted(base_x, y_bot, y_top, slope, curv=0.0, step=16.0):
    ys = np.arange(y_bot, y_top, -step, dtype=float)
    if len(ys) < 2 or ys[-1] != y_top:
        ys = np.append(ys, y_top)
    dy = y_bot - ys
    xs = base_x + slope * dy + curv * dy * dy
    return [(float(x), float(y)) for x, y in zip(xs, ys)]


@pytest.mark.parametrize("iou_thr", [0.5, 0.8])
def test_near_threshold_exactness(tmp_path, iou_thr):
    """VERDICT r3 #3 'done' gate: >= 500 matched pairs whose official IoU
    sits within 0.02 of the threshold, frame-level TP/FP/FN and per-frame
    miou EXACTLY equal between the native evaluator and the oracle (zero
    flips; NEAR_EPS = 0).

    Near-threshold pairs are engineered by truncating the prediction to a
    fraction of the GT lane: for a band of length L and cap-padded area
    ~(L + w), IoU of a truncated copy ~ (L' + w)/(L + w), so the cut
    height steers the IoU continuously through the threshold; lateral
    jitter, curvature, 2-point straight lanes (the unsplined long-segment
    path incl. its out-of-canvas clip) and off-image tails are mixed in."""
    rng = np.random.default_rng(99 + int(iou_thr * 10))
    y_bot, y_top_full = H - 4.0, H * 0.35
    L = y_bot - y_top_full
    w = 30.0
    # starting guess for the pred length at IoU ~= thr (subset-band
    # model); a one-step secant against the oracle similarity then lands
    # each pair within ~0.01 of the threshold
    crit = iou_thr * (L + w) - w
    dlp_dsim = 260.0  # measured locally: d(length)/d(sim) ~ L + w

    def truncated(make_pred, lp0):
        """Secant-calibrate the cut length so sim(gt, pred) ~= thr."""
        s0 = official_lane_similarity(gt, make_pred(lp0), H, W, 30)
        lp = min(max(lp0 + (iou_thr - s0) * dlp_dsim, 40.0), L - 4.0)
        return make_pred(lp + float(rng.uniform(-1.0, 1.0)))

    pairs = []
    n_frames = 680
    for i in range(n_frames):
        base_x = float(rng.uniform(90, W - 90))
        slope = float(rng.uniform(-0.55, 0.55))
        curv = float(rng.uniform(-8e-4, 8e-4))
        gt = _slanted(base_x, y_bot, y_top_full, slope, curv)
        kind = i % 4
        if kind == 0:  # truncated copy, IoU steered through thr
            pred = truncated(
                lambda lp: _slanted(base_x, y_bot, y_bot - lp, slope, curv),
                crit)
        elif kind == 1:  # truncation + sub-pixel lateral jitter
            jx = float(rng.uniform(-0.8, 0.8))
            pred = truncated(
                lambda lp: _slanted(base_x + jx, y_bot, y_bot - lp, slope,
                                    curv), crit)
        elif kind == 2:  # 2-point straight lanes (no spline; long segment)
            gt = [gt[0], gt[-1]]
            dxl, dyl = gt[1][0] - gt[0][0], gt[1][1] - gt[0][1]
            pred = truncated(
                lambda lp: [gt[0], (gt[0][0] + dxl * (lp / L),
                                    gt[0][1] + dyl * (lp / L))], crit)
        else:  # off-image tail: GT wanders out the side, pred truncated
            bx = 60.0 if slope < 0 else W - 60.0
            gt = _slanted(bx, y_bot, y_top_full, slope * 2.2, curv)
            pred = truncated(
                lambda lp: _slanted(bx, y_bot, y_bot - lp, slope * 2.2,
                                    curv), crit)
        a = str(tmp_path / "anno" / "v" / f"f{i}.lines.txt")
        p = str(tmp_path / "pred" / "v" / f"f{i}.lines.txt")
        _write_frame(a, [gt])
        _write_frame(p, [pred])
        pairs.append((p, a))

    n_near = 0
    for pf, af in pairs:
        anno, det = read_lines_txt(af), read_lines_txt(pf)
        o = official_count_im_pair(anno, det, H, W, 30, iou_thr)
        n1 = ne.evaluate_pairs([(pf, af)], W, H, 30, iou_thr)
        assert (o["tp"], o["fp"], o["fn"]) == \
            (n1["TP"], n1["FP"], n1["FN"]), (pf, o, n1)
        assert abs(o["miou"] - n1["miou_official"]) < 1e-12, (pf, o, n1)
        n_near += sum(abs(s - iou_thr) < 0.02 for s in o["sim"])

    # the fixture must actually be adversarial: >= 500 matched pairs with
    # official IoU within 0.02 of the threshold
    assert n_near >= 500, n_near


def test_sub_two_point_lanes_count_as_lanes(tmp_path):
    """read_lane_file (evaluate.cpp:208-233) keeps every text line as a
    lane — including 1-point and empty lines; they score similarity 0 but
    count toward FP/FN. The native parser must mirror that."""
    gt = [(300.0, 380.0), (320.0, 200.0)]
    a = str(tmp_path / "a.lines.txt")
    p = str(tmp_path / "p.lines.txt")
    _write_frame(a, [gt, [(5.0, 5.0)]])       # GT: one real + one 1-point
    with open(p, "w") as f:                    # pred: one real + one EMPTY
        f.write(" ".join(f"{x:.2f} {y:.2f}" for x, y in gt) + "\n\n")
    n1 = ne.evaluate_pairs([(p, a)], W, H, 30, 0.5)
    # oracle with the official keep-all parse
    o = official_count_im_pair([gt, [(5.0, 5.0)]], [gt, []], H, W, 30, 0.5)
    assert (o["tp"], o["fp"], o["fn"]) == (n1["TP"], n1["FP"], n1["FN"])
    assert (n1["TP"], n1["FP"], n1["FN"]) == (1, 1, 1)
