"""Exact python transcription of the official CULane evaluator.

The reference scores with a C++/OpenCV binary
(``/root/reference/evaluation/culane/src``): per frame, each lane polyline
is densified by per-segment natural cubic splines sampled 50x per input
segment (``spline.cpp:7-46`` ``splineInterpTimes`` + ``cal_fun``
:104-178), drawn into a byte mask with ``cv::line(thickness=w)``
(``lane_compare.cpp:10-57``), pairwise pixel IoU is Kuhn-Munkres-matched
(``hungarianGraph.hpp:6-71``, ``counter.cpp:139-161``) and TP counted at
IoU > threshold (``counter.cpp:112-135``).

This module reproduces those semantics EXACTLY (same spline math in
float64 on float32 points, the same ``cv2.line`` rasterizer, the same KM
matcher including its 1e-2 slack and early-out) so it can serve as the
oracle for the repo's own dependency-free native evaluator
(``native/culane_eval.cpp``), whose documented spline/raster deviations
are otherwise only cross-checked against the python LaneATT metric.
It is a test oracle, not a production scorer — it is O(lanes^2) python
per frame and exists to bound the native evaluator's deviation.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is in the image; stay importable
    cv2 = None


def _cal_fun(pts: np.ndarray):
    """``Spline::cal_fun`` (spline.cpp:104-178): natural cubic spline in the
    chord-length parameter, solved by TDMA. pts: [n, 2] float64, n >= 3.
    Returns list of per-segment coefficient dicts."""
    n = len(pts)
    h = np.sqrt(((pts[1:] - pts[:-1]) ** 2).sum(-1))  # [n-1]
    a = h[:-1].copy()                                  # A[i] = h[i]
    b = 2.0 * (h[:-1] + h[1:])                         # B[i]
    c = h[1:].copy()                                   # C[i]
    dx = 6.0 * ((pts[2:, 0] - pts[1:-1, 0]) / h[1:]
                - (pts[1:-1, 0] - pts[:-2, 0]) / h[:-1])
    dy = 6.0 * ((pts[2:, 1] - pts[1:-1, 1]) / h[1:]
                - (pts[1:-1, 1] - pts[:-2, 1]) / h[:-1])
    # TDMA forward sweep (spline.cpp:139-148)
    c[0] /= b[0]
    dx[0] /= b[0]
    dy[0] /= b[0]
    for i in range(1, n - 2):
        tmp = b[i] - a[i] * c[i - 1]
        c[i] /= tmp
        dx[i] = (dx[i] - a[i] * dx[i - 1]) / tmp
        dy[i] = (dy[i] - a[i] * dy[i - 1]) / tmp
    mx = np.zeros(n)
    my = np.zeros(n)
    mx[n - 2] = dx[n - 3]
    my[n - 2] = dy[n - 3]
    for i in range(n - 4, -1, -1):  # spline.cpp:151-155
        mx[i + 1] = dx[i] - c[i] * mx[i + 2]
        my[i + 1] = dy[i] - c[i] * my[i + 2]
    mx[0] = mx[n - 1] = 0.0
    my[0] = my[n - 1] = 0.0

    funcs = []
    for i in range(n - 1):
        funcs.append({
            "a_x": pts[i, 0],
            "b_x": (pts[i + 1, 0] - pts[i, 0]) / h[i]
                   - (2.0 * h[i] * mx[i] + h[i] * mx[i + 1]) / 6.0,
            "c_x": mx[i] / 2.0,
            "d_x": (mx[i + 1] - mx[i]) / (6.0 * h[i]),
            "a_y": pts[i, 1],
            "b_y": (pts[i + 1, 1] - pts[i, 1]) / h[i]
                   - (2.0 * h[i] * my[i] + h[i] * my[i + 1]) / 6.0,
            "c_y": my[i] / 2.0,
            "d_y": (my[i + 1] - my[i]) / (6.0 * h[i]),
            "h": h[i],
        })
    return funcs


def spline_interp_times(points: Sequence[Tuple[float, float]],
                        times: int = 50) -> np.ndarray:
    """``Spline::splineInterpTimes`` (spline.cpp:7-46). points are treated
    as float32 (cv::Point2f) and the result is rounded back to float32, as
    the C++ stores Point2f."""
    pts = np.asarray(points, np.float32).astype(np.float64)
    if len(pts) == 2:
        k = np.arange(times + 1, dtype=np.float64)
        res = pts[0] + (pts[1] - pts[0]) * (k / times)[:, None]
        return res.astype(np.float32)
    if len(pts) < 2:
        return pts.astype(np.float32)
    funcs = _cal_fun(pts)
    out = []
    for f in funcs:
        delta = f["h"] / times
        for k in range(times):
            t1 = delta * k
            out.append((
                f["a_x"] + f["b_x"] * t1 + f["c_x"] * t1**2 + f["d_x"] * t1**3,
                f["a_y"] + f["b_y"] * t1 + f["c_y"] * t1**2 + f["d_y"] * t1**3,
            ))
    out.append(tuple(pts[-1]))
    return np.asarray(out, np.float32)


def _draw_lane(lane: np.ndarray, im_h: int, im_w: int, width: int):
    """``lane_compare.cpp:20-48``: interp (3+ points) then cv::line segments
    of the given thickness into a CV_8UC1 of ones. Point2f -> Point uses
    saturate_cast<int> == cvRound (round half to even), matched here with
    np.rint."""
    im = np.zeros((im_h, im_w), np.uint8)
    p = spline_interp_times(lane, 50) if len(lane) > 2 else np.asarray(
        lane, np.float32)
    pi = np.rint(p.astype(np.float64)).astype(np.int64)
    for n in range(len(pi) - 1):
        cv2.line(im, (int(pi[n, 0]), int(pi[n, 1])),
                 (int(pi[n + 1, 0]), int(pi[n + 1, 1])), 1, width)
    return im


def official_lane_similarity(lane1, lane2, im_h: int, im_w: int,
                             width: int = 30) -> float:
    """``LaneCompare::get_lane_similarity`` — pixel IoU of the two drawn
    bands; 0 for lanes with fewer than 2 points."""
    if len(lane1) < 2 or len(lane2) < 2:
        return 0.0
    im1 = _draw_lane(lane1, im_h, im_w, width)
    im2 = _draw_lane(lane2, im_h, im_w, width)
    s1 = float(im1.sum())
    s2 = float(im2.sum())
    inter = float((im1 * im2).sum())
    union = s1 + s2 - inter
    return inter / union if union else 0.0


def _km_match(mat: List[List[float]]) -> List[int]:
    """``pipartiteGraph::match`` (hungarianGraph.hpp:6-71) verbatim,
    including the 1e-2 feasibility slack and the d==1e10 early return.
    Returns left-side match indices (-1 = unmatched)."""
    m, n = len(mat), len(mat[0])
    exchange = m > n
    if exchange:
        mat = [[mat[j][i] for j in range(m)] for i in range(n)]
        m, n = n, m
    left_w = [max(row) for row in mat]
    right_w = [0.0] * n
    left_match = [-1] * m
    right_match = [-1] * n

    def dfs(u, lu, ru):
        lu[u] = True
        for v in range(n):
            if not ru[v] and abs(left_w[u] + right_w[v] - mat[u][v]) < 1e-2:
                ru[v] = True
                if right_match[v] == -1 or dfs(right_match[v], lu, ru):
                    right_match[v] = u
                    left_match[u] = v
                    return True
        return False

    for u in range(m):
        while True:
            lu = [False] * m
            ru = [False] * n
            if dfs(u, lu, ru):
                break
            d = 1e10
            for i in range(m):
                if lu[i]:
                    for j in range(n):
                        if not ru[j]:
                            d = min(d, left_w[i] + right_w[j] - mat[i][j])
            if d == 1e10:
                return right_match if exchange else left_match
            for i in range(m):
                if lu[i]:
                    left_w[i] -= d
            for j in range(n):
                if ru[j]:
                    right_w[j] += d
    return right_match if exchange else left_match


def official_count_im_pair(
    anno_lanes, detect_lanes, im_h: int, im_w: int,
    width: int = 30, iou_thr: float = 0.5,
) -> Dict[str, float]:
    """``Counter::count_im_pair`` (counter.cpp:73-136): similarity matrix,
    KM match, TP at similarity > threshold; per-frame miou = summed matched
    similarity / len(detect) (1 for empty-empty, 0 when one side empty)."""
    na, nd = len(anno_lanes), len(detect_lanes)
    if na == 0 and nd == 0:
        return {"tp": 0, "fp": 0, "fn": 0, "miou": 1.0, "sim": []}
    if na == 0:
        return {"tp": 0, "fp": nd, "fn": 0, "miou": 0.0, "sim": []}
    if nd == 0:
        return {"tp": 0, "fp": 0, "fn": na, "miou": 0.0, "sim": []}
    sim = [[official_lane_similarity(a, d, im_h, im_w, width)
            for d in detect_lanes] for a in anno_lanes]
    anno_match = _km_match(sim)
    tp = 0
    iou_sum = 0.0
    matched_sims = []
    for i in range(na):
        j = anno_match[i]
        if j >= 0:
            iou_sum += sim[i][j]
            matched_sims.append(sim[i][j])
        if j >= 0 and sim[i][j] > iou_thr:
            tp += 1
    return {"tp": tp, "fp": nd - tp, "fn": na - tp,
            "miou": iou_sum / nd, "sim": matched_sims}


def official_evaluate(
    frames: Sequence[Tuple[list, list]], im_h: int, im_w: int,
    width: int = 30, iou_thr: float = 0.5,
) -> Dict[str, float]:
    """Aggregate like ``evaluate.cpp:170-187``: sums of tp/fp/fn, mean of
    per-frame miou over ALL frames."""
    tp = fp = fn = 0
    miou = 0.0
    for anno, det in frames:
        r = official_count_im_pair(anno, det, im_h, im_w, width, iou_thr)
        tp += r["tp"]
        fp += r["fp"]
        fn += r["fn"]
        miou += r["miou"]
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision,
            "recall": recall, "F1": f1,
            "miou": miou / max(len(frames), 1)}
