"""Video-object-segmentation metrics over mask outputs.

Equivalents of the reference's ``evaluation/video_metrics/``: region
Jaccard J (``jaccard.py:13``) and boundary F-measure (``f_boundary.py:14``)
per frame, aggregated as mean / recall / decay like the DAVIS toolkit the
reference vendored.
"""

from __future__ import annotations

from typing import Dict, Sequence

import cv2
import numpy as np


def jaccard(seg: np.ndarray, gt: np.ndarray) -> float:
    """Region similarity J = |seg & gt| / |seg | gt|; 1.0 when both empty."""
    seg = np.asarray(seg, bool)
    gt = np.asarray(gt, bool)
    union = (seg | gt).sum()
    if union == 0:
        return 1.0
    return float((seg & gt).sum() / union)


def _mask_boundary(mask: np.ndarray) -> np.ndarray:
    m = np.asarray(mask, np.uint8)
    er = cv2.erode(m, np.ones((3, 3), np.uint8))
    return (m > 0) & (er == 0)


def f_boundary(seg: np.ndarray, gt: np.ndarray, bound_pix: int = 0) -> float:
    """Boundary F-measure: precision/recall of boundary pixels within a
    tolerance band (0.8% of the image diagonal by default)."""
    seg = np.asarray(seg, bool)
    gt = np.asarray(gt, bool)
    if not seg.any() and not gt.any():
        return 1.0
    if bound_pix <= 0:
        bound_pix = int(np.ceil(0.008 * np.linalg.norm(seg.shape)))
    fg = _mask_boundary(seg)
    gb = _mask_boundary(gt)
    k = 2 * bound_pix + 1
    kernel = np.ones((k, k), np.uint8)
    fg_dil = cv2.dilate(fg.astype(np.uint8), kernel) > 0
    gb_dil = cv2.dilate(gb.astype(np.uint8), kernel) > 0
    n_fg, n_gb = fg.sum(), gb.sum()
    if n_fg == 0 and n_gb > 0:
        return 0.0
    if n_gb == 0 and n_fg > 0:
        return 0.0
    precision = (fg & gb_dil).sum() / max(n_fg, 1)
    recall = (gb & fg_dil).sum() / max(n_gb, 1)
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def _statistics(per_frame: np.ndarray) -> Dict[str, float]:
    """DAVIS-style mean / recall(>0.5) / decay (first vs last quartile)."""
    per_frame = np.asarray(per_frame, float)
    n = len(per_frame)
    if n == 0:
        return {"mean": 0.0, "recall": 0.0, "decay": 0.0}
    quarters = np.array_split(per_frame, 4) if n >= 4 else [per_frame] * 4
    return {
        "mean": float(per_frame.mean()),
        "recall": float((per_frame > 0.5).mean()),
        "decay": float(quarters[0].mean() - quarters[3].mean()),
    }


def evaluate_video_masks(
    pred_masks: Sequence[np.ndarray], gt_masks: Sequence[np.ndarray]
) -> Dict[str, Dict[str, float]]:
    js = np.array([jaccard(p, g) for p, g in zip(pred_masks, gt_masks)])
    fs = np.array([f_boundary(p, g) for p, g in zip(pred_masks, gt_masks)])
    return {"J": _statistics(js), "F": _statistics(fs)}
