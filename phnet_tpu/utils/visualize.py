"""Lane visualization utilities.

Equivalents of the reference's scattered debug renderers:
``imshow_lanes`` (``transformV4.py:325-339``), ``visWhileTrain`` /
``visWhileTest`` (``RouterV4.py:540-563``, ``Router4OL.py:586-636``) — but
writing image files instead of blocking ``cv2.imshow`` windows.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import cv2
import numpy as np

from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
from ..geometry import Lane

COLORS = [
    (255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64),
    (255, 64, 255), (64, 255, 255), (255, 160, 64), (160, 64, 255),
]


def denormalize_frame(frame: np.ndarray) -> np.ndarray:
    """Normalized [H, W, 3] float -> uint8 RGB."""
    img = (frame * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def draw_lane_points(img: np.ndarray, points: np.ndarray,
                     color=(0, 255, 0), thickness: int = 3) -> np.ndarray:
    pts = np.asarray(points)
    pts = pts[(pts[:, 0] >= 0) & (pts[:, 1] >= 0)].astype(np.int32)
    for p1, p2 in zip(pts[:-1], pts[1:]):
        cv2.line(img, tuple(p1), tuple(p2), color, thickness)
    return img


def render_frame(
    frame: np.ndarray,
    lanes: Sequence[Lane],
    gt_points: Optional[Sequence[np.ndarray]] = None,
    normalized: bool = True,
) -> np.ndarray:
    """Overlay predicted Lanes (colored) and optional GT polylines (white).

    frame: [H, W, 3] (normalized floats or uint8);
    lanes: Lane objects in normalized coords; gt_points in pixel coords.
    """
    img = denormalize_frame(frame) if normalized else frame.copy()
    h, w = img.shape[:2]
    if gt_points is not None:
        for pts in gt_points:
            draw_lane_points(img, pts, color=(255, 255, 255), thickness=5)
    for i, lane in enumerate(lanes):
        pts = lane.points * np.array([w, h])
        draw_lane_points(img, pts, color=COLORS[i % len(COLORS)])
    return img


def save_video_visualization(
    frames: np.ndarray,
    lanes_per_frame: Sequence[Sequence[Lane]],
    out_dir: str,
    gt_points: Optional[Sequence] = None,
    prefix: str = "frame",
) -> List[str]:
    """Render every frame of a clip to ``out_dir/<prefix>_xxxxx.png``."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for t, (frame, lanes) in enumerate(zip(frames, lanes_per_frame)):
        gt = gt_points[t] if gt_points is not None else None
        img = render_frame(frame, lanes, gt)
        path = os.path.join(out_dir, f"{prefix}_{t:05d}.png")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(path)
    return paths
