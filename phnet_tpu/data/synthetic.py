"""Synthetic video lane clips — datasets are not shipped with the repo, so
tests, benchmarks and the end-to-end smoke path generate clips with known
geometry: bright lane stripes on a textured road that drift smoothly over
time (exercising the temporal memory), plus full fixed-shape labels via the
real label encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..config import LaneSpec
from ..geometry import encode_lane_label
from .transforms import Normalize


def _lane_points(x_bottom: float, slope: float, curve: float,
                 y_top: float, img_h: int, n: int = 24) -> np.ndarray:
    ys = np.linspace(img_h - 1, y_top, n)
    d = (img_h - 1 - ys)
    xs = x_bottom + slope * d + curve * d * d / max(img_h, 1)
    return np.stack([xs, ys], 1).astype(np.float32)


def synthetic_clip(
    seed: int,
    t: int,
    img_h: int = 384,
    img_w: int = 768,
    n_lanes: int = 3,
    spec: Optional[LaneSpec] = None,
    max_lanes: int = 8,
    drift: float = 2.0,
    normalize: bool = True,
) -> Dict:
    """Generate one clip.

    Returns dict with:
      frames:  [T, H, W, 3] float32 (ImageNet-normalized if requested)
      labels:  [T, max_lanes, spec.dim]
      points:  per-frame list of lane point arrays (resized image coords)
    """
    spec = spec or LaneSpec()
    rng = np.random.default_rng(seed)
    norm = Normalize()

    base_x = np.sort(rng.uniform(0.15, 0.85, n_lanes)) * img_w
    slopes = rng.uniform(-0.35, 0.35, n_lanes)
    curves = rng.uniform(-0.1, 0.1, n_lanes)
    y_tops = rng.uniform(0.15, 0.4, n_lanes) * img_h
    vx = rng.uniform(-drift, drift, n_lanes)

    frames, labels, points_all = [], [], []
    for ti in range(t):
        img = np.full((img_h, img_w, 3), 70, np.uint8)
        noise = rng.integers(0, 30, (img_h // 8, img_w // 8, 3), dtype=np.uint8)
        img = np.clip(
            img.astype(np.int16)
            + cv2.resize(noise, (img_w, img_h)).astype(np.int16) - 15,
            0, 255,
        ).astype(np.uint8)
        lanes_pts: List[np.ndarray] = []
        for i in range(n_lanes):
            pts = _lane_points(
                base_x[i] + vx[i] * ti, slopes[i], curves[i], y_tops[i], img_h)
            inside = (pts[:, 0] >= 0) & (pts[:, 0] < img_w)
            if inside.sum() < 2:
                continue
            draw = pts.astype(np.int32)
            for p1, p2 in zip(draw[:-1], draw[1:]):
                cv2.line(img, tuple(p1), tuple(p2), (230, 230, 230), 4)
            lanes_pts.append(pts)
        # bottom-to-top point ordering for the encoder
        sorted_lanes = [p[np.argsort(-p[:, 1])] for p in lanes_pts]
        label = encode_lane_label(
            [list(map(tuple, p)) for p in sorted_lanes],
            list(range(len(sorted_lanes))),
            spec, img_h, img_w, max_lanes,
        )
        frames.append(norm(img) if normalize else img.astype(np.float32))
        labels.append(label)
        points_all.append(sorted_lanes)

    return {
        "frames": np.stack(frames),
        "labels": np.stack(labels),
        "points": points_all,
        "size": (img_h, img_w),
    }


@dataclass
class SyntheticVideoDataset:
    """Dataset-shaped wrapper: N videos of `frames_per_video` frames."""

    n_videos: int = 4
    frames_per_video: int = 8
    img_h: int = 384
    img_w: int = 768
    spec: LaneSpec = None
    max_lanes: int = 8
    seed: int = 0

    def __post_init__(self):
        self.spec = self.spec or LaneSpec()
        self.videos = [f"synth_{i:03d}" for i in range(self.n_videos)]
        self.max_skip = 0  # curriculum no-ops for synthetic data

    def __len__(self):
        return self.n_videos

    def increase_max_skip(self):
        pass

    def set_max_skip(self, max_skip: int):
        self.max_skip = max_skip

    def __getitem__(self, idx: int) -> Dict:
        return self.get_clip(idx)

    def get_clip(self, idx: int, t: Optional[int] = None,
                 start: int = 0) -> Dict:
        t = t or self.frames_per_video
        clip = synthetic_clip(
            seed=self.seed * 1000 + idx,
            t=start + t,
            img_h=self.img_h, img_w=self.img_w,
            spec=self.spec, max_lanes=self.max_lanes,
        )
        return {
            "name": self.videos[idx],
            "frames": clip["frames"][start:],
            "labels": clip["labels"][start:],
            "points": clip["points"][start:],
            "size": clip["size"],
            "frame_names": [f"{i:05d}" for i in range(start, start + t)],
        }
