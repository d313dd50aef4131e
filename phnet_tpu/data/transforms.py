"""Host-side image + lane-geometry transforms (numpy/cv2).

Equivalent of the reference's imgaug pipelines (``transformV4.py:95-123``
built from ``optionsV3.py:50-88``; OL variant ``openlane/transforms.py``):
resize, horizontal flip, channel shuffle, brightness multiply/add,
hue/saturation shift, motion/median blur, affine
(translate/rotate/scale), then a final resize — each applied with its
configured probability, with lane polylines transformed alongside the
pixels. Runs on the host data path; the device only ever sees fixed-shape
tensors.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

Lanes = List[np.ndarray]  # list of (N, 2) float arrays (x, y)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Normalize:
    """(img/255 - mean) / std (reference ``transform.py:194-203``)."""

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return ((img.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def resize_with_lanes(img: np.ndarray, lanes: Lanes, out_h: int, out_w: int
                      ) -> Tuple[np.ndarray, Lanes]:
    h, w = img.shape[:2]
    out = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    sx, sy = out_w / w, out_h / h
    new_lanes = [l * np.array([sx, sy], np.float32) for l in lanes]
    return out, new_lanes


def _clip_segment(p0: np.ndarray, p1: np.ndarray, h: int, w: int):
    """Liang-Barsky clip of segment p0->p1 against [0,w)x[0,h).

    Returns (q0, q1) or None when fully outside. Mirrors shapely's
    box-intersection that imgaug's ``clip_out_of_image_`` performs on each
    LineString (``transformV4.py:246``): crossings are interpolated onto
    the border instead of dropping the whole out-of-image run."""
    d = p1 - p0
    t0, t1 = 0.0, 1.0
    for num, den in (
        (p0[0] - 0.0, -d[0]),        # left:   x >= 0
        ((w - 1e-3) - p0[0], d[0]),  # right:  x <= w-eps
        (p0[1] - 0.0, -d[1]),        # top:    y >= 0
        ((h - 1e-3) - p0[1], d[1]),  # bottom: y <= h-eps
    ):
        if den == 0.0:
            if num < 0.0:
                return None
            continue
        t = num / den
        if den < 0.0:
            if t > t1:
                return None
            t0 = max(t0, t)
        else:
            if t < t0:
                return None
            t1 = min(t1, t)
    if t0 > t1:
        return None
    return p0 + t0 * d, p0 + t1 * d


def _clip_lanes(lanes: Lanes, h: int, w: int,
                ids: Optional[Sequence[int]] = None
                ) -> Tuple[Lanes, List[int]]:
    """Clip lane polylines to the image rectangle, interpolating border
    crossings (imgaug ``clip_out_of_image_`` LineString semantics,
    transformV4.py:246). Where the clip splits a lane into several pieces
    (lane exits and re-enters the frame) the piece with the most points is
    kept — lanes are near-monotone lines so this is rare. A lane reduced
    to <2 points is dropped *together with its id* so callers keying label
    rows by lane id stay aligned (reference keys rows by ``lane_id``,
    transformV4.py:183-216)."""
    out: Lanes = []
    out_ids: List[int] = []
    for i, l in enumerate(lanes):
        pieces: List[List[np.ndarray]] = []
        cur: List[np.ndarray] = []
        for a, b in zip(l[:-1], l[1:]):
            seg = _clip_segment(a.astype(np.float64), b.astype(np.float64),
                                h, w)
            if seg is None:
                if len(cur) >= 2:
                    pieces.append(cur)
                cur = []
                continue
            q0, q1 = seg
            if cur and np.allclose(cur[-1], q0, atol=1e-6):
                cur.append(q1)
            else:
                if len(cur) >= 2:
                    pieces.append(cur)
                cur = [q0, q1]
        if len(cur) >= 2:
            pieces.append(cur)
        if not pieces:
            continue
        best = max(pieces, key=len)
        pts = np.asarray(best, np.float32)
        # collapse consecutive duplicates the clipping may introduce
        keep = np.ones(len(pts), bool)
        keep[1:] = np.any(np.abs(np.diff(pts, axis=0)) > 1e-6, axis=1)
        pts = pts[keep]
        if len(pts) >= 2:
            out.append(pts)
            out_ids.append(i if ids is None else ids[i])
    return out, out_ids


@dataclass
class TrainAugment:
    """Probabilistic augmentation pipeline; VIL defaults from
    ``optionsV3.py:50-88``. Use ``ol_defaults()`` for the OpenLane knobs."""

    img_h: int = 384
    img_w: int = 768
    p_hflip: float = 0.1
    p_channel_shuffle: float = 0.1
    p_brightness: float = 0.5
    brightness_mul: Tuple[float, float] = (0.85, 1.15)
    brightness_add: Tuple[float, float] = (-10, 10)
    p_hue_sat: float = 0.5
    hue_sat_value: Tuple[float, float] = (-10, 10)
    p_blur: float = 0.2
    p_affine: float = 0.5
    translate: float = 0.1
    rotate_deg: float = 3.0
    scale: Tuple[float, float] = (0.95, 1.05)
    rng: np.random.Generator = field(default_factory=np.random.default_rng)

    @classmethod
    def ol_defaults(cls, img_h=384, img_w=768, rng=None):
        """OL 'complex' pipeline (``openlane/transforms.py:198-247``)."""
        return cls(img_h=img_h, img_w=img_w, p_hflip=0.0, p_channel_shuffle=0.1,
                   p_brightness=0.5, p_hue_sat=0.5, p_blur=0.1, p_affine=0.1,
                   rotate_deg=5.0, scale=(0.9, 1.1),
                   rng=rng or np.random.default_rng())

    def __call__(self, img: np.ndarray, lanes: Lanes,
                 ids: Optional[Sequence[int]] = None,
                 seg: Optional[np.ndarray] = None,
                 flow: Optional[np.ndarray] = None):
        """Returns ``(img, lanes)`` or, when ``ids`` is given, ``(img,
        lanes, ids)`` with the ids of dropped lanes removed in sync; when
        ``seg``/``flow`` are given they are appended to the tuple.

        ``seg`` (integer mask) and ``flow`` (float [H, W, 2]) ride the same
        *geometric* ops as the image — resize/flip/affine — and skip the
        photometric ones, matching the reference's imgaug call where the
        mask is a SegmentationMapsOnImage (nearest resize, geometry only)
        and the flow a HeatmapsOnImage (linear resize, geometry only;
        imgaug flips heatmaps spatially WITHOUT negating the u component,
        transformV4.py:236-246 — reproduced as-is)."""
        rng = self.rng
        img, lanes = resize_with_lanes(img, lanes, self.img_h, self.img_w)
        h, w = img.shape[:2]
        if seg is not None:
            seg = cv2.resize(seg, (w, h), interpolation=cv2.INTER_NEAREST)
        if flow is not None:
            flow = cv2.resize(flow, (w, h), interpolation=cv2.INTER_LINEAR)

        if rng.random() < self.p_hflip:
            img = img[:, ::-1].copy()
            lanes = [np.stack([w - 1 - l[:, 0], l[:, 1]], 1) for l in lanes]
            if seg is not None:
                seg = seg[:, ::-1].copy()
            if flow is not None:
                flow = flow[:, ::-1].copy()

        if rng.random() < self.p_channel_shuffle:
            img = img[..., rng.permutation(3)]

        if rng.random() < self.p_brightness:
            mul = rng.uniform(*self.brightness_mul)
            add = rng.uniform(*self.brightness_add)
            img = np.clip(img.astype(np.float32) * mul + add, 0, 255).astype(np.uint8)

        if rng.random() < self.p_hue_sat:
            # imgaug AddToHueAndSaturation(value=..., per_channel=False):
            # ONE value sampled per image, added to hue AND saturation; the
            # hue shift is rescaled to OpenCV's [0,180) wheel (value*180/255)
            # and wraps, saturation saturates.
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int16)
            v = rng.uniform(*self.hue_sat_value)
            hsv[..., 0] = (hsv[..., 0] + int(round(v * 180.0 / 255.0))) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] + int(round(v)), 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)

        if rng.random() < self.p_blur:
            if rng.random() < 0.5:  # OneOf(MotionBlur, MedianBlur)
                k = int(rng.choice([3, 5]))  # medianBlur needs odd k
                img = cv2.medianBlur(img, k)
            else:  # motion blur: 1-D kernel at random angle, k in [3, 5]
                k = int(rng.integers(3, 6))
                kernel = np.zeros((k, k), np.float32)
                kernel[k // 2, :] = 1.0 / k
                ang = rng.uniform(0, 360)
                rot = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), ang, 1.0)
                kernel = cv2.warpAffine(kernel, rot, (k, k))
                kernel /= max(kernel.sum(), 1e-6)
                img = cv2.filter2D(img, -1, kernel)

        if rng.random() < self.p_affine:
            tx = rng.uniform(-self.translate, self.translate) * w
            ty = rng.uniform(-self.translate, self.translate) * h
            ang = rng.uniform(-self.rotate_deg, self.rotate_deg)
            sc = rng.uniform(*self.scale)
            m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
            m[:, 2] += (tx, ty)
            img = cv2.warpAffine(img, m, (w, h))
            if seg is not None:
                seg = cv2.warpAffine(seg, m, (w, h),
                                     flags=cv2.INTER_NEAREST)
            if flow is not None:
                flow = cv2.warpAffine(flow, m, (w, h))
            new_lanes = []
            for l in lanes:
                ones = np.ones((len(l), 1), np.float32)
                pts = np.concatenate([l, ones], 1) @ m.T
                new_lanes.append(pts.astype(np.float32))
            lanes = new_lanes

        lanes, kept_ids = _clip_lanes(lanes, h, w, ids)
        out = (img, lanes)
        if ids is not None:
            out = out + (kept_ids,)
        if seg is not None:
            out = out + (seg,)
        if flow is not None:
            out = out + (flow,)
        return out
