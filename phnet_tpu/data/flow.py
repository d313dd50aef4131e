"""Dense optical flow utilities (Farneback).

Equivalent of the reference's ``libs/utils/calcFlow.py``: two-frame
Farneback flow with foreground/background masking, offline generation of
quantized u/v grayscale jpgs for the VIL-100 ``Flow/`` directory, and the
matching dequantization used by the dataset reader (``dataV3.py:168-176``).

The active model does not consume flow (the DFF warp module is disabled in
the reference, ``RouterV4.py:16``); these utilities keep the data-prep
capability available.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

FARNEBACK_PARAMS = (0.5, 3, 15, 3, 5, 1.2, 0)
BOUND = 100.0  # quantization clamp, reference dataV3.py:104


def dense_two_frame_flow(
    prev_img: np.ndarray,
    next_img: np.ndarray,
    prev_mask: Optional[np.ndarray] = None,
    next_mask: Optional[np.ndarray] = None,
    params: Sequence[float] = FARNEBACK_PARAMS,
) -> np.ndarray:
    """Farneback flow next->prev in pixels, shape [H, W, 2]; optionally
    zeroed outside the union of the two masks (lane foreground)."""
    g0 = cv2.cvtColor(prev_img, cv2.COLOR_BGR2GRAY) if prev_img.ndim == 3 else prev_img
    g1 = cv2.cvtColor(next_img, cv2.COLOR_BGR2GRAY) if next_img.ndim == 3 else next_img
    flow = cv2.calcOpticalFlowFarneback(g0, g1, None, *params)
    if prev_mask is not None and next_mask is not None:
        m0 = prev_mask if prev_mask.ndim == 2 else prev_mask.any(-1)
        m1 = next_mask if next_mask.ndim == 2 else next_mask.any(-1)
        fg = (m0 > 0) | (m1 > 0)
        flow = np.where(fg[..., None], flow, 0.0)
    return flow.astype(np.float32)


def quantize_flow(flow: np.ndarray, bound: float = BOUND) -> Tuple[np.ndarray, np.ndarray]:
    """Flow -> two uint8 grayscale images (the reference's u/v jpgs,
    ``calcFlow.py:141-150``)."""
    q = np.clip((flow + bound) / (2 * bound) * 255.0, 0, 255).astype(np.uint8)
    return q[..., 0], q[..., 1]


def dequantize_flow(u: np.ndarray, v: np.ndarray, img_h: int, img_w: int,
                    bound: float = BOUND) -> np.ndarray:
    """Grayscale jpgs -> normalized flow in [-1, 1] per axis
    (``dataV3.py:168-176``)."""
    flow = np.stack([u, v], -1).astype(np.float32)
    flow = flow * 2 * bound / 255.0 - bound
    flow[..., 0] /= img_w
    flow[..., 1] /= img_h
    return flow


def generate_flow_jpgs(img_dir: str, out_dir: str, frames: Sequence[str]):
    """Offline flow-jpg generation for one video (``make_flow_from_VIL``,
    ``calcFlow.py:104-160``): flow of frame t computed against frame t-1
    (frame 0 against itself)."""
    os.makedirs(out_dir, exist_ok=True)
    prev = None
    for name in frames:
        img = cv2.imread(os.path.join(img_dir, name + ".jpg"))
        flow = dense_two_frame_flow(prev if prev is not None else img, img)
        u, v = quantize_flow(flow)
        cv2.imwrite(os.path.join(out_dir, name + "u.jpg"), u)
        cv2.imwrite(os.path.join(out_dir, name + "v.jpg"), v)
        prev = img
