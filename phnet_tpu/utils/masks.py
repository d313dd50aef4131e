"""Segmentation mask utilities.

Equivalents of the reference's ``libs/utils/utility.py``: ``write_mask``
(indexed-PNG segmentation output, :27), ``mask_iou`` (:72), plus the one-hot
converters from ``dataV3.py:45-57``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

# default palette: reference COLORS table (transformV4.py:14-36)
DEFAULT_PALETTE = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (191, 0, 0),
]


def convert_mask_to_one_hot(mask: np.ndarray, max_obj: int) -> np.ndarray:
    """Index mask [H, W] -> one-hot [H, W, max_obj+1] (``dataV3.py:45-51``)."""
    return np.stack([mask == k for k in range(max_obj + 1)], axis=2)


def convert_one_hot_to_mask(oh: np.ndarray, max_obj: int) -> np.ndarray:
    mask = np.zeros(oh.shape[:2], dtype=np.uint8)
    for k in range(max_obj + 1):
        mask[oh[:, :, k] == 1] = k
    return mask


def mask_iou(pred: np.ndarray, target: np.ndarray, eps: float = 1e-7) -> float:
    """Mean per-instance mask IoU (``utility.py:72-82``): pred/target
    [K, H, W] binary stacks."""
    pred = np.asarray(pred) > 0.5
    target = np.asarray(target) > 0.5
    inter = (pred & target).reshape(pred.shape[0], -1).sum(-1)
    union = (pred | target).reshape(pred.shape[0], -1).sum(-1)
    return float(((inter + eps) / (union + eps)).mean())


def write_mask(mask: np.ndarray, path: str,
               palette: Optional[Sequence] = None,
               indexed: bool = True,
               image: Optional[np.ndarray] = None) -> str:
    """Save a segmentation mask; indexed-PNG with palette (the reference's
    ``save_indexed_format``), else an overlay on the original image."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if indexed:
        im = Image.fromarray(mask.astype(np.uint8), mode="P")
        pal = palette if palette is not None else DEFAULT_PALETTE
        flat = [c for rgb in pal for c in rgb]
        flat += [0] * (768 - len(flat))
        im.putpalette(flat)
        im.save(path)
    else:
        assert image is not None
        overlay = image.copy()
        pal = palette if palette is not None else DEFAULT_PALETTE
        for k in range(1, int(mask.max()) + 1):
            overlay[mask == k] = pal[k % len(pal)]
        blend = (0.5 * image + 0.5 * overlay).astype(np.uint8)
        Image.fromarray(blend).save(path)
    return path


def topk_accuracy(pred: np.ndarray, target: np.ndarray,
                  topk: Sequence[int] = (1,)) -> list:
    """Top-k classification accuracy (reference ``libs/utils/accuracy.py``)."""
    maxk = max(topk)
    order = np.argsort(-pred, axis=1)[:, :maxk]
    correct = order == target[:, None]
    return [float(correct[:, :k].any(axis=1).mean()) * 100.0 for k in topk]
