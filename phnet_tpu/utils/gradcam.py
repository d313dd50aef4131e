"""Grad-CAM feature visualization.

Equivalent of the reference's ``grad_cam.py`` (torch forward/backward
hooks on a chosen layer): PHNet exposes ``encode`` / ``detect`` as separate
methods, so the class-score gradient w.r.t. any FPN level is literally
``jax.grad`` of the detection score through ``detect`` — no hook machinery.
"""

from __future__ import annotations

from typing import Callable, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def grad_cam(
    model,
    variables,
    frames: jnp.ndarray,
    level: int = 0,
    score_fn: Optional[Callable] = None,
) -> np.ndarray:
    """CAM heatmaps for a clip.

    Args:
      model: PHNet instance.
      variables: model variables.
      frames: [1, T, H, W, 3] normalized clip.
      level: FPN level index (0 = finest stride-8 map).
      score_fn(outs): scalar objective; default = sum of positive-class
        logits over the NMS-kept lanes (the reference backpropagates the
        predicted class score).

    Returns: [T, H, W] float heatmaps in [0, 1].
    """
    if score_fn is None:
        def score_fn(outs):
            return jnp.where(outs.kept_valid, outs.kept[..., 1], 0.0).sum()

    feats = model.apply(variables, frames, train=False, method="encode")

    def score(feat_l):
        all_feats = tuple(
            feat_l if i == level else f for i, f in enumerate(feats)
        )
        outs, _ = model.apply(variables, all_feats, None, method="detect")
        return score_fn(outs)

    grads = jax.grad(score)(feats[level])  # [T, B, h, w, c]

    f = np.asarray(feats[level], np.float32)[:, 0]   # [T, h, w, c]
    g = np.asarray(grads, np.float32)[:, 0]
    weights = g.mean(axis=(1, 2), keepdims=True)      # GAP of gradients
    cam = np.maximum((f * weights).sum(-1), 0.0)      # [T, h, w]
    cam = cam / (cam.max(axis=(1, 2), keepdims=True) + 1e-8)
    out_h, out_w = frames.shape[2], frames.shape[3]
    return np.stack([
        cv2.resize(c, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
        for c in cam
    ])


def overlay_cam(image: np.ndarray, cam: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Blend a CAM heatmap over an RGB uint8 image (``grad_cam.py:5-28``)."""
    heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    return ((1 - alpha) * image + alpha * heat).astype(np.uint8)
