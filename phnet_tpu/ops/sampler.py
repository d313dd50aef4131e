"""Bilinear feature sampling (``F.grid_sample`` equivalent).

The reference pools anchor features with
``F.grid_sample(feat, grid, align_corners=True)`` (``RouterV4.py:135-153``,
padding_mode='zeros'). On TPU this is a gather + weighted sum that XLA fuses
well; no custom kernel needed at these sizes (240 anchors x 36 points).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` at fractional pixel locations with zero padding.

    Args:
      feat: ``[C, H, W]`` feature map.
      x, y: broadcast-compatible arrays of *pixel* coordinates (already in
        ``align_corners=True`` convention: 0 .. W-1 / 0 .. H-1).

    Returns:
      ``[..., C]`` sampled values (leading dims = shape of x/y).
    """
    c, h, w = feat.shape
    x = jnp.asarray(x, feat.dtype)
    y = jnp.asarray(y, feat.dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = feat[:, yc, xc]  # [C, ...]
        vals = jnp.moveaxis(vals, 0, -1)  # [..., C]
        return jnp.where(valid[..., None], vals, 0.0)

    out = (
        gather(y0, x0) * (wy0 * wx0)[..., None]
        + gather(y0, x1) * (wy0 * wx1)[..., None]
        + gather(y1, x0) * (wy1 * wx0)[..., None]
        + gather(y1, x1) * (wy1 * wx1)[..., None]
    )
    return out


def pool_prior_features(
    feat: jnp.ndarray, prior_xs: jnp.ndarray, prior_feat_ys: jnp.ndarray
) -> jnp.ndarray:
    """Pool anchor features along each prior's sample points.

    Reference ``RouterV4.py:135-153`` ``pool_prior_features``: xs/ys are
    normalized to [0, 1]; grid_sample maps them to pixels with
    ``align_corners=True`` (0 -> 0, 1 -> size-1).

    Args:
      feat: ``[C, H, W]``.
      prior_xs: ``[A, P]`` normalized x per anchor sample point.
      prior_feat_ys: ``[P]`` normalized y of the sample rows.

    Returns:
      ``[A, P, C]``.
    """
    _, h, w = feat.shape
    px = prior_xs * (w - 1)
    py = jnp.broadcast_to(prior_feat_ys[None, :], prior_xs.shape) * (h - 1)
    return bilinear_sample(feat, px, py)
