"""Multi-scale deformable attention sampling, TPU-native.

Reference: the SeqFormer CUDA extension
(``libs/models/SeqFormer/ops/src/cuda/ms_deform_attn_cuda.cu``) with the
torch fallback ``ms_deform_attn_core_pytorch``
(``libs/models/SeqFormer/ops/functions/ms_deform_attn_func.py:42-64``):
per (query, head, level, point), bilinearly sample the value map and
reduce with softmaxed attention weights.

TPU mapping: instead of the CUDA ``im2col`` walk (or torch's per-level
``grid_sample``), each level's 4 bilinear corners become batched gathers
(``take_along_axis`` over the flattened H*W axis) with the corner weights
applied as one fused VPU expression; levels are a static Python loop
(3-4 iterations) so everything jits to fixed shapes, and the op is
differentiable end-to-end (gather transposes to scatter-add). No
``im2col_step`` batching is needed — XLA tiles the gathers itself.

``grid_sample(align_corners=False, padding_mode='zeros')`` semantics are
reproduced exactly: grid g in [-1, 1] maps to pixel x = ((g+1)*W - 1)/2,
i.e. loc*W - 0.5 for loc in [0, 1]; out-of-bounds corners contribute 0.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Core sampling op.

    Args:
      value: ``[N, S, M, D]`` — all levels' features flattened and
        concatenated along S = sum(H_l * W_l); M heads, D per-head dim.
      spatial_shapes: static ``((H0, W0), ...)`` per level.
      sampling_locations: ``[N, Lq, M, L, P, 2]`` in [0, 1] (x, y).
      attention_weights: ``[N, Lq, M, L, P]``, softmaxed over (L, P).

    Returns:
      ``[N, Lq, M * D]`` (matches the CUDA kernel's output layout).
    """
    n, s, m, d = value.shape
    _, lq, _, nl, p, _ = sampling_locations.shape
    assert nl == len(spatial_shapes), (nl, spatial_shapes)
    assert s == sum(h * w for h, w in spatial_shapes), (s, spatial_shapes)

    out = jnp.zeros((n, m, lq, d), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        # [N, M, HW, D]: head-major so the gather batches over (N, M)
        v = value[:, start : start + h * w].transpose(0, 2, 1, 3)
        start += h * w

        loc = sampling_locations[:, :, :, lvl]  # [N, Lq, M, P, 2]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0

        wts = attention_weights[:, :, :, lvl]  # [N, Lq, M, P]
        acc = jnp.zeros((n, m, lq * p, d), value.dtype)
        for dy, wy in ((0, 1.0 - ty), (1, ty)):
            for dx, wx in ((0, 1.0 - tx), (1, tx)):
                cx = x0 + dx
                cy = y0 + dy
                inside = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
                idx = (
                    jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
                ).astype(jnp.int32)
                # [N, M, Lq*P] rows into the HW axis
                idx = idx.transpose(0, 2, 1, 3).reshape(n, m, lq * p)
                g = jnp.take_along_axis(v, idx[..., None], axis=2)
                cw = (wy * wx * inside.astype(value.dtype)).transpose(
                    0, 2, 1, 3).reshape(n, m, lq * p)
                acc = acc + g * cw[..., None]
        acc = acc.reshape(n, m, lq, p, d)
        wl = wts.transpose(0, 2, 1, 3)  # [N, M, Lq, P]
        out = out + jnp.einsum("nmqpd,nmqp->nmqd", acc, wl)

    # [N, M, Lq, D] -> [N, Lq, M*D]
    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d)
