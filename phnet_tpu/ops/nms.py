"""Row-wise lane NMS.

TPU-native replacement for the reference CUDA extension
(``libs/ops/csrc/nms_kernel.cu``): instead of a bitmask kernel plus a
single-thread greedy collect, we build the full ``A x A`` suppression matrix
with vectorized ops (A = num_priors = 240, so the matrix is tiny) and run the
greedy pass as a ``lax.fori_loop`` carrying a suppression mask — fully
jittable, fixed shapes, no host round-trip.

Suppression predicate (exact reproduction of ``nms_kernel.cu:28-48``
``devIoU``): proposals are ``[_, _, start_y_norm, start_x_px, length_strips,
xs_px...]``; for a pair (a, b) let

  start = max(trunc(a.start*n_strips + .5), trunc(b.start*n_strips + .5))
  end_i = trunc(start_i + len_i - 1 + .5 - (len_i - 1 < 0)),
  end   = min(end_a, end_b, n_offsets - 1)

a suppresses b iff ``end >= start`` and
``sum_{start<=i<=end} |a.xs[i] - b.xs[i]| < thr * (end - start + 1)``.

The host wrapper (``libs/ops/csrc/nms.cpp:51``) sorts by score descending
before suppression; we do the same with ``argsort``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import LaneSpec


def nms_proposals_from_predictions(predictions: jnp.ndarray, spec: LaneSpec,
                                   img_w: int) -> jnp.ndarray:
    """Build NMS proposal rows from full lane vectors.

    Reproduces ``RouterV4.py:405-415`` / ``Router4OL.py:437-449``: drop theta
    (and VIL's invalid length), scale start_x by ``img_w - 1``, length by
    ``n_strips`` and xs by ``img_w - 1``.

    Returns ``[A, 5 + n_offsets]``.
    """
    cls01 = predictions[..., :2]
    start_y = predictions[..., spec.col_start_y : spec.col_start_y + 1]
    start_x = predictions[..., spec.col_start_x : spec.col_start_x + 1] * (img_w - 1)
    length = predictions[..., spec.col_length : spec.col_length + 1] * spec.n_strips
    xs = predictions[..., spec.col_xs :] * (img_w - 1)
    return jnp.concatenate([cls01, start_y, start_x, length, xs], axis=-1)


def _suppression_matrix(proposals: jnp.ndarray, thresh: float,
                        n_offsets: int) -> jnp.ndarray:
    """[A, A] bool: S[i, j] = proposal i suppresses proposal j."""
    n_strips = n_offsets - 1
    start = jnp.trunc(proposals[:, 2] * n_strips + 0.5).astype(jnp.int32)  # [A]
    length = proposals[:, 4]
    # the CUDA kernel truncates the WHOLE expression once (`const int end_a
    # = start_a + a[4] - 1 + 0.5 - ...`, nms_kernel.cu:32) — truncating only
    # the length part is off by one for lengths < 1 strip
    end = jnp.trunc(
        start.astype(length.dtype) + length - 0.5
        - (length - 1.0 < 0).astype(length.dtype)
    ).astype(jnp.int32)
    end = jnp.minimum(end, n_offsets - 1)

    pair_start = jnp.maximum(start[:, None], start[None, :])  # [A, A]
    pair_end = jnp.minimum(end[:, None], end[None, :])
    valid_overlap = pair_end >= pair_start

    xs = proposals[:, 5 : 5 + n_offsets]
    absdiff = jnp.abs(xs[:, None, :] - xs[None, :, :])  # [A, A, O]
    rows = jnp.arange(n_offsets, dtype=jnp.int32)
    in_range = (rows[None, None, :] >= pair_start[..., None]) & (
        rows[None, None, :] <= pair_end[..., None]
    )
    dist = jnp.sum(jnp.where(in_range, absdiff, 0.0), axis=-1)
    count = (pair_end - pair_start + 1).astype(dist.dtype)
    return valid_overlap & (dist < thresh * count)


@partial(jax.jit, static_argnames=("n_offsets", "top_k"))
def lane_nms(
    proposals: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    n_offsets: int,
    top_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy lane NMS over fixed-shape inputs.

    Args:
      proposals: ``[A, 5 + n_offsets]`` rows from
        :func:`nms_proposals_from_predictions`.
      scores: ``[A]`` positive-class probabilities.
      valid: ``[A]`` bool; invalid rows (below the confidence threshold) never
        get kept nor suppress anything (the reference filters them out before
        NMS, ``RouterV4.py:399-404``).
      thresh: mean-pixel-distance threshold (``nms_thres``, 50 px).
      top_k: maximum keeps (``max_lanes``); matches ``nms_collect``'s
        ``top_k`` early-exit (``nms_kernel.cu:99-143``).

    Returns:
      keep_idx: ``[top_k]`` int32 indices into the original A ordering, padded
        with -1.
      num_kept: scalar int32.
      keep_mask: ``[A]`` bool in original ordering.
    """
    a = proposals.shape[0]
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-masked_scores)  # descending, stable
    sorted_valid = valid[order]

    sup = _suppression_matrix(proposals, thresh, n_offsets)
    sup = sup & valid[:, None] & valid[None, :]
    sup_sorted = sup[order][:, order]

    def body(i, state):
        suppressed, keep_mask_sorted, num_kept = state
        can_keep = sorted_valid[i] & ~suppressed[i] & (num_kept < top_k)
        suppressed = jnp.where(can_keep, suppressed | sup_sorted[i], suppressed)
        keep_mask_sorted = keep_mask_sorted.at[i].set(can_keep)
        num_kept = num_kept + can_keep.astype(jnp.int32)
        return suppressed, keep_mask_sorted, num_kept

    suppressed0 = jnp.zeros((a,), dtype=bool)
    keep0 = jnp.zeros((a,), dtype=bool)
    _, keep_mask_sorted, num_kept = jax.lax.fori_loop(
        0, a, body, (suppressed0, keep0, jnp.int32(0))
    )

    # first `num_kept` kept indices in score order, padded with -1
    kept_rank = jnp.cumsum(keep_mask_sorted.astype(jnp.int32)) - 1
    keep_idx = jnp.full((top_k,), -1, dtype=jnp.int32)
    src = jnp.where(keep_mask_sorted, kept_rank, top_k)  # park non-kept at top_k
    keep_idx = jnp.zeros((top_k + 1,), jnp.int32).at[src].set(
        order.astype(jnp.int32), mode="drop"
    )[:top_k]
    keep_idx = jnp.where(jnp.arange(top_k) < num_kept, keep_idx, -1)

    keep_mask = jnp.zeros((a,), bool).at[order].set(keep_mask_sorted)
    return keep_idx, num_kept, keep_mask
