"""Lane NMS as a Pallas TPU kernel.

Replaces the reference CUDA extension (``libs/ops/csrc/nms_kernel.cu``) with
a single-program TPU kernel. Unlike the CUDA design (bitmask kernel over
64-thread tiles + a 1-thread greedy collect), the TPU version exploits that
suppression vectors are only needed for *kept* proposals: the greedy loop
walks the score-sorted proposals once and, only when a proposal is kept,
computes its suppression row against all others as one fused VPU
reduction — O(kept * A * O) work instead of O(A^2 * O), entirely in VMEM.

Semantics are bit-identical to :func:`phnet_tpu.ops.nms.lane_nms`
(``devIoU``: strip-overlap window, sum |dx| < thr * overlap) — tested
against it and against the numpy oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(starts_ref, ends_ref, xs_ref, valid_ref, keep_ref, sup_ref,
                *, n_offsets: int, top_k: int, thresh: float):
    """All refs live in VMEM; proposals are pre-sorted by descending score.

    starts/ends: [A, 1] int32 strip windows; xs: [A, O] px; valid: [A, 1]
    int32; keep: [A, 1] int32 output (1 = kept), in sorted order;
    sup: [A, 1] int32 scratch (suppression flags).

    Dynamic per-proposal reads go through refs (pl.ds) — Pallas TPU has no
    dynamic_slice on values; the suppression state lives in VMEM scratch
    updated as a full-vector masked write each step.
    """
    a = xs_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (a, n_offsets), 1)
    sup_ref[:] = jnp.zeros((a, 1), jnp.int32)
    keep_ref[:] = jnp.zeros((a, 1), jnp.int32)

    def cond(state):
        i, kept_count = state
        # stop at the top_k-th keep: every later proposal's flag is 0,
        # exactly as the old (kept_count < top_k) mask produced
        return (i < a) & (kept_count < top_k)

    def body(state):
        i, kept_count = state
        v_i = valid_ref[pl.ds(i, 1), :]       # [1, 1]
        s_flag = sup_ref[pl.ds(i, 1), :]      # [1, 1]
        can_keep = (v_i[0, 0] > 0) & (s_flag[0, 0] == 0)

        @pl.when(can_keep)
        def _():
            # suppression row of the KEPT proposal i vs all: overlap
            # window + mean |dx|. Guarded so the O(A*O) row is computed
            # only for kept proposals (<= top_k of them) — skipped
            # iterations cost two scalar reads.
            s_i = starts_ref[pl.ds(i, 1), :]      # [1, 1]
            e_i = ends_ref[pl.ds(i, 1), :]
            xs_i = xs_ref[pl.ds(i, 1), :]         # [1, O]
            starts = starts_ref[:]                # [A, 1]
            ends = ends_ref[:]
            pair_start = jnp.maximum(s_i, starts)  # [A, 1]
            pair_end = jnp.minimum(e_i, ends)
            overlap = pair_end >= pair_start
            in_range = (rows >= pair_start) & (rows <= pair_end)
            diff = jnp.abs(xs_ref[:] - xs_i)
            dist = jnp.sum(jnp.where(in_range, diff, 0.0), axis=1,
                           keepdims=True)
            count = (pair_end - pair_start + 1).astype(dist.dtype)
            sup_row = overlap & (dist < thresh * count) & (valid_ref[:] > 0)
            # self-suppression is harmless: i's keep flag is already set
            sup_ref[:] = sup_ref[:] | sup_row.astype(jnp.int32)
            keep_ref[pl.ds(i, 1), :] = jnp.ones((1, 1), jnp.int32)

        return i + 1, kept_count + can_keep.astype(jnp.int32)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


@partial(jax.jit, static_argnames=("thresh", "n_offsets", "top_k", "interpret"))
def lane_nms_pallas(
    proposals: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    n_offsets: int,
    top_k: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`phnet_tpu.ops.nms.lane_nms`.

    proposals: [A, 5+O] rows (see nms_proposals_from_predictions);
    returns (keep_idx [top_k] into original order, num_kept, keep_mask [A]).
    """
    a = proposals.shape[0]
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    order = jnp.argsort(-jnp.where(valid, scores, neg_inf))

    props = proposals[order]
    valid_sorted = valid[order]

    n_strips = n_offsets - 1
    starts = jnp.trunc(props[:, 2] * n_strips + 0.5).astype(jnp.int32)
    length = props[:, 4]
    # whole-expression trunc, matching nms_kernel.cu:32 (see ops/nms.py)
    ends = jnp.trunc(
        starts.astype(length.dtype) + length - 0.5
        - (length - 1.0 < 0).astype(length.dtype)
    ).astype(jnp.int32)
    ends = jnp.minimum(ends, n_offsets - 1)
    xs = props[:, 5 : 5 + n_offsets].astype(jnp.float32)

    keep_sorted = pl.pallas_call(
        partial(_nms_kernel, n_offsets=n_offsets, top_k=top_k,
                thresh=float(thresh)),
        out_shape=jax.ShapeDtypeStruct((a, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((a, 1), jnp.int32)],
        interpret=interpret,
    )(starts[:, None], ends[:, None], xs, valid_sorted[:, None].astype(jnp.int32))

    keep_mask_sorted = keep_sorted[:, 0] > 0
    num_kept = jnp.sum(keep_mask_sorted.astype(jnp.int32))

    kept_rank = jnp.cumsum(keep_mask_sorted.astype(jnp.int32)) - 1
    src = jnp.where(keep_mask_sorted, kept_rank, top_k)
    keep_idx = jnp.zeros((top_k + 1,), jnp.int32).at[src].set(
        order.astype(jnp.int32), mode="drop"
    )[:top_k]
    keep_idx = jnp.where(jnp.arange(top_k) < num_kept, keep_idx, -1)
    keep_mask = jnp.zeros((a,), bool).at[order].set(keep_mask_sorted)
    return keep_idx, num_kept, keep_mask
