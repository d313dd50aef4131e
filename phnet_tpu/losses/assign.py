"""Label assignment: cost matrix + on-device Hungarian matching.

Reproduces the reference's assignment cost (``libs/utils/dynamic_assign.py``
``assign`` :128 / ``assignV2`` :193) with fixed shapes and validity masks:

  cost = -(distance * start_xy * theta)^2 * 3 + focal_cost
  C    = cost - pairwise_line_iou

and solves it with :func:`phnet_tpu.ops.hungarian_assign` *on device* —
replacing the reference's per-frame GPU->CPU scipy round trip
(``dynamic_assign.py:241-243``).

Also provides the SimOTA-style ``dynamic_k_assign`` fast path
(``dynamic_assign.py:83-125``) re-expressed with masks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LaneSpec
from ..ops import hungarian_assign

INF = 987654.0


def line_iou_pairwise(pred_xs: jnp.ndarray, target_xs: jnp.ndarray,
                      img_w: int, length: float = 15.0) -> jnp.ndarray:
    """Pairwise horizontal-band IoU (``dynamic_assign.py:5-36``,
    aligned=False). pred_xs: [A, O] px; target_xs: [L, O] px -> [A, L]."""
    px1 = pred_xs - length
    px2 = pred_xs + length
    tx1 = target_xs - length
    tx2 = target_xs + length
    ovr = jnp.minimum(px2[:, None, :], tx2[None, :, :]) - jnp.maximum(
        px1[:, None, :], tx1[None, :, :]
    )
    union = jnp.maximum(px2[:, None, :], tx2[None, :, :]) - jnp.minimum(
        px1[:, None, :], tx1[None, :, :]
    )
    invalid = (target_xs < 0) | (target_xs >= img_w)  # [L, O]
    ovr = jnp.where(invalid[None], 0.0, ovr)
    union = jnp.where(invalid[None], 0.0, union)
    return ovr.sum(-1) / (union.sum(-1) + 1e-9)


def line_iou_aligned(pred_xs: jnp.ndarray, target_xs: jnp.ndarray,
                     img_w: int, length: float = 15.0) -> jnp.ndarray:
    """Aligned line IoU (``dynamic_assign.py:20-27``).
    pred_xs/target_xs: [..., O] px -> [...]."""
    px1, px2 = pred_xs - length, pred_xs + length
    tx1, tx2 = target_xs - length, target_xs + length
    ovr = jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1)
    union = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    invalid = (target_xs < 0) | (target_xs >= img_w)
    ovr = jnp.where(invalid, 0.0, ovr)
    union = jnp.where(invalid, 0.0, union)
    return ovr.sum(-1) / (union.sum(-1) + 1e-9)


def _lane_widths(xs: jnp.ndarray, dy: float, img_w: int, lane_width: float,
                 max_dx: Optional[float] = None) -> jnp.ndarray:
    """Slope-adaptive virtual half-widths per row (CLRerNet
    ``_calc_lane_width``, ``dynamic_assignV2.py:68-90``). xs: [..., O]
    relative coords; ``max_dx`` (px) zeroes dx spikes so padded -1e5
    target rows stay finite. Shared by the aligned and pairwise LaneIoU
    paths — the width convention must never drift between them."""
    dx = (xs[..., 2:] - xs[..., :-2]) * img_w
    if max_dx is not None:
        dx = jnp.where(jnp.abs(dx) > max_dx, 0.0, dx)
    w = lane_width * jnp.sqrt(dx**2 + dy**2) / dy
    return jnp.concatenate([w[..., :1], w, w[..., -1:]], axis=-1)


def lane_iou_aligned(pred_xs: jnp.ndarray, target_xs: jnp.ndarray,
                     img_h: int, img_w: int,
                     lane_width: float = 7.5 / 768.0,
                     max_dx: float = 1e4) -> jnp.ndarray:
    """CLRerNet slope-adaptive LaneIoU, relative coordinates
    (``dynamic_assignV2.py:55-101`` ``LaneIoULoss``). Inputs [..., O]."""
    n_strips = pred_xs.shape[-1] - 1
    dy = img_h / n_strips * 2.0

    pw = _lane_widths(jax.lax.stop_gradient(pred_xs), dy, img_w, lane_width)
    tw = _lane_widths(target_xs, dy, img_w, lane_width, max_dx=max_dx)
    px1, px2 = pred_xs - pw, pred_xs + pw
    tx1, tx2 = target_xs - tw, target_xs + tw
    ovr = jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1)
    union = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    invalid = (target_xs < 0) | (target_xs >= 1.0)
    ovr = jnp.where(invalid, 0.0, ovr)
    union = jnp.where(invalid, 0.0, union)
    return ovr.sum(-1) / (union.sum(-1) + 1e-9)


def _focal_cost_pos(cls_logits: jnp.ndarray, alpha: float = 0.25,
                    gamma: float = 2.0, eps: float = 1e-12) -> jnp.ndarray:
    """Focal assignment cost for the positive class
    (``dynamic_assign.py:66-80``). cls_logits: [A, 2] -> [A]."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p**gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    return pos[:, 1] - neg[:, 1]


def _cost_and_iou(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
    distance_cost_weight: float = 3.0,
    cls_cost_weight: float = 1.0,
    alpha: float = 0.25,
    plus_eps: bool = False,
    iou_length: float = 15.0,
    scale_pred_xs: bool = True,
    pred_valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared cost pieces of the ``dynamic_assign`` family: returns
    ``(cost, iou)``, both ``[A, L]``.

    ``plus_eps`` selects the two normalization styles in the reference:
    ``1 - x/(max+1e-4)`` (``assign``/``assignV2``/``assignOne2Many``,
    ``dynamic_assign.py:153,208,306``) vs ``1 - x/max + 1e-2``
    (``anc_assign``/``assignCrossFrame``, :258,374). ``scale_pred_xs``
    is off for cross-frame matching, whose "predictions" are encoded
    targets already in px (:369). ``pred_valid`` extends the max-
    normalization mask to padded prediction rows (only needed when the
    prediction side is a padded target tensor).
    """
    predictions = jax.lax.stop_gradient(predictions)
    targets = jax.lax.stop_gradient(targets)

    pred_xs_px = predictions[:, spec.col_xs :]
    if scale_pred_xs:
        pred_xs_px = pred_xs_px * (img_w - 1)
    tgt_xs_px = targets[:, spec.col_xs :]

    # --- mean |dx| over the target's valid columns; the reference slices
    # from column 6 (dynamic_assign.py:44-63) which, for the VIL layout,
    # also includes the invalid-length field — replicated bit-for-bit.
    if spec.n_lengths == 2:
        pred_d = jnp.concatenate(
            [predictions[:, 6:7], pred_xs_px], axis=-1)
        tgt_d = jnp.concatenate([targets[:, 6:7], tgt_xs_px], axis=-1)
    else:
        pred_d, tgt_d = pred_xs_px, tgt_xs_px
    invalid = (tgt_d < 0) | (tgt_d >= img_w)  # [L, D]
    lengths = jnp.sum(~invalid, axis=-1).astype(jnp.float32)
    diffs = jnp.abs(tgt_d[None, :, :] - pred_d[:, None, :])
    diffs = jnp.where(invalid[None], 0.0, diffs)
    distances = diffs.sum(-1) / (lengths[None] + 1e-9)  # [A, L]

    pair_valid = target_valid[None, :]
    if pred_valid is not None:
        pair_valid = pair_valid & pred_valid[:, None]

    def masked_max(x):
        big = jnp.max(jnp.where(pair_valid, x, -jnp.inf))
        return jnp.maximum(big, 0.0)

    def score(x):
        if plus_eps:
            return 1.0 - x / masked_max(x) + 1e-2
        return 1.0 - x / (masked_max(x) + 1e-4)

    dist_score = score(distances)

    cls_score = _focal_cost_pos(predictions[:, :2], alpha=alpha)[:, None]

    t_sy = targets[:, spec.col_start_y] * (img_h - 1)
    t_sx = targets[:, spec.col_start_x] * (img_w - 1)
    p_sy = predictions[:, spec.col_start_y] * (img_h - 1)
    p_sx = predictions[:, spec.col_start_x] * (img_w - 1)
    start_d = jnp.sqrt(
        (p_sy[:, None] - t_sy[None, :]) ** 2
        + (p_sx[:, None] - t_sx[None, :]) ** 2
        + 1e-12
    )
    start_score = score(start_d)

    theta_d = (
        jnp.abs(predictions[:, spec.col_theta, None] - targets[None, :, spec.col_theta])
        * 180.0
    )
    theta_score = score(theta_d)

    cost = (
        -((dist_score * start_score * theta_score) ** 2) * distance_cost_weight
        + cls_score * cls_cost_weight
    )
    iou = line_iou_pairwise(pred_xs_px, tgt_xs_px, img_w, length=iou_length)
    return cost, iou


def assignment_cost(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
    distance_cost_weight: float = 3.0,
    cls_cost_weight: float = 1.0,
) -> jnp.ndarray:
    """Assignment cost matrix C = cost - iou, shape ``[L, A]``.

    predictions: [A, dim] (xs normalized); targets: [L, dim] (xs in px);
    target_valid: [L] bool. Padded target rows produce garbage entries —
    mask them out downstream.
    """
    cost, iou = _cost_and_iou(
        predictions, targets, target_valid, spec, img_w, img_h,
        distance_cost_weight, cls_cost_weight)
    return (cost - iou).T  # [L, A]


def assign_frame(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
) -> jnp.ndarray:
    """Hungarian-match each valid target to a distinct prior.

    Returns ``matched_prior [L] int32`` (arbitrary for invalid targets).
    """
    cost = assignment_cost(predictions, targets, target_valid, spec, img_w, img_h)
    return hungarian_assign(cost, target_valid)


def train_assign(cfg, predictions, targets, target_valid, spec):
    """Training assigner selected by ``ModelConfig.train_assigner``:
    "hungarian" (parity default) or "dynamic_k" (SimOTA fast path —
    measured a speed wash and a quality wash at B=4, ROADMAP round 5)."""
    if cfg.train_assigner == "dynamic_k":
        return dynamic_k_frame(
            predictions, targets, target_valid, spec, cfg.img_w, cfg.img_h)
    return assign_frame(
        predictions, targets, target_valid, spec, cfg.img_w, cfg.img_h)


def dynamic_k_frame(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
    n_candidate_k: int = 4,
) -> jnp.ndarray:
    """SimOTA assignment over the SAME cost pieces as :func:`assign_frame`,
    reduced to the one-prior-per-target contract the criterion and memory
    write use. The fast-path alternative to the Hungarian solve: top-k +
    a fixed L-iteration fori_loop instead of the JV augmenting-path
    while-loop (data-dependent trip counts serialize poorly inside the
    training scan — ~10 ms/clip at B=4, ROADMAP round-4 account).

    Reference: ``dynamic_assign.py:83-125`` (``dynamic_k_assign``), shipped
    in-tree by the reference as its own commented-in alternative to
    ``linear_sum_assignment`` (``dynamic_assign.py:182``). SimOTA is
    one-to-FEW; the reduction keeps, per target, its minimum-cost matched
    prior (the primary match — the reference's own multi-target
    resolution rule, ``:120-122``, applied on the target side), so every
    downstream shape ([L] matched vector) is unchanged. A valid target
    stripped of all its priors by the prior-side resolution falls back to
    its global min-cost prior.

    Returns ``matched_prior [L] int32`` (arbitrary for invalid targets).
    """
    cost, iou = _cost_and_iou(
        predictions, targets, target_valid, spec, img_w, img_h)
    match = dynamic_k_assign(cost, iou, target_valid,
                             n_candidate_k=n_candidate_k)  # [A, L] bool
    eff = jnp.where(match, cost, INF)
    # fallback for targets with no surviving prior: global min-cost row
    eff = jnp.where(match.any(0)[None], eff, cost)
    return jnp.argmin(eff, axis=0).astype(jnp.int32)


def lane_iou_cost_pairwise(
    pred_xs: jnp.ndarray,
    target_xs: jnp.ndarray,
    img_h: int,
    img_w: int,
    lane_width: float,
    start: jnp.ndarray | None = None,
    end: jnp.ndarray | None = None,
    max_dx: float = 1e4,
) -> jnp.ndarray:
    """CLRerNet ``LaneIoUCost`` (``dynamic_assignV2.py:222-337``), pairwise.

    pred_xs: [A, O] and target_xs: [L, O], both *relative* coordinates ->
    IoU matrix [A, L]. Slope-adaptive virtual half-widths per row
    (``_calc_lane_width``, ``dynamic_assignV2.py:68-90``); target dx spikes
    above ``max_dx`` px are zeroed (padded -1e5 rows stay finite).

    With ``start``/``end`` (pred start/end as row fractions, [A]), rows
    outside the pred's span are invalidated and single-sided rows
    contribute a virtual union of the present lane's full width
    (``_set_invalid_with_start_end``, ``dynamic_assignV2.py:243-291``);
    otherwise only target-invalid rows are zeroed
    (``_set_invalid_without_start_end``).
    """
    n_offsets = pred_xs.shape[-1]
    dy = img_h / (n_offsets - 1) * 2.0

    pw = _lane_widths(jax.lax.stop_gradient(pred_xs), dy, img_w,
                      lane_width)  # [A, O]
    tw = _lane_widths(target_xs, dy, img_w, lane_width,
                      max_dx=max_dx)  # [L, O]
    px1, px2 = pred_xs - pw, pred_xs + pw
    tx1, tx2 = target_xs - tw, target_xs + tw
    ovr = jnp.minimum(px2[:, None], tx2[None]) - jnp.maximum(
        px1[:, None], tx1[None])  # [A, L, O]
    union = jnp.maximum(px2[:, None], tx2[None]) - jnp.minimum(
        px1[:, None], tx1[None])

    invalid_gt = ((target_xs < 0) | (target_xs >= 1.0))[None]  # [1, L, O]
    if start is None:
        ovr = jnp.where(invalid_gt, 0.0, ovr)
        union = jnp.where(invalid_gt, 0.0, union)
    else:
        yind = jnp.arange(n_offsets)[None, None, :]
        start_idx = (start * (n_offsets - 1)).astype(jnp.int32)[:, None, None]
        end_idx = (end * (n_offsets - 1)).astype(jnp.int32)[:, None, None]
        invalid_pred = (
            ((pred_xs < 0) | (pred_xs >= 1.0))[:, None, :]
            | (yind < start_idx)
            | (yind >= end_idx)
        )  # [A, 1|L, O]
        invalid_pred = jnp.broadcast_to(invalid_pred, ovr.shape)
        invalid_any = invalid_pred | invalid_gt
        ovr = jnp.where(invalid_any, 0.0, ovr)
        union = jnp.where(invalid_any, 0.0, union)
        # single-sided rows: union = present lane's full virtual width
        union = union + jnp.where(
            invalid_any & ~invalid_pred, 2.0 * pw[:, None], 0.0)
        union = union + jnp.where(
            invalid_any & ~jnp.broadcast_to(invalid_gt, ovr.shape),
            2.0 * tw[None], 0.0)
    return ovr.sum(-1) / (union.sum(-1) + 1e-9)


def dynamic_topk_assign(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int = 768,
    reg_weight: float = 3.0,
    iou_img_h: int = 400,
    iou_img_w: int = 960,
    dynamick_width: float = 6.0 / 768,
    cost_width: float = 12.0 / 768,
    max_topk: int = 4,
) -> jnp.ndarray:
    """CLRerNet ``DynamicTopkAssigner.assign``
    (``dynamic_assignV2.py:337-462``), masked fixed shapes.

    predictions: [A, dim] (xs relative); targets: [L, dim] (xs in px, as
    encoded labels); target_valid: [L] bool -> [A, L] bool match matrix.

    Faithful quirks: the IoU costs use the constructor's hard-coded
    ``img_h=400, img_w=960`` geometry (not the dataset's 384x768,
    ``dynamic_assignV2.py:366-367``); the cls cost indexes the focal
    pos-neg table at the GT label column, which is 1 for every lane row
    (``targets[:, 1].long()``, ``dynamic_assignV2.py:455``); pred
    start/end span the clamped ``start_y``/``start_y+length`` fractions
    (``_clrernet_cost``, ``dynamic_assignV2.py:430-436``).
    """
    predictions = jax.lax.stop_gradient(predictions)
    targets = jax.lax.stop_gradient(targets)

    pred_xs = predictions[:, spec.col_xs:]
    target_xs = targets[:, spec.col_xs:] / (img_w - 1)  # abs px -> relative

    iou_dynamick = lane_iou_cost_pairwise(
        pred_xs, target_xs, iou_img_h, iou_img_w, dynamick_width)

    start = jnp.clip(predictions[:, spec.col_start_y], 0.0, 1.0)
    end = jnp.clip(start + predictions[:, spec.col_length], 0.0, 1.0)
    iou_cost = lane_iou_cost_pairwise(
        pred_xs, target_xs, iou_img_h, iou_img_w, cost_width,
        start=start, end=end)
    one_minus = jnp.where(target_valid[None], 1.0 - iou_cost, -jnp.inf)
    iou_score = 1.0 - (1.0 - iou_cost) / jnp.max(one_minus) + 1e-2
    cls_score = _focal_cost_pos(predictions[:, :2])[:, None]
    cost = -iou_score * reg_weight + cls_score  # [A, L]

    return dynamic_k_assign(cost, iou_dynamick, target_valid,
                            n_candidate_k=max_topk)


def dynamic_k_assign(
    cost_al: jnp.ndarray, iou_al: jnp.ndarray, target_valid: jnp.ndarray,
    n_candidate_k: int = 4,
) -> jnp.ndarray:
    """SimOTA-style one-to-few assignment (``dynamic_assign.py:83-125``),
    masked fixed-shape variant. Returns a [A, L] bool matching matrix.

    Provided as the fast-path alternative assigner; unlike Hungarian it can
    match several priors per target (dynamic k = clamp(sum(top4 iou), 1)).
    """
    a, l = cost_al.shape
    ious = jnp.where(target_valid[None], jnp.maximum(iou_al, 0.0), 0.0)
    topk_ious = jax.lax.top_k(ious.T, n_candidate_k)[0]  # [L, k]
    dynamic_ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, a)  # [L]

    cost_work = jnp.where(target_valid[None], cost_al, INF)
    match = jnp.zeros((a, l), bool)

    def per_target(t, state):
        cost_work, match = state
        col = cost_work[:, t]
        k = dynamic_ks[t]
        # take the k smallest costs of this column
        _, top_idx = jax.lax.top_k(-col, a)  # ascending cost order
        take = jnp.arange(a) < k
        sel = jnp.zeros((a,), bool).at[top_idx].set(take)
        sel = sel & target_valid[t]
        match = match.at[:, t].set(sel)
        cost_work = jnp.where(sel[:, None], INF, cost_work)
        return cost_work, match

    cost_work, match = jax.lax.fori_loop(0, l, per_target, (cost_work, match))

    # resolve priors matched to >1 target: keep only the min-cost target
    multi = match.sum(-1) > 1
    best_t = jnp.argmin(jnp.where(target_valid[None], cost_al, INF), axis=-1)
    onehot_best = jax.nn.one_hot(best_t, l, dtype=bool)
    match = jnp.where(multi[:, None], onehot_best & match.any(-1, keepdims=True), match)
    return match


def anc_assign(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
    distance_cost_weight: float = 3.0,
    cls_cost_weight: float = 1.0,
) -> jnp.ndarray:
    """``dynamic_assign.anc_assign`` (:248-289): the ``+1e-2`` score
    style, band IoU with length=12, SimOTA dynamic-k matching. Returns
    a ``[A, L]`` bool match matrix (experimental in the reference —
    imported but commented out of ``loss4OLV2/V3``)."""
    cost, iou = _cost_and_iou(
        predictions, targets, target_valid, spec, img_w, img_h,
        distance_cost_weight, cls_cost_weight,
        plus_eps=True, iou_length=12.0)
    return dynamic_k_assign(cost, iou, target_valid)


def assign_one2many(
    predictions: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
    distance_cost_weight: float = 3.0,
    cls_cost_weight: float = 1.0,
    n_candidate_k: int = 4,
) -> jnp.ndarray:
    """``dynamic_assign.assignOne2Many`` (:292-357): repeated Hungarian
    rounds give each target up to ``dynamic_k`` distinct priors. Returns
    a ``[A, L]`` bool match matrix.

    Faithful quirks: focal alpha=0.5 (:309); ``dynamic_ks`` from the
    top-4 band-IoU sums, min 1 (:341-344); each round's scipy solution
    is filtered *positionally* by ``dynamic_ks > 0`` (:352) — position i
    of the row-sorted assignment is gated by target i's remaining k, not
    by the target actually matched at that position. We replicate that by
    sorting matches by prior index; this assumes valid targets form a
    prefix of the padded tensor (true for our readers).
    """
    a, l = predictions.shape[0], targets.shape[0]
    cost, iou = _cost_and_iou(
        predictions, targets, target_valid, spec, img_w, img_h,
        distance_cost_weight, cls_cost_weight, alpha=0.5)
    c_la = (cost - iou).T  # [L, A]

    ious = jnp.where(target_valid[None], jnp.maximum(iou, 0.0), 0.0)
    topk_ious = jax.lax.top_k(ious.T, min(n_candidate_k, a))[0]  # [L, k]
    ks0 = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)
    ks0 = jnp.where(target_valid, ks0, 0)

    match0 = jnp.zeros((a, l), bool)

    def cond(state):
        _, ks, _ = state
        return ks.sum() > 0

    def body(state):
        c_work, ks, match = state
        mp = hungarian_assign(c_work, target_valid)  # [L] prior per target
        # row-sorted positions: i-th smallest matched prior (valid last)
        key = jnp.where(target_valid, mp, a + l)
        order = jnp.argsort(key)
        keep = (ks > 0) & target_valid[order]  # positional gate (:352)
        rows = mp[order]
        match = match.at[rows, order].max(keep)
        kept_rows = jnp.zeros((a,), bool).at[rows].max(keep)
        c_work = jnp.where(kept_rows[None, :], INF, c_work)
        ks = jnp.where(ks > 0, ks - 1, 0)
        return c_work, ks, match

    _, _, match = jax.lax.while_loop(cond, body, (c_la, ks0, match0))
    return match


def assign_cross_frame(
    targets_curr: jnp.ndarray,
    targets_last: jnp.ndarray,
    curr_valid: jnp.ndarray,
    last_valid: jnp.ndarray,
    spec: LaneSpec,
    img_w: int,
    img_h: int,
    distance_cost_weight: float = 3.0,
    cls_cost_weight: float = 1.0,
) -> jnp.ndarray:
    """``dynamic_assign.assignCrossFrame`` + ``dynamic_k_assign_CF``
    (:360-450): match this frame's encoded targets against the previous
    frame's for temporal identity propagation. Returns a ``[C, T]`` bool
    match matrix (curr x last).

    Faithful quirks: the current targets play the prediction role with
    xs already in px (:369, no rescale); ``+1e-2`` score style; band IoU
    length=12; dynamic k is the *binary* top-1 of IoU thresholded at 0.8
    (:421-427) so every last-frame lane gets 0 or 1 partner; priors
    matched to several gts are reassigned to their min-cost gt alone
    (:442-446).
    """
    c, t = targets_curr.shape[0], targets_last.shape[0]
    cost, iou = _cost_and_iou(
        targets_curr, targets_last, last_valid, spec, img_w, img_h,
        distance_cost_weight, cls_cost_weight,
        plus_eps=True, iou_length=12.0,
        scale_pred_xs=False, pred_valid=curr_valid)

    pair_valid = curr_valid[:, None] & last_valid[None, :]
    binary = jnp.where(pair_valid, iou, 0.0) >= 0.8
    ks = binary.any(axis=0) & last_valid  # [T] in {0, 1}

    cost_masked = jnp.where(pair_valid, cost, INF)
    match0 = jnp.zeros((c, t), bool)

    def body(tt, state):
        cost_work, match = state
        pos = jnp.argmin(cost_work[:, tt])
        take = ks[tt]
        match = match.at[pos, tt].max(take)
        cost_work = jnp.where(
            (jnp.arange(c) == pos)[:, None] & take, INF, cost_work)
        return cost_work, match

    _, match = jax.lax.fori_loop(0, t, body, (cost_masked, match0))

    # reassign multiply-matched current lanes to their min-cost partner
    multi = match.sum(-1) > 1
    best = jnp.argmin(jnp.where(last_valid[None], cost, INF), axis=-1)
    onehot_best = jax.nn.one_hot(best, t, dtype=bool)
    match = jnp.where(multi[:, None], onehot_best, match)
    return match
