"""Numeric parity of the criterion against independent numpy oracles.

Each oracle re-derives the reference's equations (lossV5.py /
dynamic_assign.py) directly in numpy with scipy's Hungarian — no shared
code with the implementation under test — so any drift in assignment cost,
focal/smooth-L1/LineIoU terms or the router blending shows up numerically.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from phnet_tpu.config import LaneSpec, LossConfig, ModelConfig
from phnet_tpu.losses import LaneCriterion
from phnet_tpu.losses.assign import assignment_cost, line_iou_pairwise

IMG_H, IMG_W = 384, 768
SPEC = LaneSpec(n_offsets=36, n_lengths=2)
A, L = 60, 4


def random_problem(seed, n_targets=3):
    rng = np.random.default_rng(seed)
    preds = np.zeros((A, SPEC.dim), np.float32)
    preds[:, :2] = rng.normal(0, 1, (A, 2))
    preds[:, 2] = rng.uniform(0, 0.3, A)      # start_y
    preds[:, 3] = rng.uniform(0, 1, A)        # start_x
    preds[:, 4] = rng.uniform(0.2, 0.8, A)    # theta
    preds[:, 5] = rng.uniform(0, 1, A)        # valid len (fraction)
    preds[:, 6] = rng.uniform(0, 0.2, A)      # invalid len
    preds[:, 7:] = rng.uniform(0, 1, (A, 36))  # xs normalized

    tgts = np.full((L, SPEC.dim), -1e5, np.float32)
    tgts[:, 0] = 1.0
    tgts[:, 1] = 0.0
    for i in range(n_targets):
        tgts[i, 0] = 0.0
        tgts[i, 1] = 1.0
        tgts[i, 2] = rng.uniform(0, 0.2)
        tgts[i, 3] = rng.uniform(0.1, 0.9)
        tgts[i, 4] = rng.uniform(0.3, 0.7)
        tgts[i, 5] = rng.uniform(0.4, 0.9)
        tgts[i, 6] = rng.uniform(0, 0.1)
        n_rows = rng.integers(20, 36)
        tgts[i, 7:7 + n_rows] = rng.uniform(0, IMG_W - 1, n_rows)
    return preds, tgts, n_targets


# ---------------------------------------------------------------------------
# numpy oracles of the reference equations
# ---------------------------------------------------------------------------
def np_line_iou_pairwise(pred_px, tgt_px, img_w, length=15.0):
    px1, px2 = pred_px - length, pred_px + length
    tx1, tx2 = tgt_px - length, tgt_px + length
    ovr = np.minimum(px2[:, None], tx2[None]) - np.maximum(px1[:, None], tx1[None])
    uni = np.maximum(px2[:, None], tx2[None]) - np.minimum(px1[:, None], tx1[None])
    bad = (tgt_px < 0) | (tgt_px >= img_w)
    ovr[np.broadcast_to(bad[None], ovr.shape)] = 0
    uni[np.broadcast_to(bad[None], uni.shape)] = 0
    return ovr.sum(-1) / (uni.sum(-1) + 1e-9)


def np_assign_cost(preds, tgts_valid):
    """assignV2 cost (dynamic_assign.py:193-249) in plain numpy."""
    p = preds.copy()
    t = tgts_valid.copy()
    p[:, 7:] *= (IMG_W - 1)

    # distance over cols >= 6 (includes VIL invalid_len column)
    pd = p[:, 6:]
    td = t[:, 6:]
    bad = (td < 0) | (td >= IMG_W)
    lengths = (~bad).sum(1)
    d = np.abs(td[None] - pd[:, None])
    d[np.broadcast_to(bad[None], d.shape)] = 0
    distances = d.sum(-1) / (lengths[None] + 1e-9)
    dist_score = 1 - distances / (distances.max() + 1e-4)

    sig = 1 / (1 + np.exp(-p[:, :2]))
    eps = 1e-12
    neg = -np.log(1 - sig + eps) * 0.75 * sig**2
    pos = -np.log(sig + eps) * 0.25 * (1 - sig) ** 2
    cls_score = (pos[:, 1] - neg[:, 1])[:, None]

    t_xy = np.stack([t[:, 2] * (IMG_H - 1), t[:, 3] * (IMG_W - 1)], 1)
    p_xy = np.stack([p[:, 2] * (IMG_H - 1), p[:, 3] * (IMG_W - 1)], 1)
    start_d = np.sqrt(((p_xy[:, None] - t_xy[None]) ** 2).sum(-1))
    start_score = 1 - start_d / (start_d.max() + 1e-4)

    th = np.abs(p[:, 4, None] - t[None, :, 4]) * 180
    th_score = 1 - th / (th.max() + 1e-4)

    cost = -((dist_score * start_score * th_score) ** 2) * 3 + cls_score
    iou = np_line_iou_pairwise(p[:, 7:], t[:, 7:], IMG_W)
    return cost - iou


def np_focal(logits, target, alpha=(0.5, 0.5), gamma=2.0, eps=1e-6):
    z = logits - logits.max(-1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True) + eps
    # reference one_hot adds eps to the one-hot itself (focal_loss.py:70-75)
    oh = np.eye(2)[target] + eps
    al = np.asarray(alpha)
    return (oh * (-al * (1 - probs) ** gamma * np.log(probs))).sum(-1)


def np_torch_median(x):
    """torch.median: lower of the two middle values for even length."""
    return np.sort(x)[(len(x) - 1) // 2]


def np_smooth_l1(x):
    ax = np.abs(x)
    return np.where(ax < 1, 0.5 * ax**2, ax - 0.5)


def np_frame_loss(pred_fir, pred_sec, diff, label, lc: LossConfig):
    """DILaneCriterionV5.loss4OneStep oracle (lossV5.py:95-208)."""
    valid = label[:, 1] == 1
    tv = label[valid]
    n_t = len(tv)
    scale = np.array([35.0, IMG_W - 1.0, 180.0, 35.0, 35.0])

    def branch(preds_s):
        """Reference ordinal contract (lossV5.py:126-171): per-stage reg/iou
        vectors are in scipy's sorted-matched-prior order and summed across
        stages positionally; the sum is scattered at the LAST stage's
        sorted rows."""
        cls_vec = np.zeros(A)
        reg_v = np.zeros(n_t)
        iou_v = np.zeros(n_t)
        rows_last = None
        for s in range(preds_s.shape[0]):
            pred = preds_s[s]
            cost = np_assign_cost(pred, tv)
            rows, cols = linear_sum_assignment(cost)  # rows = sorted priors
            m = np.zeros(n_t, int)
            m[cols] = rows  # matched prior per target
            rows_last = rows
            cls_t = np.zeros(A, int)
            cls_t[m] = 1
            cls_vec += np_focal(pred[:, :2], cls_t, lc.focal_alpha, lc.focal_gamma)
            rp = pred[rows, 2:7] * scale
            rt = tv[cols, 2:7] * scale
            reg_v += np_smooth_l1(rp - rt).mean(-1) / n_t
            pxs = pred[rows, 7:] * (IMG_W - 1)
            iou = np.array([
                np_line_iou_pairwise(pxs[i:i+1], tv[cols[i]:cols[i]+1, 7:], IMG_W)[0, 0]
                for i in range(n_t)
            ])
            iou_v += (1 - iou) / n_t
        return cls_vec / 3, reg_v / 3, iou_v / 3, rows_last

    def inst(cls_vec, reg_v, iou_v, rows):
        out = cls_vec * lc.cls_weight
        out[rows] += reg_v * lc.reg_weight + iou_v * lc.iou_weight
        return out

    ca, ra, ia, ma = branch(pred_fir)
    cb, rb, ib, mb = branch(pred_sec)
    la = inst(ca, ra, ia, ma)
    lb = inst(cb, rb, ib, mb)
    d = diff.mean(0)
    delta = np_torch_median(la - lb)
    la = la - delta / 2
    lb = lb + delta / 2
    return ((1 - d) * la + d * lb).sum()


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_assignment_cost_matches_reference_equations(seed):
    preds, tgts, n_t = random_problem(seed)
    valid = tgts[:, 1] == 1
    ours = np.array(assignment_cost(
        jnp.array(preds), jnp.array(tgts), jnp.array(valid),
        SPEC, IMG_W, IMG_H))
    oracle = np_assign_cost(preds, tgts[valid])  # [A, n_t]
    np.testing.assert_allclose(ours[:n_t].T, oracle, rtol=2e-4, atol=2e-4)
    # identical matching
    r1, c1 = linear_sum_assignment(oracle.T)
    from phnet_tpu.ops import hungarian_assign
    m = np.array(hungarian_assign(jnp.array(ours), jnp.array(valid)))
    assert sorted(m[:n_t].tolist()) == sorted(c1.tolist())


def test_line_iou_matches_oracle():
    rng = np.random.default_rng(3)
    p = rng.uniform(0, IMG_W, (5, 36)).astype(np.float32)
    t = rng.uniform(-50, IMG_W + 50, (3, 36)).astype(np.float32)
    ours = np.array(line_iou_pairwise(jnp.array(p), jnp.array(t), IMG_W))
    np.testing.assert_allclose(ours, np_line_iou_pairwise(p, t, IMG_W), rtol=1e-5)


@pytest.mark.parametrize("seed,n_targets", [(0, 3), (1, 4), (2, 1)])
def test_vil_frame_loss_matches_oracle(seed, n_targets):
    rng = np.random.default_rng(seed + 50)
    preds_f = np.stack([random_problem(seed * 7 + s)[0] for s in range(3)])
    preds_s = np.stack([random_problem(seed * 7 + 10 + s)[0] for s in range(3)])
    _, tgts, _ = random_problem(seed, n_targets)
    diff = rng.uniform(0.5, 0.99, (3, A)).astype(np.float32)

    cfg = ModelConfig(img_h=IMG_H, img_w=IMG_W, lane=SPEC, max_lanes=L)
    lc = LossConfig()
    crit = LaneCriterion(cfg, lc)
    ours, _ = crit.frame_loss(
        jnp.array(preds_f), jnp.array(preds_s), jnp.array(diff),
        jnp.array(tgts))
    oracle = np_frame_loss(preds_f, preds_s, diff, tgts, lc)
    np.testing.assert_allclose(float(ours), oracle, rtol=2e-3)


# ---------------------------------------------------------------------------
# OpenLane-style criterion (blend_cls + CLRerNet LaneIoU), loss4OLV3.py oracle
# ---------------------------------------------------------------------------
OL_SPEC = LaneSpec(n_offsets=36, n_lengths=1)


def random_problem_ol(seed, n_targets=3):
    rng = np.random.default_rng(seed)
    preds = np.zeros((A, OL_SPEC.dim), np.float32)
    preds[:, :2] = rng.normal(0, 1, (A, 2))
    preds[:, 2] = rng.uniform(0, 0.3, A)
    preds[:, 3] = rng.uniform(0, 1, A)
    preds[:, 4] = rng.uniform(0.2, 0.8, A)
    preds[:, 5] = rng.uniform(0, 1, A)
    preds[:, 6:] = rng.uniform(0, 1, (A, 36))
    tgts = np.full((L, OL_SPEC.dim), -1e5, np.float32)
    tgts[:, 0] = 1.0
    tgts[:, 1] = 0.0
    for i in range(n_targets):
        tgts[i, :2] = (0.0, 1.0)
        tgts[i, 2] = rng.uniform(0, 0.2)
        tgts[i, 3] = rng.uniform(0.1, 0.9)
        tgts[i, 4] = rng.uniform(0.3, 0.7)
        tgts[i, 5] = rng.uniform(0.4, 0.9)
        n_rows = rng.integers(20, 36)
        tgts[i, 6:6 + n_rows] = rng.uniform(0, IMG_W - 1, n_rows)
    return preds, tgts, n_targets


def np_lane_iou(pred_rel, tgt_rel, lane_width=7.5 / 768, img_h=400, img_w=960):
    """CLRerNet LaneIoULoss.calc_iou with slope-adaptive widths
    (dynamic_assignV2.py:55-101). pred/tgt: [N, O] relative. Geometry
    defaults are LaneIoULoss's own img_h=400/img_w=960 — the reference
    constructs it with defaults, not the model's image size."""
    n_strips = pred_rel.shape[1] - 1
    dy = img_h / n_strips * 2

    def widths(xs, clamp):
        dx = (xs[:, 2:] - xs[:, :-2]) * img_w
        if clamp:
            dx = np.where(np.abs(dx) > 1e4, 0.0, dx)
        w = lane_width * np.sqrt(dx**2 + dy**2) / dy
        return np.concatenate([w[:, :1], w, w[:, -1:]], 1)

    pw, tw = widths(pred_rel, False), widths(tgt_rel, True)
    ovr = np.minimum(pred_rel + pw, tgt_rel + tw) - np.maximum(pred_rel - pw, tgt_rel - tw)
    uni = np.maximum(pred_rel + pw, tgt_rel + tw) - np.minimum(pred_rel - pw, tgt_rel - tw)
    bad = (tgt_rel < 0) | (tgt_rel >= 1.0)
    ovr[bad] = 0
    uni[bad] = 0
    return ovr.sum(-1) / (uni.sum(-1) + 1e-9)


def np_assign_cost_ol(preds, tgts_valid):
    """OL `assign` cost (dynamic_assign.py:128-190): xs at cols >= 6."""
    p = preds.copy()
    t = tgts_valid.copy()
    p[:, 6:] *= (IMG_W - 1)
    pd, td = p[:, 6:], t[:, 6:]
    bad = (td < 0) | (td >= IMG_W)
    lengths = (~bad).sum(1)
    d = np.abs(td[None] - pd[:, None])
    d[np.broadcast_to(bad[None], d.shape)] = 0
    distances = d.sum(-1) / (lengths[None] + 1e-9)
    dist_score = 1 - distances / (distances.max() + 1e-4)
    sig = 1 / (1 + np.exp(-p[:, :2]))
    eps = 1e-12
    neg = -np.log(1 - sig + eps) * 0.75 * sig**2
    pos = -np.log(sig + eps) * 0.25 * (1 - sig) ** 2
    cls_score = (pos[:, 1] - neg[:, 1])[:, None]
    t_xy = np.stack([t[:, 2] * (IMG_H - 1), t[:, 3] * (IMG_W - 1)], 1)
    p_xy = np.stack([p[:, 2] * (IMG_H - 1), p[:, 3] * (IMG_W - 1)], 1)
    start_d = np.sqrt(((p_xy[:, None] - t_xy[None]) ** 2).sum(-1))
    start_score = 1 - start_d / (start_d.max() + 1e-4)
    th = np.abs(p[:, 4, None] - t[None, :, 4]) * 180
    th_score = 1 - th / (th.max() + 1e-4)
    cost = -((dist_score * start_score * th_score) ** 2) * 3 + cls_score
    iou = np_line_iou_pairwise(p[:, 6:], t[:, 6:], IMG_W)
    return cost - iou


def np_frame_loss_ol(pred_fir, pred_sec, diff, label, lc):
    """Criterion4OL oracle (loss4OLV3.py:34-123)."""
    valid = label[:, 1] == 1
    tv = label[valid]
    n_t = len(tv)
    scale = np.array([35.0, IMG_W - 1.0, 180.0, 35.0])

    def branch(preds_s):
        cls_vec = np.zeros(A)
        reg = 0.0
        iou = 0.0
        for s in range(preds_s.shape[0]):
            pred = preds_s[s]
            cost = np_assign_cost_ol(pred, tv)
            rows, cols = linear_sum_assignment(cost.T)
            m = np.zeros(n_t, int)
            m[rows] = cols
            cls_t = np.zeros(A, int)
            cls_t[m] = 1
            cls_vec += np_focal(pred[:, :2], cls_t, lc.focal_alpha, lc.focal_gamma)
            rp = pred[m, 2:6] * scale
            rt = tv[:, 2:6] * scale
            reg += np_smooth_l1(rp - rt).mean()
            # reg_pred = pred_xs*(w-1)/w relative; targets /w (loss4OLV3.py:74-77)
            pr = pred[m, 6:] * (IMG_W - 1) / IMG_W
            tr = tv[:, 6:] / IMG_W
            iou += (1 - np_lane_iou(pr, tr)).mean()
        return cls_vec / 3, reg / 3, iou / 3

    ca, ra, ia = branch(pred_fir)
    cb, rb, ib = branch(pred_sec)
    d = diff.mean(0)
    delta = np_torch_median(ca - cb)
    cls_blend = ((1 - d) * (ca - delta / 2) + d * (cb + delta / 2)).sum()
    return (ra + rb) * lc.reg_weight + (ia + ib) * lc.iou_weight + cls_blend * lc.cls_weight


@pytest.mark.parametrize("seed,n_targets", [(0, 3), (1, 2)])
def test_ol_frame_loss_matches_oracle(seed, n_targets):
    rng = np.random.default_rng(seed + 90)
    preds_f = np.stack([random_problem_ol(seed * 9 + s)[0] for s in range(3)])
    preds_s = np.stack([random_problem_ol(seed * 9 + 20 + s)[0] for s in range(3)])
    _, tgts, _ = random_problem_ol(seed, n_targets)
    diff = rng.uniform(0.5, 0.99, (3, A)).astype(np.float32)

    cfg = ModelConfig(img_h=IMG_H, img_w=IMG_W, lane=OL_SPEC, max_lanes=L)
    lc = LossConfig(cls_weight=8.0, reg_weight=0.5, iou_weight=1.5,
                    focal_alpha=(0.1, 0.9), style="blend_cls",
                    use_lane_iou=True)
    crit = LaneCriterion(cfg, lc)
    ours, _ = crit.frame_loss(
        jnp.array(preds_f), jnp.array(preds_s), jnp.array(diff),
        jnp.array(tgts))
    oracle = np_frame_loss_ol(preds_f, preds_s, diff, tgts, lc)
    np.testing.assert_allclose(float(ours), oracle, rtol=2e-3)
