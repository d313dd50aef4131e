"""Router-blended two-branch lane criterion.

Reproduces the active criteria with fixed shapes and on-device assignment:

* VIL ``DILaneCriterionV5`` (``libs/utils/lossV5.py:71-208``): per
  stage x branch, Hungarian assign -> focal cls on all anchors (vector),
  smooth-L1 on (start_y, start_x, theta, valid_len, invalid_len), LineIoU;
  per-anchor losses of the two branches are median-centered and blended by
  the router score: ``sum((1-d)*loss_A + d*loss_B)``.
* OL ``Criterion4OL`` (``libs/utils/loss4OLV3.py:12-123``): same scheme but
  the router blend applies to the cls vectors only; reg + width-adaptive
  LaneIoU (CLRerNet) of both branches are added as scalars.

Everything is vmapped over (T, B) and jits into the training step — no
host round trips (the reference bounced to scipy on CPU per frame).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import LossConfig, ModelConfig
from .assign import (
    assign_frame,
    lane_iou_aligned,
    line_iou_aligned,
)
from .focal import softmax_focal_loss


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    absx = jnp.abs(x)
    return jnp.where(absx < beta, 0.5 * absx**2 / beta, absx - 0.5 * beta)


class LaneCriterion:
    def __init__(self, cfg: ModelConfig, loss_cfg: LossConfig):
        self.cfg = cfg
        self.loss = loss_cfg
        spec = cfg.lane
        n_strips = float(spec.n_strips)
        if spec.n_lengths == 2:
            # start_y, start_x, theta, valid_len, invalid_len (lossV5.py:126-147)
            self.reg_scale = jnp.array(
                [n_strips, cfg.img_w - 1.0, 180.0, n_strips, n_strips]
            )
        else:
            self.reg_scale = jnp.array(
                [n_strips, cfg.img_w - 1.0, 180.0, n_strips]
            )

    # ------------------------------------------------------------------
    def _branch_loss(self, preds, label, valid):
        """One frame, one branch.

        preds: [S, A, dim]; label: [L, dim]; valid: [L] bool.
        Returns (cls_vec [A], reg_vec [L], iou_vec [L], matched_last [L],
        reg_scalar, iou_scalar) — vec variants feed the VIL per-anchor blend,
        scalars feed the OL style.
        """
        cfg, spec = self.cfg, self.cfg.lane
        s, a, _ = preds.shape
        n_reg = 3 + spec.n_lengths
        n_t = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
        any_t = valid.any()

        cls_vec = jnp.zeros((a,))
        reg_vec = jnp.zeros((valid.shape[0],))
        iou_vec = jnp.zeros((valid.shape[0],))
        matched_last = jnp.zeros((valid.shape[0],), jnp.int32)

        for st in range(s):
            pred = preds[st]
            matched = assign_frame(pred, label, valid, spec, cfg.img_w, cfg.img_h)
            matched_last = matched

            cls_target = (
                jnp.zeros((a,), jnp.int32).at[matched].add(valid.astype(jnp.int32))
            )
            cls_target = jnp.where(any_t, cls_target, jnp.zeros_like(cls_target))
            cls_vec = cls_vec + softmax_focal_loss(
                pred[:, :2], cls_target, self.loss.focal_alpha, self.loss.focal_gamma
            )

            mrows = pred[matched]  # [L, dim]
            reg_pred = mrows[:, 2 : 2 + n_reg] * self.reg_scale
            reg_tgt = label[:, 2 : 2 + n_reg] * self.reg_scale
            reg_l = smooth_l1(reg_pred - reg_tgt).mean(-1)  # [L]
            reg_l = jnp.where(valid, reg_l, 0.0)
            reg_vec = reg_vec + reg_l / n_t

            pred_xs_px = mrows[:, spec.col_xs :] * (cfg.img_w - 1)
            tgt_xs_px = label[:, spec.col_xs :]
            if self.loss.use_lane_iou:
                # CLRerNet LaneIoU on relative coords (loss4OLV3.py:74-77)
                iou = lane_iou_aligned(
                    pred_xs_px / cfg.img_w,
                    tgt_xs_px / cfg.img_w,
                    cfg.img_h, cfg.img_w,
                    lane_width=self.loss.lane_iou_width,
                )
            else:
                iou = line_iou_aligned(
                    pred_xs_px, tgt_xs_px, cfg.img_w, self.loss.iou_length
                )
            iou_l = jnp.where(valid, 1.0 - iou, 0.0)
            iou_vec = iou_vec + iou_l / n_t

        stages = float(s)
        cls_vec = cls_vec / stages
        reg_vec = reg_vec / stages
        iou_vec = iou_vec / stages
        # scalar style (OL): per-stage means over matched rows, summed over
        # stages then /stages — identical to mean of the masked vec * n_t / n_t
        reg_scalar = reg_vec.sum()
        iou_scalar = iou_vec.sum()
        return cls_vec, reg_vec, iou_vec, matched_last, reg_scalar, iou_scalar

    def _inst_loss(self, cls_vec, reg_vec, iou_vec, matched_last, valid):
        """Per-anchor instance loss (``lossV5.py:186-192``):
        cls everywhere + (reg+iou) scattered at the last stage's matches."""
        inst = cls_vec * self.loss.cls_weight
        upd = (
            reg_vec * self.loss.reg_weight + iou_vec * self.loss.iou_weight
        ) * valid.astype(cls_vec.dtype)
        return inst.at[matched_last].add(upd)

    # ------------------------------------------------------------------
    def frame_loss(self, pred_fir, pred_sec, diff, label) -> Tuple[jnp.ndarray, Dict]:
        """Loss of one frame. pred_*: [S, A, dim]; diff: [S, A]; label [L, dim]."""
        valid = label[:, 1] == 1.0
        a_out = self._branch_loss(pred_fir, label, valid)
        b_out = self._branch_loss(pred_sec, label, valid)
        diff_frame = diff.mean(axis=0)  # [A]

        if self.loss.style == "blend_all":
            loss_a = self._inst_loss(a_out[0], a_out[1], a_out[2], a_out[3], valid)
            loss_b = self._inst_loss(b_out[0], b_out[1], b_out[2], b_out[3], valid)
            delta = jax.lax.stop_gradient(jnp.median(loss_a - loss_b))
            loss_a = loss_a - delta / 2.0
            loss_b = loss_b + delta / 2.0
            total = jnp.sum((1.0 - diff_frame) * loss_a + diff_frame * loss_b)
        else:  # blend_cls (loss4OLV3.py:104-123)
            cls_a, cls_b = a_out[0], b_out[0]
            delta = jax.lax.stop_gradient(jnp.median(cls_a - cls_b))
            cls_blend = jnp.sum(
                (1.0 - diff_frame) * (cls_a - delta / 2.0)
                + diff_frame * (cls_b + delta / 2.0)
            )
            total = (
                (a_out[4] + b_out[4]) * self.loss.reg_weight
                + (a_out[5] + b_out[5]) * self.loss.iou_weight
                + cls_blend * self.loss.cls_weight
            )
        metrics = {
            "cls": a_out[0].sum() + b_out[0].sum(),
            "reg": a_out[4] + b_out[4],
            "iou": a_out[5] + b_out[5],
        }
        return total, metrics

    def __call__(self, outs, labels) -> Tuple[jnp.ndarray, Dict]:
        """Clip loss.

        outs: TrainFrameOut with pred_fir/pred_sec [T, S, B, A, dim] and
        diff [T, S, B, A]; labels: [B, T, L, dim].
        Returns mean per-frame loss (reference ``total_loss / (N*T)``,
        ``trainVIL.py:238-243``) and summed metrics.
        """
        labels_t = labels.swapaxes(0, 1)  # [T, B, L, dim]

        def per_frame(pf, ps, df, lab):
            # pf/ps: [S, B, A, dim]; df: [S, B, A]; lab: [B, L, dim]
            return jax.vmap(self.frame_loss, in_axes=(1, 1, 1, 0))(pf, ps, df, lab)

        losses, metrics = jax.vmap(per_frame)(
            outs.pred_fir, outs.pred_sec, outs.diff, labels_t
        )
        total = losses.mean()
        metrics = {k: v.mean() for k, v in metrics.items()}
        return total, metrics
