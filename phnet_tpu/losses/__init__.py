from .assign import (
    anc_assign,
    assign_cross_frame,
    assign_frame,
    assign_one2many,
    assignment_cost,
    dynamic_k_assign,
    dynamic_topk_assign,
    lane_iou_aligned,
    lane_iou_cost_pairwise,
    line_iou_aligned,
    line_iou_pairwise,
)
from .focal import softmax_focal_loss
from .criterion import LaneCriterion

__all__ = [
    "anc_assign",
    "assign_cross_frame",
    "assign_frame",
    "assign_one2many",
    "assignment_cost",
    "dynamic_k_assign",
    "dynamic_topk_assign",
    "lane_iou_aligned",
    "lane_iou_cost_pairwise",
    "line_iou_pairwise",
    "line_iou_aligned",
    "softmax_focal_loss",
    "LaneCriterion",
]
