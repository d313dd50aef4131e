from .assign import assign_frame, assignment_cost, line_iou_pairwise, line_iou_aligned
from .focal import softmax_focal_loss
from .criterion import LaneCriterion

__all__ = [
    "assign_frame",
    "assignment_cost",
    "line_iou_pairwise",
    "line_iou_aligned",
    "softmax_focal_loss",
    "LaneCriterion",
]
