from .nms import lane_nms, nms_proposals_from_predictions
from .sampler import bilinear_sample
from .hungarian import hungarian_assign
from .ms_deform_attn import ms_deform_attn

__all__ = [
    "lane_nms",
    "nms_proposals_from_predictions",
    "bilinear_sample",
    "hungarian_assign",
    "ms_deform_attn",
]
