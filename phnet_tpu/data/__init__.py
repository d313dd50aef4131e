from .transforms import Normalize, TrainAugment, resize_with_lanes
from .synthetic import SyntheticVideoDataset, synthetic_clip
from .loader import ClipLoader, collate_clips

__all__ = [
    "Normalize",
    "TrainAugment",
    "resize_with_lanes",
    "SyntheticVideoDataset",
    "synthetic_clip",
    "ClipLoader",
    "collate_clips",
]
