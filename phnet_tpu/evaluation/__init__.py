from .emit import (
    read_lines_txt,
    write_gt_txt,
    write_pred_txt,
)
from .culane_metric import culane_metric, culane_match, aggregate_results
from .temporal import temporal_metric_video, aggregate_temporal

__all__ = [
    "read_lines_txt",
    "write_gt_txt",
    "write_pred_txt",
    "culane_metric",
    "culane_match",
    "aggregate_results",
    "temporal_metric_video",
    "aggregate_temporal",
]
