from .logger import AverageMeter, TextLogger
from .profiler import (
    cost_summary,
    format_breakdown,
    latency_profile,
    stage_breakdown,
)

__all__ = [
    "AverageMeter",
    "TextLogger",
    "cost_summary",
    "format_breakdown",
    "latency_profile",
    "stage_breakdown",
]
