from .cache import enable_persistent_cache
from .logger import AverageMeter, TextLogger
from .profiler import (
    checksum,
    cost_summary,
    format_breakdown,
    latency_profile,
    stage_breakdown,
)

__all__ = [
    "AverageMeter",
    "TextLogger",
    "checksum",
    "enable_persistent_cache",
    "cost_summary",
    "format_breakdown",
    "latency_profile",
    "stage_breakdown",
]
