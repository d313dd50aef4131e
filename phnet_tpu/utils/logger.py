"""Plain-text training logger + windowed average meter.

Equivalent of the reference's ``libs/utils/logger.py``: an append-only
table logger (epoch, LR, loss, ...) and an ``AverageMeter`` with a bounded
window (reference uses a 480-deque).
"""

from __future__ import annotations

import os
from collections import deque
from typing import Iterable, Sequence


class AverageMeter:
    def __init__(self, window: int = 480):
        self.window = window
        self.reset()

    def reset(self):
        self.values = deque(maxlen=self.window)
        self.val = 0.0
        self.count = 0
        self.total = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.count += n
        self.total += val * n
        self.values.append(val)

    @property
    def avg(self) -> float:
        return sum(self.values) / max(len(self.values), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class TextLogger:
    """Append-only column logger (reference ``Logger``)."""

    def __init__(self, path: str, resume: bool = True):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.file = open(path, "a" if resume else "w")
        self.items: Sequence[str] = ()

    def set_items(self, items: Iterable[str]):
        self.items = list(items)
        self.file.write("\t".join(self.items) + "\n")
        self.file.flush()

    def log(self, *values):
        self.file.write(
            "\t".join(
                f"{v:.6g}" if isinstance(v, float) else str(v) for v in values
            )
            + "\n"
        )
        self.file.flush()

    def close(self):
        self.file.close()
