"""Host clip loader: sharding, shuffling, prefetch, fixed-shape collation.

Replaces the reference's DataLoader + DistributedSampler machinery
(``trainVIL.py:96-103``): per-process index sharding (DistributedSampler
equivalent), epoch-seeded shuffling (``set_epoch``), background-thread
prefetch (workers), and collation to [B, T, ...] arrays the jitted step
consumes directly.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate_clips(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Stack per-clip dicts to [B, T, ...] (``dataV3.py:23-42``
    multibatch_collate_fn equivalent; clips are equal length in training)."""
    out = {
        "frames": np.stack([s["frames"] for s in samples]),
        "labels": np.stack([s["labels"] for s in samples]),
    }
    out["infos"] = [
        {k: s[k] for k in s if k not in ("frames", "labels")} for s in samples
    ]
    return out


class ClipLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        seed: int = 3407,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # pad so every shard sees the same number of batches
        per = -(-n // self.num_shards)
        idx = np.concatenate([idx, idx[: per * self.num_shards - n]])
        return idx[self.shard_index :: self.num_shards].tolist()

    def __len__(self):
        per_shard = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.prefetch <= 0:
            for b in batches:
                yield collate_clips([self.dataset[i] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(collate_clips([self.dataset[i] for i in b]))
            finally:
                q.put(stop)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
