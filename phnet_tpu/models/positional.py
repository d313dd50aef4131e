"""Anchor-index positional encodings for the second (global) branch.

* sinusoid table: reference ``SeqFormer/position_encoding.py:59-89``
  (``PositionalEncoding``; VIL uses temperature=16, normalize=True,
  ``RouterV4.py:110-111``)
* learned embedding: ``position_encoding.py:116-131``
  (``PositionalEncodingLearned``; OL, ``Router4OL.py:110``)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoid_table(n_position: int, d_hid: int, temperature: float,
                   normalize: bool) -> np.ndarray:
    """[n_position, d_hid] sinusoid encoding of anchor index."""
    p = np.arange(n_position, dtype=np.float32)
    if normalize:
        eps = 1e-6
        p = (p - 0.5) / (p[-1] + eps) * (2 * math.pi)
    dim_t = np.arange(d_hid, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / d_hid)
    pos = p[:, None] / dim_t[None, :]
    pos[:, 0::2] = np.sin(pos[:, 0::2])
    pos[:, 1::2] = np.cos(pos[:, 1::2])
    return pos


class AnchorPositionalEncoding(nn.Module):
    """Per-anchor positional features, shape [A, d]."""

    num_anchors: int
    dim: int
    kind: str = "sine"  # "sine" | "learned"
    temperature: float = 16.0
    normalize: bool = True

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        if self.kind == "learned":
            emb = self.param(
                "embedding",
                nn.initializers.uniform(scale=1.0),
                (self.num_anchors, self.dim),
            )
            return emb
        table = sinusoid_table(self.num_anchors, self.dim, self.temperature,
                               self.normalize)
        return jnp.asarray(table)
