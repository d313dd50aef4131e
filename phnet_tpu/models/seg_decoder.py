"""Optional segmentation decoder head.

Reference ``libs/models/utils/seg_decoder.py:5-28`` (``SegDecoder``):
Dropout2d(0.1) -> 1x1 conv to num_class -> bilinear upsample to the full
image. Inactive on the reference's shipped paths but part of the
component surface; NHWC here, with ``jax.image.resize`` (half-pixel
centers == ``align_corners=False``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SegDecoder(nn.Module):
    image_height: int
    image_width: int
    num_class: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, h, w, C*refine_layers] stacked per-stage features ->
        [B, image_height, image_width, num_class] logits."""
        # Dropout2d drops whole channels: broadcast the mask over (h, w)
        x = nn.Dropout(
            self.dropout_rate, broadcast_dims=(1, 2), deterministic=not train,
            name="dropout")(x)
        x = nn.Conv(self.num_class, (1, 1), name="conv")(x)
        b, _, _, c = x.shape
        return jax.image.resize(
            x, (b, self.image_height, self.image_width, c), method="bilinear")
