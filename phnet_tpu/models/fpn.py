"""FPN neck (flax.linen, NHWC).

Equivalent of the reference's mmdet-style FPN (``libs/models/fpn.py:9-163``)
with the active configuration: plain convs (no norm/act), nearest-neighbour
top-down upsampling, 1x1 laterals + 3x3 output convs, and the same
"drop leading inputs when given more levels than in_channels" behaviour
(``fpn.py:113-116``).

Per-level ``out_channels`` (a tuple) reproduces the multi-scale variant's
``fpnV2`` (``libs/models/fpnV2.py``): each level keeps its own width and
1x1 ``upsample_convs`` project channels down along the top-down path.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    b, h, w, c = x.shape
    th, tw = target_hw
    return jax.image.resize(x, (b, th, tw, c), method="nearest")


class FPN(nn.Module):
    in_channels: Tuple[int, ...] = (128, 256, 512)
    out_channels: Union[int, Tuple[int, ...]] = 64
    num_outs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        inputs = list(inputs)
        if len(inputs) > len(self.in_channels):
            inputs = inputs[len(inputs) - len(self.in_channels):]

        n = len(inputs)
        if isinstance(self.out_channels, int):
            per_level = [self.out_channels] * n
        else:
            per_level = list(self.out_channels)

        laterals = [
            nn.Conv(per_level[i], (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = laterals[i]
            if per_level[i] != per_level[i - 1]:
                up = nn.Conv(per_level[i - 1], (1, 1), dtype=self.dtype,
                             name=f"upsample_{i - 1}")(up)
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                up, laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(per_level[i], (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_{i}")(lat)
            for i, lat in enumerate(laterals)
        ]
        # extra levels via stride-2 max pool (fpn.py:145-149)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
