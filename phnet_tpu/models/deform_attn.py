"""MSDeformAttn module (SeqFormer deformable attention), TPU-native.

Reference ``libs/models/SeqFormer/ops/modules/ms_deform_attn.py:32-129``
('encode' mode — the reference's 'decode' mode serves only the SeqFormer
VIS decoder, which no active lane model instantiates). Parameter layout
and the characteristic initialization are reproduced exactly:

* ``sampling_offsets``: zero kernel, bias = per-head unit directions
  scaled by point index (``_reset_parameters``, ``:66-73``);
* ``attention_weights``: zero kernel and bias (uniform softmax at init);
* ``value_proj`` / ``output_proj``: Xavier-uniform kernels, zero bias.

The clip axis (nf) is vmapped instead of the reference's Python frame
loop (``encode_forward``, ``:105-124``); the sampling core is
:func:`phnet_tpu.ops.ms_deform_attn.ms_deform_attn`.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms_deform_attn import ms_deform_attn


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional grid bias (ms_deform_attn.py:67-73): head h points at
    angle 2*pi*h/H, normalized to the unit box, scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    grid = grid * (np.arange(n_points, dtype=np.float32) + 1.0)[None, None, :, None]
    return grid.reshape(-1)


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        reference_points: jnp.ndarray,
        input_flatten: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]],
        input_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """query: [N, nf, Lq, C]; reference_points: [N, nf, Lq, L, 2] in
        [0,1]; input_flatten: [N, nf, S, C] (S = sum H_l*W_l);
        input_padding_mask: [N, nf, S] bool (True = pad). -> [N, nf, Lq, C]
        """
        c, m, nl, p = self.d_model, self.n_heads, self.n_levels, self.n_points
        assert c % m == 0, (c, m)
        d = c // m
        n, nf, lq, _ = query.shape
        s = input_flatten.shape[2]

        value = nn.Dense(
            c, name="value_proj",
            kernel_init=nn.initializers.xavier_uniform())(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(n, nf, s, m, d)

        offsets = nn.Dense(
            m * nl * p * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_bias_init(m, nl, p), dtype),
        )(query).reshape(n, nf, lq, m, nl, p, 2)
        attn = nn.Dense(
            m * nl * p, name="attention_weights",
            kernel_init=nn.initializers.zeros,
        )(query).reshape(n, nf, lq, m, nl * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(n, nf, lq, m, nl, p)

        # sampling_locations = ref + offset / (W_l, H_l) (encode_forward
        # :112-115); reference_points broadcast over heads and points
        norm = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], jnp.float32)  # [L, 2]
        locs = (
            reference_points[:, :, :, None, :, None, :]
            + offsets / norm[None, None, None, None, :, None, :]
        )  # [N, nf, Lq, M, L, P, 2]

        sample = jax.vmap(
            ms_deform_attn, in_axes=(1, None, 1, 1), out_axes=1)
        out = sample(value, tuple(spatial_shapes), locs, attn)
        return nn.Dense(
            c, name="output_proj",
            kernel_init=nn.initializers.xavier_uniform())(out)
