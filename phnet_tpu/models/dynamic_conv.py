"""Instance-interaction head with dynamically generated weights.

Reference ``libs/models/utils/dynamic_head.py:6-59`` (``DynamicConv``,
SparseRCNN-style): a proposal embedding generates a per-anchor weight matrix
[C, 2C]; the pooled ROI feature [P, C] is multiplied through it, then a
second generated matrix [2C, C] (conditioned on the stop-gradded
intermediate) maps back, followed by a flattening output MLP.

TPU mapping: the per-anchor bmm's become batched ``einsum`` contractions —
dense MXU work batched over (B, A); the weight-generator MLPs are the FLOPs
hot spot of the whole head and map straight onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DynamicConv(nn.Module):
    """V1 (``DynamicConv``, dynamic_head.py:6): roi channels == out dim.
    V2 (``DynamicConvV2`` :61, the multi-scale variant): per-stage roi
    channels map into a shared ``out_dim`` (256), ``param_reduction=4`` and
    ``out_hidden = 2 * out_dim``; set those fields accordingly."""

    feat_size: int = 36  # P
    hidden_dim: int = 64  # C (roi feature channels)
    dim_factor: int = 2  # dim_dynamic = C * factor
    param_reduction: int = 8
    out_expand: int = 6
    out_dim: int = 0  # 0 -> hidden_dim (V1); V2 uses reg_hidden_dim
    out_hidden: int = 0  # 0 -> hidden_dim * out_expand
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pro_feat: jnp.ndarray, roi_feat: jnp.ndarray) -> jnp.ndarray:
        """pro_feat: [B, A, pro_dim]; roi_feat: [B, A, P, C] -> [B, A, out]."""
        c = self.hidden_dim
        d = c * self.dim_factor
        num_params = c * d
        hid = num_params // self.param_reduction
        out_dim = self.out_dim or c
        out_hidden = self.out_hidden or c * self.out_expand

        pro_feat = pro_feat.astype(self.dtype)
        roi_feat = roi_feat.astype(self.dtype)

        # first generated weight: [B, A, C, D]
        w1 = nn.Dense(hid, dtype=self.dtype, name="gen1_a")(pro_feat)
        w1 = nn.Dense(num_params, dtype=self.dtype, name="gen1_b")(w1)
        w1 = w1.reshape(*w1.shape[:-1], c, d)
        feats = jnp.einsum("bapc,bacd->bapd", roi_feat, w1)
        feats = nn.LayerNorm(dtype=self.dtype, name="norm1")(feats)
        feats = nn.relu(feats)

        # second generated weight conditioned on stop-gradded activations
        # (dynamic_head.py:48-50 detaches before the generator MLP)
        gen_in = jax.lax.stop_gradient(feats).reshape(
            *feats.shape[:-2], self.feat_size * d
        )
        w2 = nn.Dense(hid, dtype=self.dtype, name="gen2_a")(gen_in)
        w2 = nn.Dense(num_params, dtype=self.dtype, name="gen2_b")(w2)
        w2 = w2.reshape(*w2.shape[:-1], d, c)
        feats = jnp.einsum("bapd,badc->bapc", feats, w2)
        feats = nn.LayerNorm(dtype=self.dtype, name="norm2")(feats)
        feats = nn.relu(feats)

        flat = feats.reshape(*feats.shape[:-2], self.feat_size * c)
        out = nn.Dense(out_hidden, dtype=self.dtype, name="out_a")(flat)
        out = nn.Dense(out_dim, dtype=self.dtype, name="out_b")(out)
        out = nn.LayerNorm(dtype=self.dtype, name="norm3")(out)
        return out.astype(jnp.float32)
