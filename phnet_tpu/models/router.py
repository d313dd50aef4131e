"""Adaptive per-anchor difficulty router.

Reference ``libs/models/Router.py:39-81`` (``AdaptiveRouter4Lane``): per
refine stage, LayerNorm over the pooled [C, P] anchor feature plane, four
residual blocks of per-anchor depthwise 3x3 convs (groups = num_priors,
i.e. each anchor's [C, P] plane has its own kernel), then an MLP
``C*P -> C*P/reduction -> 1`` ending in ReLU, squashed by sigmoid.

Because the MLP ends in ReLU, the routed score lives in [0.5, 1): a
faithful reproduction — the VIL hard-selection ``diff >= 0.5``
(``RouterV4.py:500``) therefore always picks the second branch at
inference, exactly as the reference does.

The router always sees stop-gradient features (``RouterV4.py:240``); its
training signal comes only from the loss-blending term.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNormCP(nn.Module):
    """LayerNorm over the joint (C, P) trailing dims with elementwise affine,
    matching ``nn.LayerNorm([C, P])`` in the reference."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [..., C, P]
        c, p = x.shape[-2], x.shape[-1]
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (c, p))
        bias = self.param("bias", nn.initializers.zeros, (c, p))
        return y * scale + bias


class DepthwiseAnchorConv(nn.Module):
    """Per-anchor depthwise 3x3 conv over the (C, P) plane.

    Reference: ``nn.Conv2d(A, A, kernel_size=3, padding=1, groups=A)`` on
    input [B, A, C, P] (``Router.py:57-62``).
    """

    num_anchors: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, A, C, P] -> NHWC with channels=A: [B, C, P, A]
        y = jnp.moveaxis(x, 1, -1)
        y = nn.Conv(
            features=self.num_anchors,
            kernel_size=(3, 3),
            padding=1,
            feature_group_count=self.num_anchors,
        )(y)
        return jnp.moveaxis(y, -1, 1)


class AdaptiveRouter(nn.Module):
    """Per-stage difficulty scores in (0, 1); call once per stage."""

    num_anchors: int = 240
    channels: int = 64
    points: int = 36
    reduction: int = 4
    blocks: int = 4

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats: [B, A, C, P] (pre stop-gradient by caller) -> [B, A, 1]."""
        x = LayerNormCP(name="pre_norm")(feats)
        for b in range(self.blocks):
            y = DepthwiseAnchorConv(self.num_anchors, name=f"dw{b}_conv1")(x)
            y = LayerNormCP(name=f"dw{b}_norm1")(y)
            y = nn.relu(y)
            y = DepthwiseAnchorConv(self.num_anchors, name=f"dw{b}_conv2")(y)
            y = LayerNormCP(name=f"dw{b}_norm2")(y)
            x = nn.relu(y + x)
        flat = x.reshape(*x.shape[:-2], self.channels * self.points)
        hidden = self.channels * self.points // self.reduction
        tanh_gain = 5.0 / 3.0
        init = nn.initializers.variance_scaling(
            tanh_gain**2, "fan_avg", "uniform"
        )  # xavier_uniform with tanh gain (Router.py:70-74)
        h = nn.Dense(hidden, kernel_init=init)(flat)
        h = nn.relu(h)
        h = nn.Dense(1, kernel_init=init)(h)
        h = nn.relu(h)
        return jax.nn.sigmoid(h)
