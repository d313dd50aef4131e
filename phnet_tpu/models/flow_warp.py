"""Flow-guided feature warping (the functional core of DFF).

Reference ``libs/models/DFF.py:73-135`` (``warpModel``). The DFF module
is dead code on the reference's shipped paths (its import is commented
out in ``RouterV4.py:16`` and ``taskModel.forward`` raises mid-function,
``DFF.py:169``), but ``warpModel``'s active surface — warp the previous
frame's features along a normalized flow field and fuse with a residual
block — is a complete, runnable component and is ported here.

Active forward path (``DFF.py:119-135``): ``flow_warp`` samples the last
feature map at ``base_grid + flow`` with
``grid_sample(align_corners=True, padding_mode='zeros')``, then
``residual_block`` fuses ``concat([curr, warped])`` through a 1x1 conv +
frozen BN + ReLU. The reference also declares flow-*generation* layers
(``conv_l``/``conv_c``/``flow_make``/``flow_bn``) that its forward never
uses (``generate_flow`` is commented out at ``:131``); this port does NOT
declare them (see :class:`WarpModel`) — flow arrives precomputed, ours
from ``data/flow.py``'s Farneback fields.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampler import bilinear_sample


def flow_warp(feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp ``feat`` [B, H, W, C] by ``flow`` [B, H, W, 2] (normalized
    grid offsets in the reference's [-1, 1] convention, (x, y) order).

    grid_sample(align_corners=True): grid g in [-1, 1] maps to pixel
    (g + 1) / 2 * (size - 1); out-of-bounds samples are zero.
    """
    b, h, w, _ = feat.shape
    gx = jnp.linspace(-1.0, 1.0, w)[None, None, :]  # [1, 1, W]
    gy = jnp.linspace(-1.0, 1.0, h)[None, :, None]  # [1, H, 1]
    x = (gx + flow[..., 0] + 1.0) / 2.0 * (w - 1)
    y = (gy + flow[..., 1] + 1.0) / 2.0 * (h - 1)
    sample = jax.vmap(
        lambda f, xx, yy: bilinear_sample(f.transpose(2, 0, 1), xx, yy))
    return sample(feat, x, y)  # [B, H, W, C]


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine (``DFF.py:33-70``);
    parameters live in the ``params`` collection so checkpoints load,
    but no statistics are ever updated."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class WarpModel(nn.Module):
    """``warpModel(inplane, outplane)`` — NHWC."""

    inplane: int
    outplane: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, last_feature: jnp.ndarray, curr_feature: jnp.ndarray,
                 flow: jnp.ndarray) -> jnp.ndarray:
        """last/curr_feature: [B, H, W, inplane]; flow: [B, H, W, 2]
        normalized as in ``generate_flow`` (:95 divides px flow by (W, H)).
        Returns [B, H, W, outplane].

        The reference's flow-generation layers (``conv_l``/``conv_c``/
        ``flow_make``/``flow_bn``) are NOT declared: its forward never
        calls them (``generate_flow`` commented out at :131) and no DFF
        checkpoint can exist — ``taskModel.forward`` raises
        unconditionally (``DFF.py:169``), so nothing trains them."""
        warped = flow_warp(last_feature, flow)
        fused = jnp.concatenate([curr_feature, warped], axis=-1)
        out = nn.Conv(
            self.outplane, (1, 1), use_bias=False, name="conv")(fused)
        out = FrozenBatchNorm(self.outplane, name="bn")(out)
        return nn.relu(out)
