"""ROIGather — cross-attention global-context pooling for prior features.

Reference ``libs/models/utils/roi_gather.py:23-139`` (CLRNet lineage;
inactive on the reference's shipped paths — ``LinearModule`` is the live
pooling, ported as ``head.BranchHead`` — but part of the component
surface). Faithful port:

* ``roi_fea``: per-stage (9, 1) conv+BN+ReLU over the pooled-point axis,
  stage-concat, then a ``catconv`` back to ``in_channels`` (:97-104);
* fc + LayerNorm + ReLU to one vector per prior (:115-117);
* cross-attention of priors against the feature map resized to a fixed
  (10, 25) grid (nearest interpolation, ``FeatureResize`` :13-20), with
  per-prior grouped 1x1 convs for query (+ReLU) and output (zero-init W,
  :64-73) and scale ``in_channels**-0.5``;
* dropout(0.1) on the context, residual into the roi vector (:136).

NHWC throughout; the per-prior grouped Conv1d(k=1, groups=num_priors)
is a per-prior (scale, bias) pair applied across channels — stored as
``[A, 1]`` weight + ``[A, 1]`` bias and applied as one fused multiply-add.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBNReLU(nn.Module):
    """mmcv ``ConvModule(conv, BN, ReLU)`` equivalent (eval-style BN is a
    separate batch_stats collection, as everywhere in this repo)."""

    features: int
    kernel: tuple
    padding: tuple
    # mmcv ConvModule bias='auto': no conv bias when a norm follows
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel,
                    padding=[(p, p) for p in self.padding],
                    use_bias=self.use_bias, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class ROIGather(nn.Module):
    """``use_attention=False`` reproduces ``ROIGather_T`` (:141-256), the
    truncated variant whose forward stops after the fc+LN+ReLU roi vector
    (its attention branch is commented out in the reference)."""

    in_channels: int
    num_priors: int
    sample_points: int
    fc_hidden_dim: int
    refine_layers: int
    mid_channels: int = 48
    resize_hw: tuple = (10, 25)
    dropout_rate: float = 0.1
    use_attention: bool = True

    def _per_prior_conv(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        """Grouped Conv1d(A, A, k=1, groups=A) on [B, A, C]: per-prior
        scale + bias. ``W`` is zero-init like the reference (:72-73)."""
        init = nn.initializers.zeros if name == "W" else (
            lambda key, shape: nn.initializers.lecun_normal()(
                key, (shape[0], 1)).reshape(shape))
        weight = self.param(f"{name}_weight", init, (self.num_priors, 1))
        bias = self.param(f"{name}_bias", nn.initializers.zeros,
                          (self.num_priors, 1))
        return x * weight + bias

    @nn.compact
    def __call__(
        self,
        roi_features: Sequence[jnp.ndarray],
        x: jnp.ndarray,
        layer_index: int,
        train: bool = False,
    ) -> jnp.ndarray:
        """roi_features: per-stage pooled prior features, each
        ``[B, A, sample_points, C]`` (stages 0..layer_index); x: feature
        map ``[B, H, W, C]``. Returns ``[B, A, fc_hidden_dim]``."""
        c = self.in_channels
        b, a = roi_features[0].shape[:2]

        # roi_fea: per-stage conv over the point axis, concat, catconv
        feats = []
        for i, feat in enumerate(roi_features):
            conv = _ConvBNReLU(self.mid_channels, (9, 1), (4, 0),
                               use_bias=False, name=f"convs_{i}")
            feats.append(conv(feat.reshape(b * a, self.sample_points, 1, c),
                              train=train))
        cat = jnp.concatenate(feats, axis=-1)
        cat = _ConvBNReLU(c, (9, 1), (4, 0), use_bias=False,
                          name=f"catconv_{layer_index}")(cat, train=train)

        # reference flattens [C, pts] channel-major (roi.view(bs*A, -1)
        # on NCHW, :115) — transpose before flattening NHWC
        roi = jnp.transpose(cat[:, :, 0, :], (0, 2, 1)).reshape(b * a, -1)
        roi = nn.Dense(self.fc_hidden_dim, name="fc")(roi)
        # torch nn.LayerNorm eps (flax defaults to 1e-6)
        roi = nn.relu(nn.LayerNorm(epsilon=1e-5, name="fc_norm")(roi))
        roi = roi.reshape(b, a, self.fc_hidden_dim)
        if not self.use_attention:  # ROIGather_T (:224-256)
            return roi

        # attention over the resized global map. FeatureResize uses
        # F.interpolate's LEGACY nearest (src = floor(dst * in/out)), which
        # differs from half-pixel-center nearest — gather indices directly.
        value = nn.Conv(c, (1, 1), name="f_value")(x)
        key = _ConvBNReLU(c, (1, 1), (0, 0), name="f_key")(x, train=train)
        rh, rw = self.resize_hw
        h, w = x.shape[1:3]
        iy = jnp.floor(jnp.arange(rh) * (h / rh)).astype(jnp.int32)
        ix = jnp.floor(jnp.arange(rw) * (w / rw)).astype(jnp.int32)
        value = value[:, iy][:, :, ix].reshape(b, rh * rw, c)
        key = key[:, iy][:, :, ix].reshape(b, rh * rw, c)

        query = nn.relu(self._per_prior_conv("f_query", roi))
        sim = jnp.einsum("bac,bsc->bas", query, key) * (c ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1)
        context = jnp.einsum("bas,bsc->bac", sim, value)
        context = self._per_prior_conv("W", context)
        context = nn.Dropout(
            self.dropout_rate, deterministic=not train, name="dropout"
        )(context)
        return roi + context
