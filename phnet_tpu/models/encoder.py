"""Backbone + neck wrapper (reference ``RouterV4.py:22-32`` ``Encoder``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from .fpn import FPN
from .resnet import ResNetBackbone


class Encoder(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        """frames: [N, H, W, 3] -> tuple of FPN levels (strides 8/16/32)."""
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        bcfg = self.cfg.backbone
        if bcfg.kind == "revcol":
            from .revcol import RevColBackbone

            feats = RevColBackbone(
                channels=bcfg.in_channels,
                layers=bcfg.revcol_layers,
                num_subnet=bcfg.revcol_num_subnet,
                drop_path=bcfg.revcol_drop_path,
                save_memory=bcfg.revcol_save_memory,
                name="backbone",
            )(frames.astype(dtype), train=train)
        else:
            feats = ResNetBackbone(
                depth=bcfg.depth,
                stage_channels=bcfg.in_channels,
                norm=bcfg.norm,
                dtype=dtype,
                stem=bcfg.stem,
                pool_vjp=bcfg.pool_vjp,
                packed_input=self.cfg.packed_frames,
                name="backbone",
            )(frames.astype(dtype), train=train)
        feats = [feats[i] for i in self.cfg.backbone.out_indices]
        outs = FPN(
            in_channels=self.cfg.neck.in_channels,
            out_channels=self.cfg.neck.out_channels,
            num_outs=self.cfg.neck.num_outs,
            dtype=dtype,
            name="neck",
        )(feats)
        return tuple(o.astype(jnp.float32) for o in outs)
