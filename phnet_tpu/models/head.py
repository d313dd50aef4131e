"""Dual-branch anchor lane head with 3-stage refinement and adaptive routing.

Single-frame core of the reference's ``RouterV2`` / ``DetNetV2``
(``libs/models/RouterV4.py:34-347``, ``libs/models/Router4OL.py:33-393``):

  per refine stage (coarse FPN level first):
    1. pool anchor features along each prior's 36 sample points
    2. router scores per-anchor "difficulty" (on stop-grad features)
    3. DynamicConv instance interaction -> per-anchor embedding
    4. first branch: local MLP heads -> cls + geometry (+ offsets)
    5. second branch: concat positional encoding, transformer-decode
       against the temporal memory bank, same head structure at 2x width
    6. router-blended geometry seeds the next stage's priors

TPU-first design points: everything is fixed shape and batched over
(B, A=240); the per-anchor torch bmm's are einsums; the ragged cross-frame
memory is a masked [M, 2C] bank (see ``transformer.TemporalDecoder``); the
whole head is one traced function usable inside ``lax.scan`` over time.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..geometry import build_prior_embeddings
from ..ops.sampler import bilinear_sample
from .dynamic_conv import DynamicConv
from .positional import AnchorPositionalEncoding
from .router import AdaptiveRouter
from .transformer import TemporalDecoder


class HeadOutputs(NamedTuple):
    """All per-stage outputs of one frame. S = refine stages."""

    pred_fir: jnp.ndarray  # [S, B, A, dim] first-branch predictions (with offsets)
    pred_sec: jnp.ndarray  # [S, B, A, dim] second-branch predictions
    diff: jnp.ndarray      # [S, B, A] router difficulty scores
    attn_feat: jnp.ndarray  # [S, B, A, 2C] features memorized for later frames


def _sample_x_indices(n_offsets: int, sample_points: int) -> np.ndarray:
    """Reference ``RouterV4.py:58-60``: ``(linspace(0,1,P) * n_strips).long()``."""
    return (np.linspace(0, 1, sample_points, dtype=np.float32)
            * (n_offsets - 1)).astype(np.int64)


class BranchHead(nn.Module):
    """num_fc x (Linear+ReLU) trunk + final linear, for cls/reg/offsets
    (reference ``LinearModule`` stacks, ``RouterV4.py:72-101``)."""

    hidden: int
    out_dim: int
    num_fc: int = 2
    final_init_std: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_fc):
            x = nn.Dense(self.hidden, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.normal(self.final_init_std),
            bias_init=nn.initializers.normal(self.final_init_std),
            name="out",
        )(x)


class LaneHead(nn.Module):
    cfg: ModelConfig

    def setup(self):
        h = self.cfg.head
        spec = self.cfg.lane
        self.num_priors = h.num_priors
        self.n_offsets = spec.n_offsets
        self.n_strips = spec.n_strips
        self.spec = spec

        idx = _sample_x_indices(self.n_offsets, h.sample_points)
        self.sample_x_indexs = idx
        # normalized pixel-y (0=top) of each of the P sample points,
        # ordered top -> bottom (RouterV4.py:60-61 prior_feat_ys)
        self.prior_feat_ys = np.flip(1.0 - idx.astype(np.float32) / self.n_strips).copy()
        # normalized pixel-y of each offset row, row 0 = image bottom
        self.prior_ys_np = np.linspace(1.0, 0.0, self.n_offsets, dtype=np.float32)

        self.prior_embeddings = self.param(
            "prior_embeddings",
            lambda key: jnp.asarray(build_prior_embeddings(self.num_priors)),
        )
        self.pro_embedding = self.param(
            "pro_embedding",
            nn.initializers.normal(1.0),
            (self.num_priors, h.prior_feat_channels),
        )

        compute_dtype = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        self.dyn_heads = [
            DynamicConv(
                feat_size=h.sample_points,
                hidden_dim=h.fc_hidden_dim,
                dim_factor=h.dyn_dim_factor,
                param_reduction=h.dyn_param_reduction,
                out_expand=h.dyn_out_expand,
                dtype=compute_dtype,
                name=f"dyn_head_{s}",
            )
            for s in range(h.refine_layers)
        ]
        self.routers = [
            AdaptiveRouter(
                num_anchors=self.num_priors,
                channels=h.prior_feat_channels,
                points=h.sample_points,
                reduction=h.router_reduction,
                blocks=h.router_blocks,
                dtype=compute_dtype,
                name=f"router_{s}",
            )
            for s in range(h.refine_layers)
        ]

        d = h.fc_hidden_dim
        n_reg_geo = 3 + spec.n_lengths  # start_y, start_x, theta + lengths
        fir_reg_dim = n_reg_geo if h.separate_offset_head else n_reg_geo + self.n_offsets
        self.cls_fir = BranchHead(d, 2, h.num_fc, name="cls_fir")
        self.reg_fir = BranchHead(d, fir_reg_dim, h.num_fc, name="reg_fir")
        self.cls_sec = BranchHead(2 * d, 2, h.num_fc, name="cls_sec")
        self.reg_sec = BranchHead(2 * d, fir_reg_dim, h.num_fc, name="reg_sec")
        if h.separate_offset_head:
            self.iou_fir = BranchHead(d, self.n_offsets, h.num_fc, name="iou_fir")
            self.iou_sec = BranchHead(2 * d, self.n_offsets, h.num_fc, name="iou_sec")

        self.pos_encoding = AnchorPositionalEncoding(
            num_anchors=self.num_priors,
            dim=d,
            kind=h.pos_encoding,
            temperature=h.pos_temperature,
            normalize=h.pos_normalize,
            name="pos_encoding",
        )
        self.temporal_decoder = TemporalDecoder(
            dim=2 * d,
            num_layers=h.decoder_layers,
            num_heads=h.decoder_heads,
            ffn_dim=h.decoder_ffn_dim,
            dropout=h.decoder_dropout,
            name="temporal_decoder",
        )

    # -- geometry ----------------------------------------------------------
    def _line_xs(self, start_y, start_x, theta):
        """Rebuild normalized xs from anchor geometry (``RouterV4.py:160-170``):
        x = (sx*(W-1) + (1 - prior_ys - sy)*H / tan(theta*pi + 1e-5)) / (W-1).
        start_*: [..., 1] broadcast over offset rows."""
        w1 = self.cfg.img_w - 1
        ys = jnp.asarray(self.prior_ys_np)
        return (
            start_x * w1
            + (1.0 - ys - start_y) * self.cfg.img_h
            / jnp.tan(theta * math.pi + 1e-5)
        ) / w1

    def initial_priors(self) -> jnp.ndarray:
        """[A, dim] priors from the learned (start_y, start_x, theta)
        embeddings (``RouterV4.py:155-173``)."""
        emb = self.prior_embeddings
        xs = self._line_xs(emb[:, 0:1], emb[:, 1:2], emb[:, 2:3])
        header = jnp.concatenate(
            [
                jnp.zeros((self.num_priors, 2)),
                emb,
                jnp.zeros((self.num_priors, self.spec.n_lengths)),
            ],
            axis=-1,
        )
        return jnp.concatenate([header, xs], axis=-1)

    def _pool(self, feat: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
        """Pool anchor features: feat [B, H, W, C] (one FPN level), priors
        [B, A, dim] -> [B, A, P, C]. Sample points run top -> bottom."""
        xs_rows = priors[..., self.spec.col_xs :][..., self.sample_x_indexs]
        xs_sampled = xs_rows[..., ::-1]  # row order bottom->top flipped to top->bottom
        _, hh, ww, _ = feat.shape
        px = xs_sampled * (ww - 1)
        py = jnp.broadcast_to(
            jnp.asarray(self.prior_feat_ys)[None, None, :], px.shape
        ) * (hh - 1)

        def sample_one(f, x, y):
            return bilinear_sample(jnp.moveaxis(f, -1, 0), x, y)

        return jax.vmap(sample_one)(feat, px, py)

    def _assemble(self, priors, cls_logits, reg_geo, offsets):
        """Write head outputs into the lane vector
        (``RouterV4.py:275-347`` forward_first/forward_second).

        priors: [B, A, dim]; reg_geo: [B, A, 3+n_lengths]; offsets: [B, A, O].
        Returns (full predictions incl. offsets, prediction_lines w/o offsets).
        """
        spec = self.spec
        geo = priors[..., 2:5] + jnp.tanh(reg_geo[..., :3])
        lengths = reg_geo[..., 3 : 3 + spec.n_lengths]
        xs_line = self._line_xs(geo[..., 0:1], geo[..., 1:2], geo[..., 2:3])
        lines = jnp.concatenate([cls_logits, geo, lengths, xs_line], axis=-1)
        full = jnp.concatenate(
            [cls_logits, geo, lengths, xs_line + offsets], axis=-1
        )
        return full, lines

    def _branch(self, feats, cls_head, reg_head, iou_head, priors):
        cls_logits = cls_head(feats)
        reg = reg_head(feats)
        if self.cfg.head.separate_offset_head:
            offsets = iou_head(feats)
            reg_geo = reg
        else:
            n_geo = 3 + self.spec.n_lengths
            reg_geo, offsets = reg[..., :n_geo], reg[..., n_geo:]
        return self._assemble(priors, cls_logits, reg_geo, offsets)

    # -- forward -----------------------------------------------------------
    def __call__(
        self,
        fpn_feats: Tuple[jnp.ndarray, ...],
        memory_values: Optional[jnp.ndarray],
        memory_mask: Optional[jnp.ndarray],
        train: bool = False,
    ) -> HeadOutputs:
        """One frame.

        fpn_feats: tuple of [B, H, W, C] levels, fine -> coarse (FPN order);
          stage s uses level ``[-1 - s]`` reversed (coarse first,
          ``RouterV4.py:218-220``).
        memory_values: [B, S, M, 2C] temporal memory bank per stage, or None.
        memory_mask: [B, M] validity of memory slots, or None.
        """
        h = self.cfg.head
        levels = tuple(reversed(fpn_feats))
        b = levels[0].shape[0]

        priors = jnp.broadcast_to(
            self.initial_priors()[None], (b, self.num_priors, self.spec.dim)
        )
        pro_feat = jnp.broadcast_to(
            self.pro_embedding[None], (b, self.num_priors, h.prior_feat_channels)
        )
        pos = self.pos_encoding()  # [A, d]

        if memory_mask is None:
            memory_values = jnp.zeros(
                (b, h.refine_layers, 1, 2 * h.fc_hidden_dim)
            )
            memory_mask = jnp.zeros((b, 1), bool)

        preds_fir, preds_sec, diffs, attn_feats = [], [], [], []
        for s in range(h.refine_layers):
            pooled = self._pool(levels[s], priors)  # [B, A, P, C]

            # router on stop-grad features (RouterV4.py:240)
            diff = self.routers[s](
                jax.lax.stop_gradient(jnp.swapaxes(pooled, -1, -2)),
                train=train,
            )[..., 0]  # [B, A]
            diffs.append(diff)

            decode_feat = self.dyn_heads[s](pro_feat, pooled)  # [B, A, C]
            pro_feat = jax.lax.stop_gradient(decode_feat)  # iterative enhance

            fir_full, fir_lines = self._branch(
                decode_feat, self.cls_fir, self.reg_fir,
                getattr(self, "iou_fir", None), priors,
            )
            preds_fir.append(fir_full)

            attn_feat = jnp.concatenate(
                [decode_feat, jnp.broadcast_to(pos[None], decode_feat.shape)],
                axis=-1,
            )  # [B, A, 2C]
            attn_feats.append(attn_feat)

            decoded = self.temporal_decoder(
                attn_feat, memory_values[:, s], memory_mask,
                deterministic=not train,
            )
            sec_full, sec_lines = self._branch(
                decoded, self.cls_sec, self.reg_sec,
                getattr(self, "iou_sec", None), priors,
            )
            preds_sec.append(sec_full)

            if s != h.refine_layers - 1:
                w = jax.lax.stop_gradient(diff)[..., None]
                blended = (1.0 - w) * fir_lines + w * sec_lines
                priors = jax.lax.stop_gradient(blended)

        return HeadOutputs(
            pred_fir=jnp.stack(preds_fir),
            pred_sec=jnp.stack(preds_sec),
            diff=jnp.stack(diffs),
            attn_feat=jnp.stack(attn_feats),
        )
