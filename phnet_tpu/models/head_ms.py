"""Multi-scale dual-branch lane head (the reference's Router4OLV2 variant).

Reference ``libs/models/Router4OLV2.py:34-467`` (``RouterV2``) used by
``testOLV3.py``/``trainOLV3.py``: per-stage sample-point counts
[24, 48, 96] over per-stage channel widths [64, 32, 16] (deep/coarse first)
with constant per-anchor feature volume C*P = 1536, a shared decode width
(reg_hidden_dim = 256), DynamicConvV2 instance interaction, the Conv1d
router (``AdaptiveRouter4LaneV2``, ``Router.py:83-132``), and a 256-wide
temporal decoder where the anchor positional encoding is *added* (not
concatenated, ``Router4OLV2.py:268-270``).

Deviation (documented): the reference's V2 router uses BatchNorm1d inside
the per-frame loop; stateful per-step normalizers do not compose with the
scan-carried program, so GroupNorm stands in (batch-size-independent,
equivalent at inference).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..geometry import build_prior_embeddings
from ..ops.sampler import bilinear_sample
from .dynamic_conv import DynamicConv
from .head import BranchHead, HeadOutputs, _sample_x_indices
from .positional import AnchorPositionalEncoding
from .transformer import TemporalDecoder


class ConvRouter(nn.Module):
    """Per-stage router of the multi-scale variant
    (``AdaptiveRouter4LaneV2``): two Conv1d+norm+relu stages over the
    per-anchor [C, P] profile, a linear map to per-point scores, then the
    mean score squashed by sigmoid."""

    channels: int
    points: int
    last_channels: int
    reduction: int = 2

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats: [B, A, C, P] -> [B, A, 1]."""
        b, a, c, p = feats.shape
        x = feats.reshape(b * a, c, p).swapaxes(1, 2)  # [BA, P, C]
        mid = max(c // self.reduction, 1)
        x = nn.Conv(mid, (3,), padding=1, name="conv1")(x)
        x = nn.GroupNorm(num_groups=min(8, mid), name="norm1")(x)
        x = nn.relu(x)
        cl = max(c // self.last_channels, 1)
        x = nn.Conv(cl, (1,), name="conv2")(x)
        x = nn.GroupNorm(num_groups=min(8, cl), name="norm2")(x)
        x = nn.relu(x)
        x = x.reshape(b * a, p * cl)
        tanh_gain = 5.0 / 3.0
        init = nn.initializers.variance_scaling(tanh_gain**2, "fan_avg", "uniform")
        score = nn.Dense(p, kernel_init=init, name="out")(x)
        score = score.reshape(b, a, p).mean(-1, keepdims=True)
        return jax.nn.sigmoid(score)


class MultiScaleLaneHead(nn.Module):
    cfg: ModelConfig

    def setup(self):
        h = self.cfg.head
        spec = self.cfg.lane
        assert spec.n_lengths == 1, "multi-scale head uses the OL lane layout"
        self.num_priors = h.num_priors
        self.n_offsets = spec.n_offsets
        self.n_strips = spec.n_strips
        self.spec = spec
        d = h.fc_hidden_dim  # reg_hidden_dim (256)
        pts = h.ms_sample_points
        chs = h.ms_channels
        assert len(pts) == len(chs) == h.refine_layers
        # constant per-anchor feature volume (Router4OLV2.py asserts this)
        assert len({p * c for p, c in zip(pts, chs)}) == 1

        self.sample_x_indexs = [
            _sample_x_indices(self.n_offsets, p) for p in pts
        ]
        self.prior_feat_ys = [
            np.flip(1.0 - idx.astype(np.float32) / self.n_strips).copy()
            for idx in self.sample_x_indexs
        ]
        self.prior_ys_np = np.linspace(1.0, 0.0, self.n_offsets, dtype=np.float32)

        self.prior_embeddings = self.param(
            "prior_embeddings",
            lambda key: jnp.asarray(build_prior_embeddings(self.num_priors)),
        )
        self.pro_embedding = self.param(
            "pro_embedding", nn.initializers.normal(1.0), (self.num_priors, d)
        )

        self.dyn_heads = [
            DynamicConv(
                feat_size=pts[s],
                hidden_dim=chs[s],
                dim_factor=h.dyn_dim_factor,
                param_reduction=4,
                out_dim=d,
                out_hidden=2 * d,
                pro_dim=d,  # pro_embedding / previous decode_feat width
                quantize=self.cfg.quantize,
                name=f"dyn_head_{s}",
            )
            for s in range(h.refine_layers)
        ]
        self.routers = [
            ConvRouter(
                channels=chs[s], points=pts[s], last_channels=chs[-1],
                name=f"router_{s}",
            )
            for s in range(h.refine_layers)
        ]

        n_reg_geo = 3 + spec.n_lengths  # 4
        out_dim = n_reg_geo + self.n_offsets
        self.cls_fir = BranchHead(d, 2, h.num_fc, name="cls_fir")
        self.reg_fir = BranchHead(d, out_dim, h.num_fc, name="reg_fir")
        self.cls_sec = BranchHead(d, 2, h.num_fc, name="cls_sec")
        self.reg_sec = BranchHead(d, out_dim, h.num_fc, name="reg_sec")

        self.pos_encoding = AnchorPositionalEncoding(
            num_anchors=self.num_priors, dim=d, kind="sine",
            temperature=64.0, normalize=False, name="pos_encoding",
        )
        self.temporal_decoder = TemporalDecoder(
            dim=d, num_layers=h.decoder_layers, num_heads=h.decoder_heads,
            ffn_dim=2 * d, dropout=h.decoder_dropout, name="temporal_decoder",
        )

    # geometry (same formulas as the single-scale head)
    def _line_xs(self, start_y, start_x, theta):
        w1 = self.cfg.img_w - 1
        ys = jnp.asarray(self.prior_ys_np)
        return (
            start_x * w1
            + (1.0 - ys - start_y) * self.cfg.img_h
            / jnp.tan(theta * math.pi + 1e-5)
        ) / w1

    def initial_priors(self) -> jnp.ndarray:
        emb = self.prior_embeddings
        xs = self._line_xs(emb[:, 0:1], emb[:, 1:2], emb[:, 2:3])
        header = jnp.concatenate(
            [jnp.zeros((self.num_priors, 2)), emb,
             jnp.zeros((self.num_priors, self.spec.n_lengths))], axis=-1)
        return jnp.concatenate([header, xs], axis=-1)

    def _pool(self, feat, priors, stage):
        xs_rows = priors[..., self.spec.col_xs :][..., self.sample_x_indexs[stage]]
        xs_sampled = xs_rows[..., ::-1]
        _, hh, ww, _ = feat.shape
        px = xs_sampled * (ww - 1)
        py = jnp.broadcast_to(
            jnp.asarray(self.prior_feat_ys[stage])[None, None, :], px.shape
        ) * (hh - 1)

        def sample_one(f, x, y):
            return bilinear_sample(jnp.moveaxis(f, -1, 0), x, y)

        return jax.vmap(sample_one)(feat, px, py)

    def _assemble(self, priors, cls_logits, reg_geo, offsets):
        spec = self.spec
        geo = priors[..., 2:5] + jnp.tanh(reg_geo[..., :3])
        lengths = reg_geo[..., 3 : 3 + spec.n_lengths]
        xs_line = self._line_xs(geo[..., 0:1], geo[..., 1:2], geo[..., 2:3])
        lines = jnp.concatenate([cls_logits, geo, lengths, xs_line], axis=-1)
        full = jnp.concatenate(
            [cls_logits, geo, lengths, xs_line + offsets], axis=-1)
        return full, lines

    def _branch(self, feats, cls_head, reg_head, priors):
        cls_logits = cls_head(feats)
        reg = reg_head(feats)
        n_geo = 3 + self.spec.n_lengths
        return self._assemble(priors, cls_logits, reg[..., :n_geo], reg[..., n_geo:])

    def precompute_combined(self):
        """Collapsed DynamicConv generator weights per stage (evaluate
        outside the temporal scan; see ``dynamic_conv.py``)."""
        return tuple(dyn.combined_weights() for dyn in self.dyn_heads)

    def _stage_local(self, s, level, priors, pro_feat, pos, combined,
                     c_major=True):
        """Frame-local work of one stage (pool, router, DynamicConv, first
        branch) — no memory dependence; hoistable for stage 0."""
        pooled = self._pool(level, priors, s)  # [B, A, P_s, C_s]
        diff = self.routers[s](
            jax.lax.stop_gradient(jnp.swapaxes(pooled, -1, -2))
        )[..., 0]
        decode_feat = self.dyn_heads[s](pro_feat, pooled, combined=combined,
                                        c_major=c_major)
        fir_full, fir_lines = self._branch(
            decode_feat, self.cls_fir, self.reg_fir, priors)
        # additive positional encoding (Router4OLV2.py:268-270)
        attn_feat = decode_feat + pos[None]
        return diff, decode_feat, fir_full, fir_lines, attn_feat

    def stage0_forward(self, level0, train=False, dyn_combined=None):
        """Stage 0 batched over a flattened frame axis (see
        ``LaneHead.stage0_forward`` — same hoist, multi-scale layout)."""
        del train  # no dropout/BN in the stage-local chain
        n = level0.shape[0]
        d = self.cfg.head.fc_hidden_dim
        priors = jnp.broadcast_to(
            self.initial_priors()[None], (n, self.num_priors, self.spec.dim))
        pro_feat = jnp.broadcast_to(
            self.pro_embedding[None], (n, self.num_priors, d))
        pos = self.pos_encoding()
        return self._stage_local(
            0, level0, priors, pro_feat, pos,
            dyn_combined[0] if dyn_combined else None)

    def __call__(
        self,
        fpn_feats: Tuple[jnp.ndarray, ...],
        memory_values: Optional[jnp.ndarray],
        memory_mask: Optional[jnp.ndarray],
        train: bool = False,
        dyn_combined=None,
        stage0=None,
    ) -> HeadOutputs:
        h = self.cfg.head
        levels = tuple(reversed(fpn_feats))
        b = levels[0].shape[0]
        d = h.fc_hidden_dim

        priors = jnp.broadcast_to(
            self.initial_priors()[None], (b, self.num_priors, self.spec.dim))
        pro_feat = jnp.broadcast_to(
            self.pro_embedding[None], (b, self.num_priors, d))
        pos = self.pos_encoding()

        if memory_mask is None:
            memory_values = jnp.zeros((b, h.refine_layers, 1, d))
            memory_mask = jnp.zeros((b, 1), bool)

        preds_fir, preds_sec, diffs, attn_feats = [], [], [], []
        for s in range(h.refine_layers):
            if s == 0 and stage0 is not None:
                diff, decode_feat, fir_full, fir_lines, attn_feat = stage0
            else:
                diff, decode_feat, fir_full, fir_lines, attn_feat = (
                    self._stage_local(
                        s, levels[s], priors, pro_feat, pos,
                        dyn_combined[s] if dyn_combined else None,
                        c_major=not train))
            diffs.append(diff)
            pro_feat = jax.lax.stop_gradient(decode_feat)
            preds_fir.append(fir_full)
            attn_feats.append(attn_feat)

            decoded = self.temporal_decoder(
                attn_feat, memory_values[:, s], memory_mask,
                deterministic=not train)
            sec_full, sec_lines = self._branch(
                decoded, self.cls_sec, self.reg_sec, priors)
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
