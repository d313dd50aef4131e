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


class MergedBranchHeads(nn.Module):
    """All of one branch's heads (cls + reg [+ offsets]) as stacked einsums.

    Numerically identical math and init distributions to separate
    ``BranchHead`` stacks, but each fc level is ONE batched contraction
    over the head dimension instead of 2-3 tiny matmuls: the per-frame scan
    body is latency-bound (the whole detect pass is <2 GFLOP/frame), so
    fewer, wider MXU ops shorten the critical path.

    Final-layer kernels have per-head widths; they are zero-padded to a
    common width at apply time (padding is not a parameter) and the outputs
    sliced back per head.
    """

    hidden: int
    out_dims: Tuple[int, ...]
    num_fc: int = 2
    final_init_std: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    # first-layer input width; None = hidden (true for every use: the
    # fir trunk reads [.., d] with hidden d, the sec trunk [.., 2d]
    # with hidden 2d)
    in_dim: Optional[int] = None

    def setup(self):
        n = len(self.out_dims)
        h = self.hidden
        din = self.in_dim if self.in_dim is not None else h
        stack_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
            batch_axis=0,
        )  # per-head lecun_normal, like nn.Dense's default
        fcs = []
        for i in range(self.num_fc):
            d_in = din if i == 0 else h
            fcs.append((
                self.param(f"fc{i}_kernel", stack_init, (n, d_in, h)),
                self.param(f"fc{i}_bias", nn.initializers.zeros, (n, h)),
            ))
        self.fcs = fcs
        outs = []
        for i, d_o in enumerate(self.out_dims):
            outs.append((
                self.param(
                    f"out{i}_kernel",
                    nn.initializers.normal(self.final_init_std), (h, d_o)),
                self.param(
                    f"out{i}_bias",
                    nn.initializers.normal(self.final_init_std), (d_o,)),
            ))
        self.outs = outs

    def collect(self):
        """(fc (w, b) list, stacked out kernel [n, h, dmax], stacked out
        bias [n, dmax]) — for the cross-branch dual path (the zero-padded
        per-head out stack is not a parameter)."""
        dmax = max(self.out_dims)
        outs_w = [jnp.pad(w, ((0, 0), (0, dmax - w.shape[-1])))
                  for w, _ in self.outs]
        outs_b = [jnp.pad(b, (0, dmax - b.shape[-1]))
                  for _, b in self.outs]
        return self.fcs, jnp.stack(outs_w), jnp.stack(outs_b)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        y = None
        for i, (w, b) in enumerate(self.fcs):
            if i == 0:
                y = jnp.einsum(
                    "...ad,ndh->...nah", x, w.astype(self.dtype))
            else:
                y = jnp.einsum("...nah,nhk->...nak", y, w.astype(self.dtype))
            y = nn.relu(y + b[:, None].astype(self.dtype))

        _, w_out, b_out = self.collect()
        w_out = w_out.astype(self.dtype)  # [n, h, dmax]
        b_out = b_out.astype(self.dtype)  # [n, dmax]
        out = jnp.einsum("...nah,nhd->...nad", y, w_out) + b_out[:, None]
        out = out.astype(jnp.float32)
        return tuple(
            out[..., i, :, : d_o] for i, d_o in enumerate(self.out_dims)
        )


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
                # stage 0 sees the pro_embedding, later stages the previous
                # stage's decode_feat
                pro_dim=(h.prior_feat_channels if s == 0 else h.fc_hidden_dim),
                dtype=compute_dtype,
                quantize=self.cfg.quantize,
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
                use_pallas_kernel=h.router_pallas,
                chain_bf16=bool(h.router_chain_bf16),  # None (auto) = off
                train_chain_f32=h.router_train_chain_f32,
                chain_impl=h.router_chain_impl,
                # here; StreamingServer resolves auto by batch (config.py)
                name=f"router_{s}",
            )
            for s in range(h.refine_layers)
        ]

        d = h.fc_hidden_dim
        n_reg_geo = 3 + spec.n_lengths  # start_y, start_x, theta + lengths
        fir_reg_dim = n_reg_geo if h.separate_offset_head else n_reg_geo + self.n_offsets
        # (cls, geometry[, offsets]) output widths; PropagatingLaneHead's
        # "_last" head stacks reuse this so the layouts can't diverge
        self.branch_out_dims = (2, fir_reg_dim) + (
            (self.n_offsets,) if h.separate_offset_head else ())
        out_dims = self.branch_out_dims
        self.heads_fir = MergedBranchHeads(
            d, out_dims, h.num_fc, dtype=compute_dtype, name="heads_fir")
        self.heads_sec = MergedBranchHeads(
            2 * d, out_dims, h.num_fc, dtype=compute_dtype, name="heads_sec")

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
            dtype=compute_dtype,
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
        [B, A, dim] -> [B, A, P, C]. Sample points run top -> bottom.

        Same math as ``ops.sampler.bilinear_sample`` (grid_sample,
        align_corners=True, zero padding), restructured for the MXU: the
        sample rows' y coordinates are STATIC per stage, so the two
        neighbouring feature rows are lerped once ([B, P, W, C]), and the
        x interpolation becomes a one-hot weight matrix contracted with an
        einsum — FPN widths are <=96 at 768px input, so the [A, P, W]
        weights are tiny and the whole pool is one matmul instead of four
        strided gathers (the gathers were ~30% of the scan body's time).
        """
        xs_rows = priors[..., self.spec.col_xs :][..., self.sample_x_indexs]
        xs_sampled = xs_rows[..., ::-1]  # row order bottom->top flipped to top->bottom
        _, hh, ww, _ = feat.shape
        px = xs_sampled * (ww - 1)  # [B, A, P]

        # static row interpolation (prior_feat_ys fixed per stage)
        py = self.prior_feat_ys * (hh - 1)  # numpy [P]
        y0 = np.floor(py).astype(np.int64)
        wy = jnp.asarray((py - y0), feat.dtype)[None, :, None, None]
        y1 = np.minimum(y0 + 1, hh - 1)  # y1==hh would be zero-weighted
        rows = feat[:, y0] * (1.0 - wy) + feat[:, y1] * wy  # [B, P, W, C]

        # 1-D bilinear along W as a one-hot contraction (exact zero-padding
        # semantics: out-of-range floor/ceil columns simply match nothing)
        x0 = jnp.floor(px)
        wx = (px - x0)[..., None]
        cols = jnp.arange(ww, dtype=px.dtype)
        weight = (
            jnp.where(cols == x0[..., None], 1.0 - wx, 0.0)
            + jnp.where(cols == x0[..., None] + 1.0, wx, 0.0)
        ).astype(feat.dtype)  # [B, A, P, W]
        return jnp.einsum("bapw,bpwc->bapc", weight, rows)

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

    def _branch(self, feats, heads, priors):
        if self.cfg.head.separate_offset_head:
            cls_logits, reg_geo, offsets = heads(feats)
        else:
            cls_logits, reg = heads(feats)
            n_geo = 3 + self.spec.n_lengths
            reg_geo, offsets = reg[..., :n_geo], reg[..., n_geo:]
        return self._assemble(priors, cls_logits, reg_geo, offsets)

    def _dual_branch(self, feat_fir, feat_sec, priors):
        """BOTH branches' head MLPs as one stack of zero-padded einsums.

        The two trunks differ in width (fir d, sec 2d); padding fir's
        input/kernels with zeros makes every level a single [2, n, ...]
        batched contraction with EXACTLY the separate results (padded
        channels carry exact zeros through relu). Halves the per-stage
        head-GEMM dispatch count — the B=8 serving tick is dispatch-
        bound in a ~2.4 ms band of 20-50 us ops (xplane 2026-08-21).
        """
        hf_m, hs_m = self.heads_fir, self.heads_sec
        dt = hf_m.dtype
        fcs_f, wout_f, bout_f = hf_m.collect()
        fcs_s, wout_s, bout_s = hs_m.collect()
        hh = max(hf_m.hidden, hs_m.hidden)
        d_f, d_s = feat_fir.shape[-1], feat_sec.shape[-1]
        dd = max(d_f, d_s)
        x_f = jnp.pad(feat_fir.astype(dt),
                      ((0, 0), (0, 0), (0, dd - d_f)))
        x_s = jnp.pad(feat_sec.astype(dt),
                      ((0, 0), (0, 0), (0, dd - d_s)))
        y = jnp.stack([x_f, x_s])  # [2, B, A, dd]
        for i, ((wf, bf), (ws, bs)) in enumerate(zip(fcs_f, fcs_s)):
            din = dd if i == 0 else hh
            w = jnp.stack([
                jnp.pad(wf, ((0, 0), (0, din - wf.shape[1]),
                             (0, hh - wf.shape[2]))),
                jnp.pad(ws, ((0, 0), (0, din - ws.shape[1]),
                             (0, hh - ws.shape[2]))),
            ]).astype(dt)  # [2, n, din, hh]
            b = jnp.stack([
                jnp.pad(bf, ((0, 0), (0, hh - bf.shape[1]))),
                jnp.pad(bs, ((0, 0), (0, hh - bs.shape[1]))),
            ]).astype(dt)  # [2, n, hh]
            if i == 0:
                y = jnp.einsum("gbad,gndh->gbnah", y, w)
            else:
                y = jnp.einsum("gbnah,gnhk->gbnak", y, w)
            y = nn.relu(y + b[:, None, :, None, :])
        w_out = jnp.stack([
            jnp.pad(wout_f, ((0, 0), (0, hh - wout_f.shape[1]), (0, 0))),
            jnp.pad(wout_s, ((0, 0), (0, hh - wout_s.shape[1]), (0, 0))),
        ]).astype(dt)  # [2, n, hh, dmax]
        b_out = jnp.stack([bout_f, bout_s]).astype(dt)  # [2, n, dmax]
        out = jnp.einsum("gbnah,gnhd->gbnad", y, w_out)
        out = (out + b_out[:, None, :, None, :]).astype(jnp.float32)
        dims = hf_m.out_dims

        def split(g):
            parts = tuple(out[g, :, i, :, : d_o]
                          for i, d_o in enumerate(dims))
            if self.cfg.head.separate_offset_head:
                cls_logits, reg_geo, offsets = parts
            else:
                cls_logits, reg = parts
                n_geo = 3 + self.spec.n_lengths
                reg_geo, offsets = reg[..., :n_geo], reg[..., n_geo:]
            return self._assemble(priors, cls_logits, reg_geo, offsets)

        return split(0), split(1)

    def precompute_combined(self):
        """Collapsed DynamicConv generator weights, one dict per stage —
        evaluate OUTSIDE the temporal scan and pass back via
        ``dyn_combined`` so the backward scan accumulates the small
        combined cotangents instead of the factored params (see
        ``dynamic_conv.py`` docstring)."""
        return tuple(dyn.combined_weights() for dyn in self.dyn_heads)

    def _stage_local(self, s, level, priors, pro_feat, pos, train, combined,
                     pre_permuted=False, compute_fir=True):
        """Frame-local work of one refine stage: pool anchor features,
        router score, DynamicConv, first branch, attention features. No
        memory dependence — for stage 0 (fixed priors) this is evaluable
        outside the temporal scan (:meth:`stage0_forward`).
        ``compute_fir=False`` defers the first branch to the cross-branch
        dual path (:meth:`_dual_branch`)."""
        pooled = self._pool(level, priors)  # [B, A, P, C]
        # router on stop-grad features (RouterV4.py:240)
        diff = self.routers[s](
            jax.lax.stop_gradient(jnp.swapaxes(pooled, -1, -2)),
            train=train,
        )[..., 0]  # [B, A]
        decode_feat = self.dyn_heads[s](pro_feat, pooled, combined=combined,
                                        c_major=not train,
                                        pre_permuted=pre_permuted)
        if compute_fir:
            fir_full, fir_lines = self._branch(decode_feat, self.heads_fir,
                                               priors)
        else:
            fir_full = fir_lines = None
        attn_feat = jnp.concatenate(
            [decode_feat, jnp.broadcast_to(pos[None], decode_feat.shape)],
            axis=-1,
        )  # [B, A, 2C]
        return diff, decode_feat, fir_full, fir_lines, attn_feat

    def stage0_forward(self, level0, train=False, dyn_combined=None,
                       dyn_pre_permuted=False):
        """Stage 0 batched over a flattened frame axis.

        level0: [N, h, w, c] coarsest FPN level with N = T*B (any batching
        works — stage 0 depends only on fixed priors + the frame's
        features). The clip driver calls this ONCE per clip outside the
        scan, so stage 0's weights (~1/3 of the per-frame weight reads
        that bound the detect scan) stream from HBM once per clip instead
        of once per frame, and its matmuls run at T*B*A rows (MXU-
        efficient) instead of A."""
        n = level0.shape[0]
        h = self.cfg.head
        priors = jnp.broadcast_to(
            self.initial_priors()[None], (n, self.num_priors, self.spec.dim)
        )
        pro_feat = jnp.broadcast_to(
            self.pro_embedding[None],
            (n, self.num_priors, h.prior_feat_channels),
        )
        pos = self.pos_encoding()
        return self._stage_local(
            0, level0, priors, pro_feat, pos, train,
            dyn_combined[0] if dyn_combined else None,
            pre_permuted=dyn_pre_permuted)

    # -- forward -----------------------------------------------------------
    def __call__(
        self,
        fpn_feats: Tuple[jnp.ndarray, ...],
        memory_values: Optional[jnp.ndarray],
        memory_mask: Optional[jnp.ndarray],
        train: bool = False,
        dyn_combined=None,
        stage0=None,
        dyn_pre_permuted: bool = False,
    ) -> HeadOutputs:
        """One frame.

        fpn_feats: tuple of [B, H, W, C] levels, fine -> coarse (FPN order);
          stage s uses level ``[-1 - s]`` reversed (coarse first,
          ``RouterV4.py:218-220``).
        memory_values: [B, S, M, 2C] temporal memory bank per stage, or None.
        memory_mask: [B, M] validity of memory slots, or None.
        stage0: optional per-frame slice of :meth:`stage0_forward`'s output
          — skips recomputing stage 0's frame-local chain inside the scan.
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
            hoisted = s == 0 and stage0 is not None
            dual = h.dual_branch_heads and not hoisted
            if hoisted:
                diff, decode_feat, fir_full, fir_lines, attn_feat = stage0
            else:
                diff, decode_feat, fir_full, fir_lines, attn_feat = (
                    self._stage_local(
                        s, levels[s], priors, pro_feat, pos, train,
                        dyn_combined[s] if dyn_combined else None,
                        pre_permuted=dyn_pre_permuted,
                        compute_fir=not dual))
            diffs.append(diff)
            pro_feat = jax.lax.stop_gradient(decode_feat)  # iterative enhance
            attn_feats.append(attn_feat)

            decoded = self.temporal_decoder(
                attn_feat, memory_values[:, s], memory_mask,
                deterministic=not train,
            )
            if dual:
                (fir_full, fir_lines), (sec_full, sec_lines) = (
                    self._dual_branch(decode_feat, decoded, priors))
            else:
                sec_full, sec_lines = self._branch(decoded, self.heads_sec,
                                                   priors)
            preds_fir.append(fir_full)
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
