"""Cross-frame prior propagation head (Router4OLV3 port).

The reference's experimental ``DetNetV3`` (``libs/models/Router4OLV3.py``)
extends the dual-branch head with *propagated priors*: the lanes kept in
frame t-1 come back in frame t as K extra anchor rows, re-decoded by
dedicated "_last" head stacks from their memorized features —
``forward_first_last`` (``Router4OLV3.py:404-439``) decodes the memory
*content* channels through a 1-fc local head, ``forward_second_last``
(``:521-559``) cross-attends the memorized rows against the current
frame's anchor features through a dedicated 1-layer decoder. Predictions
are the concatenation [A regular + K propagated] (``:342-353``); the
stage refinement blends and splits them back (``:356-365``). The router
is the per-row MLP ``AdaptiveRouter4LaneV3`` (``Router.py:134-153``)
scoring the concatenated query rows, and memory drops the mean-negative
row (``saveMemory``, ``Router4OLV3.py:729-741``).

Fixed-shape TPU redesign notes (the reference is ragged and, as written,
only shape-consistent with a one-frame memory window — ``memoryCont``
must row-align with ``priors_last``, ``Router4OLV3.py:341-342``):

* K = ``cfg.max_lanes`` propagated slots with a validity mask; invalid
  slots produce *dead rows* (cls logits pinned to [20, -20], xs parked
  far off-image) that can never win an assignment, contribute ~0 focal
  loss, and never pass the confidence filter — numerically equivalent to
  the reference's absent rows (up to the median over A+K vs A+K' rows in
  the criterion blend, inherent to fixed shapes);
* the memory window is exactly one frame: carried per-stage features of
  the kept rows double as the second branch's attention memory and as
  the "_last" decode inputs;
* the reference shares one ``TransformerDecoderLayer`` *instance*
  between ``transformer_Dec`` and ``transformer_Dec_last``
  (``Router4OLV3.py:139-144``) — an aliasing accident of experimental
  code (the two decoders tie weights); here they are independent
  parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .head import LaneHead, MergedBranchHeads
from .transformer import TemporalDecoder


class V3HeadOutputs(NamedTuple):
    """Per-stage outputs over R = A + K rows (regular + propagated)."""

    pred_fir: jnp.ndarray    # [S, B, R, dim]
    pred_sec: jnp.ndarray    # [S, B, R, dim]
    diff: jnp.ndarray        # [S, B, R]
    query_feat: jnp.ndarray  # [S, B, R, 2C] memorizable rows (= queryFeat)


class MLPRouter(nn.Module):
    """``AdaptiveRouter4LaneV3`` (``Router.py:134-153``): per-row
    Linear(D,D) -> ReLU -> Linear(D,D/r) -> ReLU -> Linear(->1), sigmoid.
    One instance per refine stage (the reference keeps a ModuleList and
    indexes by stage)."""

    dim: int
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D] -> [B, N]
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.dim // self.reduction, dtype=self.dtype,
                             name="fc1")(x))
        score = nn.Dense(1, dtype=self.dtype, name="out")(x)
        return jax.nn.sigmoid(score.astype(jnp.float32))[..., 0]


class PropagatingLaneHead(LaneHead):
    """LaneHead + Router4OLV3 cross-frame prior propagation."""

    def setup(self):
        super().setup()
        h = self.cfg.head
        d = h.fc_hidden_dim
        compute_dtype = (
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
            else jnp.float32
        )
        out_dims = self.branch_out_dims  # set by LaneHead.setup — one source
        # first "_last" head runs at width d with a single fc level
        # (DetNetV3 builds the *_modules_last stacks with range(1),
        # Router4OLV3.py:87-100)
        self.heads_fir_last = MergedBranchHeads(
            d, out_dims, num_fc=1, dtype=compute_dtype,
            name="heads_fir_last")
        self.heads_sec_last = MergedBranchHeads(
            2 * d, out_dims, num_fc=h.num_fc, dtype=compute_dtype,
            name="heads_sec_last")
        # 1-layer decoder for the propagated rows (transformer_Dec_last,
        # Router4OLV3.py:144)
        self.temporal_decoder_last = TemporalDecoder(
            dim=2 * d,
            num_layers=1,
            num_heads=h.decoder_heads,
            ffn_dim=h.decoder_ffn_dim,
            dropout=h.decoder_dropout,
            dtype=compute_dtype,
            name="temporal_decoder_last",
        )
        self.mlp_routers = [
            MLPRouter(dim=2 * d, reduction=h.router_reduction,
                      dtype=compute_dtype, name=f"mlp_router_{s}")
            for s in range(h.refine_layers)
        ]

    def _dead_row(self) -> jnp.ndarray:
        """Inert lane vector for invalid propagated slots: decisively
        negative cls, off-image geometry — can't be assigned, scored, or
        kept."""
        spec = self.spec
        return jnp.concatenate([
            jnp.array([20.0, -20.0]),
            jnp.zeros((3 + spec.n_lengths,)),
            jnp.full((spec.n_offsets,), -2.0),
        ])

    def __call__(  # type: ignore[override]
        self,
        fpn_feats: Tuple[jnp.ndarray, ...],
        last_feat: jnp.ndarray,    # [B, S, K, 2C] frame t-1 kept features
        last_priors: jnp.ndarray,  # [B, K, dim]  frame t-1 kept predictions
        last_valid: jnp.ndarray,   # [B, K] bool
        train: bool = False,
        dyn_combined=None,
    ) -> V3HeadOutputs:
        h = self.cfg.head
        levels = tuple(reversed(fpn_feats))
        b = levels[0].shape[0]
        # carry contract: one propagated slot per possible kept lane
        assert last_priors.shape[1] == self.cfg.max_lanes, last_priors.shape

        priors = jnp.broadcast_to(
            self.initial_priors()[None], (b, self.num_priors, self.spec.dim)
        )
        priors_last = last_priors
        pro_feat = jnp.broadcast_to(
            self.pro_embedding[None],
            (b, self.num_priors, h.prior_feat_channels),
        )
        pos = self.pos_encoding()  # [A, d]
        dead = self._dead_row()
        alive = last_valid[..., None]

        preds_fir, preds_sec, diffs, query_feats = [], [], [], []
        for s in range(h.refine_layers):
            pooled = self._pool(levels[s], priors)  # [B, A, P, C]
            decode_feat = self.dyn_heads[s](
                pro_feat, pooled,
                combined=dyn_combined[s] if dyn_combined else None,
                c_major=not train,
            )  # [B, A, C]
            pro_feat = jax.lax.stop_gradient(decode_feat)

            attn_feat = jnp.concatenate(
                [decode_feat, jnp.broadcast_to(pos[None], decode_feat.shape)],
                axis=-1,
            )  # [B, A, 2C]
            mem_s = last_feat[:, s]  # [B, K, 2C]
            mem_s = jnp.where(alive, mem_s, 0.0)
            query_rows = jnp.concatenate([attn_feat, mem_s], axis=1)
            query_feats.append(query_rows)

            # per-row MLP router over ALL rows (Router4OLV3.py:336; the V3
            # router does NOT detach its input)
            diff = self.mlp_routers[s](query_rows)  # [B, A+K]
            diffs.append(diff)

            # regular rows -------------------------------------------------
            fir_full, fir_lines = self._branch(
                decode_feat, self.heads_fir, priors)
            decoded = self.temporal_decoder(
                attn_feat, mem_s, last_valid, deterministic=not train)
            sec_full, sec_lines = self._branch(decoded, self.heads_sec,
                                               priors)

            # propagated rows ----------------------------------------------
            # local: decode the memory CONTENT channels (memoryCont =
            # memoryFeat[..., :C], Router4OLV3.py:326,342)
            firl_full, firl_lines = self._branch(
                mem_s[..., : h.fc_hidden_dim], self.heads_fir_last,
                priors_last)
            # global: memorized rows attend to the current frame's anchors
            # (forward_second_last(queryFeat=memoryFeat, memoryFeat=attnFeat)).
            # tgt_mask keeps dead (invalid) slots out of the K-row
            # self-attention keys — the reference only self-attends over
            # real ragged kept rows (Router4OLV3.py:521-524), so without
            # the mask a valid row's prediction would shift with the
            # number of empty slots present.
            decoded_last = self.temporal_decoder_last(
                mem_s, attn_feat,
                jnp.ones(attn_feat.shape[:2], bool),
                deterministic=not train,
                tgt_mask=last_valid,
            )
            secl_full, secl_lines = self._branch(
                decoded_last, self.heads_sec_last, priors_last)

            def mask_dead(p):
                return jnp.where(alive, p, dead)

            firl_full, firl_lines = mask_dead(firl_full), mask_dead(firl_lines)
            secl_full, secl_lines = mask_dead(secl_full), mask_dead(secl_lines)

            preds_fir.append(jnp.concatenate([fir_full, firl_full], axis=1))
            preds_sec.append(jnp.concatenate([sec_full, secl_full], axis=1))

            if s != h.refine_layers - 1:
                w = jax.lax.stop_gradient(diff)[..., None]
                lines = jnp.concatenate(
                    [
                        (1.0 - w[:, : self.num_priors]) * fir_lines
                        + w[:, : self.num_priors] * sec_lines,
                        (1.0 - w[:, self.num_priors :]) * firl_lines
                        + w[:, self.num_priors :] * secl_lines,
                    ],
                    axis=1,
                )
                lines = jax.lax.stop_gradient(lines)
                priors = lines[:, : self.num_priors]
                priors_last = jnp.where(
                    alive, lines[:, self.num_priors :], priors_last)

        return V3HeadOutputs(
            pred_fir=jnp.stack(preds_fir),
            pred_sec=jnp.stack(preds_sec),
            diff=jnp.stack(diffs),
            query_feat=jnp.stack(query_feats),
        )
