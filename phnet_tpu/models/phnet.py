"""PHNet: video lane detection with temporal memory, as one jitted program.

Equivalent of the reference's clip drivers ``RouterWithB``
(``libs/models/RouterV4.py:466-538``) and ``RouterOL``
(``libs/models/Router4OL.py:502-583``): backbone+FPN batched over all clip
frames, then a per-frame head pass that carries a memory of positive-lane
features between frames.

TPU-native redesign of the temporal loop:

* the reference's python ``for t in range(T)`` with a ragged, growing
  ``last_cuts`` list becomes ``flax.linen.scan`` over time with a
  fixed-shape ring-buffer memory ``[B, S, W, L+1, 2C]`` + validity mask;
* training-time memory selection (Hungarian-matched positives,
  ``saveMemory``, ``RouterV4.py:517-526``) runs *on device* inside the scan
  via :func:`phnet_tpu.losses.assign.assign_frame`;
* inference-time selection (NMS keeps, ``saveMemory4Test``,
  ``RouterV4.py:527-538``) uses the jittable :func:`phnet_tpu.ops.lane_nms`;
* the router's data-dependent branch choice (``torch.where(diff>=0.5, ...)``
  ``RouterV4.py:500`` / soft blend ``Router4OL.py:541``) is a masked select —
  both branches are always computed (they are cheap at A=240), keeping the
  program trace-stable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..losses.assign import train_assign
from ..ops.nms import lane_nms, nms_proposals_from_predictions
from .encoder import Encoder
from .head import HeadOutputs, LaneHead


class MemoryState(NamedTuple):
    """Temporal memory ring buffer.

    values: [B, S, W, L1, D] per-stage memorized anchor features
    mask:   [B, W, L1] slot validity (shared across stages; per-frame slot
            counts are equal across stages in the reference too)
    t:      scalar int32 frame counter (ring write position = t % W)
    """

    values: jnp.ndarray
    mask: jnp.ndarray
    t: jnp.ndarray


class TrainFrameOut(NamedTuple):
    pred_fir: jnp.ndarray     # [S, B, A, dim]
    pred_sec: jnp.ndarray     # [S, B, A, dim]
    diff: jnp.ndarray         # [S, B, A]
    matched_sec: jnp.ndarray  # [S, B, L] second-branch assignment, shared
    #                           with the memory write so the criterion never
    #                           re-solves it (reference: criterion computes
    #                           once and feeds saveMemory, RouterV4.py:495-507)
    matched_fir: jnp.ndarray = None  # [S, B, L] first-branch assignment —
    #                           solved in the SAME batched JV call as
    #                           matched_sec (both branches stacked on the
    #                           vmapped axis), so the criterion performs no
    #                           Hungarian solves at all. Optional: a None
    #                           keeps the criterion's own solve path alive
    #                           for direct/parity callers.


class InferFrameOut(NamedTuple):
    kept: jnp.ndarray        # [B, K, dim] routed predictions at NMS keeps
    kept_valid: jnp.ndarray  # [B, K] bool
    num_kept: jnp.ndarray    # [B] int32


class V3MemoryState(NamedTuple):
    """Carry of the prior-propagation variant (Router4OLV3): one frame of
    per-stage kept-row features doubling as attention memory and as the
    "_last" decode inputs, plus the kept predictions as next-frame priors.

    feat:   [B, S, K, 2C] frame t-1 kept query rows per stage
    priors: [B, K, dim]   frame t-1 kept predictions (priors_last)
    mask:   [B, K]        slot validity
    t:      scalar int32
    """

    feat: jnp.ndarray
    priors: jnp.ndarray
    mask: jnp.ndarray
    t: jnp.ndarray


def init_memory(cfg: ModelConfig, batch: int, window: int):
    h = cfg.head
    if h.propagate_priors:
        k = cfg.max_lanes
        return V3MemoryState(
            feat=jnp.zeros((batch, h.refine_layers, k, h.attn_dim)),
            priors=jnp.zeros((batch, k, cfg.lane.dim)),
            mask=jnp.zeros((batch, k), bool),
            t=jnp.int32(0),
        )
    slots = cfg.max_lanes + 1
    return MemoryState(
        values=jnp.zeros(
            (batch, h.refine_layers, window, slots, h.attn_dim)
        ),
        mask=jnp.zeros((batch, window, slots), bool),
        t=jnp.int32(0),
    )


def route_predictions(cfg: ModelConfig, out: HeadOutputs) -> jnp.ndarray:
    """Blend the two branches' final-stage predictions by mean router score.

    hard (VIL, ``RouterV4.py:498-500``): select sec where diff >= 0.5;
    soft (OL, ``Router4OL.py:539-541``): diff-weighted average.
    """
    diff_mean = out.diff.mean(axis=0)[..., None]  # [B, A, 1]
    fir, sec = out.pred_fir[-1], out.pred_sec[-1]
    if cfg.routing == "hard":
        return jnp.where(diff_mean >= 0.5, sec, fir)
    return diff_mean * sec + (1.0 - diff_mean) * fir


class _FrameStep(nn.Module):
    """One scan step: head forward + memory update.

    The head lives in ``setup`` so its methods can be reached both inside
    the scan (``__call__``) and outside it (``precompute`` — the collapsed
    DynamicConv weights must be evaluated before the scan so their
    factored-param chain rule runs once per step, not once per frame; see
    ``dynamic_conv.py``).
    """

    cfg: ModelConfig
    train_mode: bool
    # dyn_combined was built OUTSIDE apply() by combine_dynamic_params
    # (permutation/casts baked in) — see PHNet.__call__'s dyn_combined arg
    pre_permuted: bool = False

    def setup(self):
        h = self.cfg.head
        if h.propagate_priors:
            from .head_v3 import PropagatingLaneHead

            self.head = PropagatingLaneHead(self.cfg)
        elif h.variant == "multi":
            from .head_ms import MultiScaleLaneHead

            self.head = MultiScaleLaneHead(self.cfg)
        else:
            self.head = LaneHead(self.cfg)

    def precompute(self):
        """Loop-invariant per-stage combined generator weights (or None)."""
        fn = getattr(self.head, "precompute_combined", None)
        return fn() if fn is not None else None

    def stage0(self, feats, dyn_combined=None):
        """Stage 0's frame-local chain batched over ALL clip frames (or
        None when the variant can't hoist it — propagated priors make
        stage 0 depend on the frame t-1 carry). feats: tuple of
        [T, B, h, w, c] FPN levels; returns per-frame [T, B, ...] tensors
        to ride the scan's xs. See ``LaneHead.stage0_forward``."""
        cfg = self.cfg
        if cfg.head.propagate_priors or not cfg.head.stage0_hoist:
            return None
        fn = getattr(self.head, "stage0_forward", None)
        if fn is None:
            return None
        lv = feats[-1]  # coarsest level = stage 0 (head reverses levels)
        t, b = lv.shape[:2]
        flat = lv.reshape((t * b,) + lv.shape[2:])
        kw = {}
        if self.pre_permuted:
            # base LaneHead only (multi-scale stage0_forward doesn't take
            # the kwarg; pre_permuted is never set for that variant)
            kw["dyn_pre_permuted"] = True
        outs = fn(flat, train=self.train_mode, dyn_combined=dyn_combined,
                  **kw)
        return tuple(o.reshape((t, b) + o.shape[1:]) for o in outs)

    def _nms_keeps(self, routed: jnp.ndarray):
        """Confidence filter + lane NMS on routed predictions [B, R, dim].
        Returns (kept [B, topk, dim], keep_idx [B, topk], num_kept [B])."""
        cfg = self.cfg
        spec = cfg.lane
        scores = jax.nn.softmax(routed[..., :2], axis=-1)[..., 1]
        valid = scores >= cfg.test.conf_threshold
        props = nms_proposals_from_predictions(routed, spec, cfg.img_w)
        backend = cfg.nms_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "jax"
        if backend == "pallas":
            from ..ops.nms_pallas import lane_nms_pallas

            nms_fn = lambda p, sc, v: lane_nms_pallas(  # noqa: E731
                p, sc, v, thresh=cfg.test.nms_thres,
                n_offsets=spec.n_offsets, top_k=cfg.test.nms_topk)
        else:
            nms_fn = lambda p, sc, v: lane_nms(  # noqa: E731
                p, sc, v, cfg.test.nms_thres,
                n_offsets=spec.n_offsets, top_k=cfg.test.nms_topk)
        keep_idx, num_kept, _ = jax.vmap(nms_fn)(props, scores, valid)
        gather_idx = jnp.clip(keep_idx, 0, routed.shape[1] - 1)
        kept = jnp.take_along_axis(
            routed, gather_idx[..., None].astype(jnp.int32), axis=1
        )
        return kept, keep_idx, num_kept

    def _v3_step(self, carry: "V3MemoryState", xs, dyn_combined=None):
        """Prior-propagation scan step (Router4OLV3 ``RouterOL.forward``,
        ``Router4OLV3.py:676-727``): run the propagating head over
        [A regular + K propagated] rows, then refresh the one-frame carry
        with this frame's kept/matched rows.

        The reference's training flow expects the criterion to hand back
        ``priors_last`` (``:697``) but its shipped ``Criterion4OL`` never
        does — the natural (and here implemented) reading: the propagated
        priors are the last stage's second-branch predictions at the
        matched anchors, exactly the rows whose features ``saveMemory``
        stores (``:729-741``, which uses ``matched_indices[-1]`` for every
        stage's features)."""
        cfg = self.cfg
        feats, label = xs
        a = cfg.head.num_priors
        k = cfg.max_lanes

        out = self.head(feats, carry.feat, carry.priors, carry.mask,
                        train=self.train_mode, dyn_combined=dyn_combined)

        spec = cfg.lane
        if self.train_mode:
            target_valid = label[..., 1] == 1.0
            assign_batch = jax.vmap(
                lambda p, tt, vv: train_assign(
                    cfg, p, tt, vv, spec)
            )
            # one batched JV solve for BOTH branches: fir rows ride the same
            # vmapped axis as sec, halving the while-loop fixed costs vs a
            # separate criterion-side solve (the reference bounced each
            # branch to scipy separately, dynamic_assign.py:241-243)
            s_stages = out.pred_sec.shape[0]
            matched_both = jax.vmap(
                lambda ps: assign_batch(ps, label, target_valid))(
                jax.lax.stop_gradient(
                    jnp.concatenate([out.pred_fir, out.pred_sec], axis=0))
            )  # [2S, B, L]
            matched_fir = matched_both[:s_stages]
            matched = matched_both[s_stages:]
            idx = jnp.clip(matched[-1], 0, a + k - 1)[..., None]  # [B, L, 1]
            feat_rows = jax.vmap(
                lambda qf: jnp.take_along_axis(qf, idx, axis=1))(
                jax.lax.stop_gradient(out.query_feat)
            )  # [S, B, L, D]
            feat_rows = jnp.swapaxes(feat_rows, 0, 1)  # [B, S, L, D]
            feat_rows = jnp.where(
                target_valid[:, None, :, None], feat_rows, 0.0)
            priors_next = jnp.take_along_axis(
                jax.lax.stop_gradient(out.pred_sec[-1]), idx, axis=1)
            carry = V3MemoryState(
                feat=feat_rows, priors=priors_next, mask=target_valid,
                t=carry.t + 1,
            )
            step_out = TrainFrameOut(
                pred_fir=out.pred_fir, pred_sec=out.pred_sec, diff=out.diff,
                matched_sec=matched, matched_fir=matched_fir,
            )
        else:
            routed = route_predictions(cfg, out)  # [B, A+K, dim]
            kept, keep_idx, num_kept = self._nms_keeps(routed)
            kept_valid = keep_idx >= 0
            b = routed.shape[0]
            slot_idx = jnp.full((b, k), -1, jnp.int32)
            slot_idx = slot_idx.at[:, : keep_idx.shape[1]].set(
                keep_idx[:, :k])
            slot_valid = slot_idx >= 0
            idx = jnp.clip(slot_idx, 0, a + k - 1)[..., None]
            feat_rows = jax.vmap(
                lambda qf: jnp.take_along_axis(qf, idx, axis=1))(
                out.query_feat)
            feat_rows = jnp.swapaxes(feat_rows, 0, 1)
            feat_rows = jnp.where(
                slot_valid[:, None, :, None], feat_rows, 0.0)
            priors_next = jnp.take_along_axis(routed, idx, axis=1)
            carry = V3MemoryState(
                feat=feat_rows, priors=priors_next, mask=slot_valid,
                t=carry.t + 1,
            )
            step_out = InferFrameOut(
                kept=kept, kept_valid=kept_valid, num_kept=num_kept
            )
        return carry, step_out

    def __call__(self, carry, xs, dyn_combined=None):
        cfg = self.cfg
        if cfg.head.propagate_priors:
            return self._v3_step(carry, xs[:2], dyn_combined)
        # feats: tuple of [B, h, w, c]; label: [B, L, dim]; stage0: this
        # frame's slice of the hoisted stage-0 outputs (or None)
        feats, label, stage0 = xs
        b = feats[0].shape[0]
        s = cfg.head.refine_layers
        window = carry.values.shape[2]
        slots = carry.values.shape[3]

        mem_flat_vals = carry.values.reshape(b, s, window * slots, -1)
        mem_flat_mask = carry.mask.reshape(b, window * slots)

        # multi-scale heads have no stage0_forward (stage0 is then None) and
        # no stage0 kwarg — pass it only when the hoist produced something;
        # same for dyn_pre_permuted (base LaneHead only — the server never
        # builds an external dyn_combined for the other variants)
        kw = {"stage0": stage0} if stage0 is not None else {}
        if self.pre_permuted:
            kw["dyn_pre_permuted"] = True
        out = self.head(feats, mem_flat_vals, mem_flat_mask,
                        train=self.train_mode, dyn_combined=dyn_combined,
                        **kw)

        spec = cfg.lane
        if self.train_mode:
            target_valid = label[..., 1] == 1.0

            assign_batch = jax.vmap(
                lambda p, tt, vv: train_assign(cfg, p, tt, vv, spec)
            )
            # matched priors of the *second* branch per stage feed the memory
            # (``RouterWithB.forward``: saveMemory(matched_sec, curr_cut));
            # each stage stores its own matches, zipped with its features.
            # The first branch's assignment (needed only by the criterion)
            # rides the SAME batched JV solve on the vmapped axis — one
            # solve per frame for both branches instead of one per
            # frame + one per stage in the criterion.
            s_stages = out.pred_sec.shape[0]
            matched_both = jax.vmap(
                lambda ps: assign_batch(ps, label, target_valid))(
                jax.lax.stop_gradient(
                    jnp.concatenate([out.pred_fir, out.pred_sec], axis=0))
            )  # [2S, B, L]
            matched_fir = matched_both[:s_stages]
            matched = matched_both[s_stages:]
            carry = _write_memory_per_stage(
                carry, out.attn_feat, matched, target_valid
            )
            step_out = TrainFrameOut(
                pred_fir=out.pred_fir, pred_sec=out.pred_sec, diff=out.diff,
                matched_sec=matched, matched_fir=matched_fir,
            )
        else:
            routed = route_predictions(cfg, out)  # [B, A, dim]
            kept, keep_idx, num_kept = self._nms_keeps(routed)
            kept_valid = keep_idx >= 0
            # pad keep slots up to the memory slot count (max_lanes)
            l = cfg.max_lanes
            slot_idx = jnp.full((b, l), -1, jnp.int32)
            slot_idx = slot_idx.at[:, : keep_idx.shape[1]].set(keep_idx)
            slot_valid = slot_idx >= 0
            # same keep set for every stage's features (saveMemory4Test)
            carry = _write_memory_per_stage(
                carry,
                out.attn_feat,
                jnp.broadcast_to(slot_idx[None], (s,) + slot_idx.shape),
                slot_valid,
            )
            step_out = InferFrameOut(
                kept=kept, kept_valid=kept_valid, num_kept=num_kept
            )
        return carry, step_out


def _write_memory_per_stage(
    mem: MemoryState,
    attn_feat: jnp.ndarray,   # [S, B, A, D]
    matched: jnp.ndarray,     # [S, B, L]
    slot_valid: jnp.ndarray,  # [B, L]
) -> MemoryState:
    """Training memory write: each stage stores its own matched positives
    (the per-stage ``zip(matched_indices, curr_cut)`` of ``saveMemory``)."""
    s, b, a, d = attn_feat.shape
    window = mem.values.shape[2]

    def one_stage(feats_s, matched_s):
        idx = jnp.clip(matched_s, 0, a - 1)  # [B, L]
        # one-hot contraction instead of take_along_axis: each output row
        # sums exactly one unit-scaled element, so the result is
        # bit-identical to the gather — but it runs as one tiny MXU
        # einsum instead of a latency-bound DMA gather (xplane B=8
        # serving tick: the [S, B, A, D] row gather was 0.36 ms, 4% of
        # the tick), and its transpose (the backward) is another einsum
        # rather than a scatter.
        # precision=HIGHEST keeps the f32 features exact on TPU: under
        # DEFAULT matmul precision the f32 operand would be truncated to
        # bf16, silently rounding the memory ring vs the gather this
        # einsum replaced (and tests pin highest globally, so the
        # divergence would be deploy-only). Negligible cost at [B,L,A].
        hi = jax.lax.Precision.HIGHEST
        oh = jax.nn.one_hot(idx, a, dtype=feats_s.dtype)  # [B, L, A]
        pos = jnp.einsum("bla,bad->bld", oh, feats_s, precision=hi)
        pos = jnp.where(slot_valid[..., None], pos, 0.0)
        pos_onehot = (oh * slot_valid[..., None].astype(oh.dtype)).sum(1)
        n_pos = slot_valid.sum(-1).astype(feats_s.dtype)
        neg = (feats_s.sum(1) - jnp.einsum(
            "bad,ba->bd", feats_s, pos_onehot, precision=hi)) / (
            jnp.maximum(a - n_pos, 1.0)[:, None]
        )
        return jnp.concatenate([pos, neg[:, None, :]], axis=1)  # [B, L+1, D]

    frame_vals = jax.vmap(one_stage)(attn_feat, matched)  # [S, B, L+1, D]
    frame_vals = jnp.transpose(frame_vals, (1, 0, 2, 3))  # [B, S, L+1, D]
    frame_mask = jnp.concatenate(
        [slot_valid, jnp.ones((b, 1), bool)], axis=1
    )

    w_pos = mem.t % window
    values = jnp.moveaxis(
        jax.lax.dynamic_update_index_in_dim(
            jnp.moveaxis(mem.values, 2, 0), frame_vals, w_pos, 0
        ),
        0, 2,
    )
    mask = jnp.moveaxis(
        jax.lax.dynamic_update_index_in_dim(
            jnp.moveaxis(mem.mask, 1, 0), frame_mask, w_pos, 0
        ),
        0, 1,
    )
    return MemoryState(values=values, mask=mask, t=mem.t + 1)


class PHNet(nn.Module):
    """Full clip model. Call with frames [B, T, H, W, 3] (normalized)."""

    cfg: ModelConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)

    def __call__(
        self,
        frames: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        train: bool = False,
        initial_memory: Optional[MemoryState] = None,
        dyn_combined=None,
    ):
        if train and self.cfg.quantize != "none":
            raise ValueError(
                "quantize=%r is inference-only (round() has no useful "
                "gradient); train with quantize='none' and enable int8 for "
                "serving/eval" % (self.cfg.quantize,))
        feats = self.encode(frames, train=train)
        return self.detect(feats, labels, train=train,
                           initial_memory=initial_memory,
                           dyn_combined=dyn_combined)

    def encode(self, frames: jnp.ndarray, train: bool = False):
        """Backbone + FPN over all clip frames; tuple of [T, B, h, w, c]."""
        b, t = frames.shape[:2]
        feats = self.encoder(
            frames.reshape((b * t,) + frames.shape[2:]), train=train
        )
        return tuple(
            f.reshape((b, t) + f.shape[1:]).swapaxes(0, 1) for f in feats
        )

    @nn.compact
    def detect(
        self,
        feats,
        labels: Optional[jnp.ndarray] = None,
        train: bool = False,
        initial_memory: Optional[MemoryState] = None,
        dyn_combined=None,
    ):
        """Per-frame head scan over precomputed FPN features (separated from
        ``encode`` so gradients to the feature maps — e.g. Grad-CAM — are one
        ``jax.grad`` away)."""
        cfg = self.cfg
        t, b = feats[0].shape[:2]
        window = cfg.memory.window if cfg.memory.window > 0 else t
        mem0 = initial_memory if initial_memory is not None else init_memory(
            cfg, b, window
        )

        if labels is None:
            labels_t = jnp.zeros((t, b, cfg.max_lanes, cfg.lane.dim))
        else:
            labels_t = labels.swapaxes(0, 1)

        external_dyn = dyn_combined is not None
        frame = _FrameStep(cfg=cfg, train_mode=train,
                           pre_permuted=external_dyn, name="frame")
        # collapsed DynamicConv generator weights: computed OUTSIDE the scan
        # so lax.scan's VJP accumulates the small combined cotangents
        # (e.g. [64, 8192]) instead of the factored params ([1024, 8192]
        # etc. — ~290 MB of accumulator traffic per backward frame on the
        # VIL preset); the combined->factored chain rule runs once per step.
        # A caller (the streaming server) can instead pass dyn_combined
        # built by combine_dynamic_params OUTSIDE the jit entirely, which
        # also hoists it across serving ticks.
        if not external_dyn:
            dyn_combined = frame.precompute()
        # stage 0 is frame-local (fixed priors, no memory): evaluate it for
        # ALL frames in one batched call BEFORE the scan — its weights
        # stream from HBM once per clip instead of once per frame (the
        # detect scan is weight-read bound) and its matmuls run at T*B*A
        # rows. Per-frame slices ride the scan xs.
        stage0_pre = frame.stage0(feats, dyn_combined)

        def body(mdl, carry, xs, comb):
            return mdl(carry, xs, comb)

        if train and cfg.remat_frames:
            # recompute each frame's activations in the backward instead of
            # storing T copies (the reference relies on torch autograd's
            # default full storage; remat is the TPU-native memory/time
            # trade for a long temporal scan). policy="dots" keeps the MXU
            # results (matmuls/convs) and recomputes only elementwise work,
            # cutting the recompute cost of the backward scan.
            policy = {
                # NB "dots" does NOT save the batched per-anchor einsums
                # (bmm/attention) — those recompute in the backward;
                # "alldots" saves every contraction
                "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                "alldots": jax.checkpoint_policies.dots_saveable,
            }.get(cfg.remat_policy)
            body = nn.remat(body, prevent_cse=False, policy=policy)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            unroll=cfg.scan_unroll,
        )
        final_mem, outs = scan(frame, mem0, (tuple(feats), labels_t,
                                             stage0_pre), dyn_combined)
        return outs, final_mem
