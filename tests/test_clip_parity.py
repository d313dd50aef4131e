"""Whole-clip torch-direct parity: our PHNet temporal scan vs the ACTUAL
reference clip driver ``RouterWithB.forward``
(``/root/reference/libs/models/RouterV4.py:479-538``) on a multi-frame clip,
with identical weights, in BOTH eval and train mode.

This is the composition check on top of the single-frame head parity in
``test_reference_parity.py``: it exercises the pieces our design re-shapes —
the fixed-shape ring-buffer memory vs the reference's ragged growing
``last_cuts`` list, eval-time memory writes from NMS keeps
(``saveMemory4Test``, ``RouterV4.py:527-538``), train-time writes from the
criterion's Hungarian matches (``saveMemory``, ``:517-526``), stage-wise
prior blending carried across frames, and the hard routing + NMS keep chain
(``:498-501``). The reference's CUDA NMS is replaced by an exact python
transcription of ``nms.cpp:51`` (score-desc sort) + ``nms_kernel.cu:28-48``
(devIoU) + ``:99-143`` (greedy collect with top_k early exit); its backbone
by injected FPN features so both sides see identical feature maps.

Asserted per frame:
* eval: NMS keep count, the kept (routed) prediction rows in greedy keep
  order, and each stage's memorized positive rows + mean-negative row;
* train: per-stage ``pred_fir``/``pred_sec``/``diff``, the per-stage matched
  anchor sets feeding the memory, the memory contents, and the clip loss.
"""

import dataclasses
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_reference_parity import (  # noqa: F401  (ref/ref_models fixtures)
    HP, IMG_H, IMG_W, N_OFFSETS, _export_head_weights, _our_head_cfg,
    _ref_cfg, ref, ref_models, ref_ol_models, _stub,
)

from phnet_tpu.config import LossConfig, TestParams
from phnet_tpu.losses import LaneCriterion
from phnet_tpu.models import PHNet
from phnet_tpu.models.phnet import init_memory

T = 4           # clip frames
MAX_LANES = 8
CONF = 0.3      # low enough that random-weight scores pass, so NMS works
NMS_THRES = 12.0
SIZES = [(48, 96), (24, 48), (12, 24)]  # FPN levels fine -> coarse


# ---------------------------------------------------------------------------
# Exact python transcription of the reference NMS extension (host sort
# nms.cpp:51, devIoU nms_kernel.cu:28-48, greedy collect :99-143).
# ---------------------------------------------------------------------------
def _make_torch_nms(torch):
    def nms(boxes, scores, overlap, top_k):
        order = torch.sort(scores, descending=True)[1].numpy()
        b = boxes.detach().numpy()
        n = b.shape[0]
        n_offsets = b.shape[1] - 5
        n_strips = n_offsets - 1

        def suppresses(i, j):  # devIoU(a=row i, b=row j)
            a, bb = b[i], b[j]
            start_a = int(a[2] * n_strips + 0.5)
            start_b = int(bb[2] * n_strips + 0.5)
            start = max(start_a, start_b)
            end_a = int(start_a + a[4] - 1 + 0.5 - ((a[4] - 1) < 0))
            end_b = int(start_b + bb[4] - 1 + 0.5 - ((bb[4] - 1) < 0))
            end = min(end_a, end_b, n_offsets - 1)
            if end < start:
                return False
            dist = float(np.abs(a[5 + start:5 + end + 1]
                                - bb[5 + start:5 + end + 1]).sum())
            return dist < overlap * (end - start + 1)

        keep = []
        suppressed = np.zeros(n, bool)
        for si in range(n):
            if suppressed[si]:
                continue
            keep.append(int(order[si]))
            if len(keep) == top_k:
                break
            for sj in range(si + 1, n):
                if not suppressed[sj] and suppresses(order[si], order[sj]):
                    suppressed[sj] = True
        keep_t = torch.zeros(n, dtype=torch.long)
        if keep:
            keep_t[:len(keep)] = torch.tensor(keep, dtype=torch.long)
        return keep_t, torch.tensor(len(keep)), None

    return nms


class _Recorder:
    """Wraps detNet.forward / get_lanes / RouterWithB.saveMemory* as
    instance attributes to capture the reference's per-frame internals."""

    def __init__(self, clip_model):
        self.det_outs = []      # (outputs dict, diff_list) per frame
        self.get_lanes_io = []  # (routed [A, dim], keep_inds, keep) per frame
        self.memory = []        # list per frame of list per stage of tensors
        self.matched = []       # train: criterion matched anchors per frame/stage
        det = clip_model.detNet
        det_fwd = det.forward

        def wrapped_det(curr_feat, last_cuts=None):
            out, curr_cut, diff_list = det_fwd(curr_feat, last_cuts)
            self.det_outs.append((out, diff_list))
            return out, curr_cut, diff_list

        det.forward = wrapped_det

        gl = det.get_lanes

        def wrapped_gl(output, org_size, cut_scale=0, as_lanes=True):
            decoded, keep_inds, keep = gl(output, org_size, cut_scale,
                                          as_lanes)
            self.get_lanes_io.append(
                (output[0].detach().clone(), keep_inds.detach().clone(),
                 keep.detach().clone() if hasattr(keep, "detach") else keep))
            return decoded, keep_inds, keep

        det.get_lanes = wrapped_gl

        if clip_model.criterion is not None:
            crit = clip_model.criterion
            crit_fwd = crit.forward

            def wrapped_crit(output, gt_lane, diff=None):
                matched, loss = crit_fwd(output, gt_lane, diff)
                self.matched.append([
                    (m.detach().clone().numpy() if hasattr(m, "detach")
                     else np.asarray(m, np.int64)) for m in matched])
                return matched, loss

            crit.forward = wrapped_crit

        for name in ("saveMemory", "saveMemory4Test"):
            orig = getattr(clip_model, name)

            def wrapped_sm(*a, _orig=orig, **k):
                mem = _orig(*a, **k)
                self.memory.append([m.detach().clone() for m in mem])
                return mem

            setattr(clip_model, name, wrapped_sm)


def _build_pair(ref, ref_models, train):
    """(our PHNet cfg+variables+feats, reference RouterWithB + inputs)."""
    torch = ref.torch
    # route get_lanes's `nms(...)` to the transcription
    ref_models.nms = _make_torch_nms(torch)

    cfg = _our_head_cfg()
    cfg = dataclasses.replace(
        cfg,
        head=dataclasses.replace(cfg.head, decoder_dropout=0.0),
        memory=dataclasses.replace(cfg.memory, window=T),
        test=TestParams(conf_threshold=CONF, nms_thres=NMS_THRES,
                        nms_topk=MAX_LANES),
        max_lanes=MAX_LANES,
        nms_backend="jax",
    )
    model = PHNet(cfg)

    rng = np.random.default_rng(7)
    c = HP["prior_feat_channels"]
    # SMOOTH (low-frequency) feature maps: iid-noise features make pooled
    # anchor features chaotic under the few-px sample-position drift that
    # f32 reassociation induces in later frames' refined priors, which
    # would force uselessly loose tolerances. Real FPN features are smooth.
    feats = tuple(
        jax.image.resize(
            jnp.array(rng.normal(size=(T, 1, 6, 12, c)), jnp.float32),
            (T, 1, hh, ww, c), method="linear")
        for hh, ww in SIZES
    )  # [T, B, h, w, c] per level

    # labels: per-frame targets with varying valid counts (incl. one empty)
    n_meta = 5 + 2
    dim = n_meta + N_OFFSETS
    labels = np.full((1, T, MAX_LANES, dim), -1e5, np.float32)
    labels[..., 0] = 1.0
    labels[..., 1] = 0.0
    for t, n_valid in enumerate([3, 0, 5, 2][:T]):
        for i in range(n_valid):
            labels[0, t, i, :2] = (0.0, 1.0)
            labels[0, t, i, 2] = rng.uniform(0, 0.2)
            labels[0, t, i, 3] = rng.uniform(0.1, 0.9)
            labels[0, t, i, 4] = rng.uniform(0.3, 0.7)
            labels[0, t, i, 5:7] = rng.uniform(0.3, 0.9, 2)
            n_rows = int(rng.integers(16, N_OFFSETS))
            labels[0, t, i, n_meta:n_meta + n_rows] = np.sort(
                rng.uniform(1, IMG_W - 2, n_rows))
    labels = jnp.asarray(labels)

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, labels, train=train, method=PHNet.detect)

    # ---- reference RouterWithB with identical weights ------------------
    ref_cfg = types.SimpleNamespace(
        img_w=IMG_W, img_h=IMG_H, num_points=N_OFFSETS,
        max_lanes=MAX_LANES,
        test_parameters=types.SimpleNamespace(
            conf_threshold=CONF, nms_thres=NMS_THRES))
    det = ref_models.RouterV2(
        prior_feat_channels=c, fc_hidden_dim=HP["fc_hidden_dim"],
        num_priors=HP["num_priors"], num_fc=2,
        refine_layers=HP["refine_layers"],
        sample_points=HP["sample_points"], cfg=ref_cfg)
    sd = _export_head_weights(torch, variables["params"]["frame"]["head"])
    missing, unexpected = det.load_state_dict(sd, strict=False)
    real_missing = [k for k in missing
                    if not k.startswith(("priors", "sample_x", "prior_",
                                         "PositionEmbedding."))]
    assert not real_missing and not unexpected, (real_missing, unexpected)
    init_priors, priors_on_fm = det.generate_priors_from_embeddings()
    det.priors.data = init_priors
    det.priors_on_featmap.data = priors_on_fm

    clip = ref_models.RouterWithB.__new__(ref_models.RouterWithB)
    torch.nn.Module.__init__(clip)

    t_feats = [torch.tensor(np.asarray(f).squeeze(1).transpose(0, 3, 1, 2))
               for f in feats]  # [T, C, h, w] per level

    class _Injector(torch.nn.Module):
        def forward(self, frame):
            return t_feats

    clip.backbone = _Injector()
    clip.detNet = det
    clip.criterion = None
    clip.save_freq = 1
    clip.save_freq_max = 100
    clip.cut_scale = 0.35

    if train:
        from libs.utils.lossV5 import DILaneCriterionV5

        loss_cfg = LossConfig()
        clip.criterion = DILaneCriterionV5(_ref_cfg(
            2, loss_cfg.cls_weight, loss_cfg.reg_weight,
            loss_cfg.iou_weight))
        clip.train()
        for mod in clip.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        # keep the decoder on the eval (fused SDPA) attention path: dropout
        # is already zeroed so train/eval only differ in reduction order,
        # and the fused path matches our einsum attention far closer --
        # train-mode BMM attention drift would force 3x looser tolerances
        det.transformer_Dec.eval()
    else:
        clip.eval()

    inputs = {
        "frame": torch.zeros(T, 3, IMG_H, IMG_W),
        "mask": None, "lanes": torch.tensor(np.asarray(labels[0])),
        "lane_ids": None, "gt_flows": None, "occlusion": None,
        "num_objects": None, "info": {"size": (370, 640)},
    }
    return cfg, model, variables, feats, labels, clip, inputs


def _ring_rows(final_mem, s, t, max_lanes):
    """(positive rows [n_pos, D], negative row [D]) of our ring buffer at
    frame-slot t, stage s."""
    vals = np.asarray(final_mem.values)[0, s, t]   # [L+1, D]
    mask = np.asarray(final_mem.mask)[0, t]        # [L+1]
    pos = vals[:max_lanes][mask[:max_lanes]]
    assert bool(mask[max_lanes])  # negative-mean slot always valid
    return pos, vals[max_lanes]


def _assert_mostly_close(a, b, tol, max_frac, hard_cap, msg):
    """Elementwise closeness that tolerates a small fraction of boundary
    outliers (pooled-feature chaos under few-px prior drift can push a
    couple of anchors' router logits across a ReLU/selection boundary)."""
    d = np.abs(np.asarray(a) - np.asarray(b))
    if d.size == 0:
        return
    frac = float((d > tol).mean())
    assert frac <= max_frac, f"{msg}: {frac:.3f} of elements off by >{tol}"
    assert float(d.max()) <= hard_cap, f"{msg}: max dev {d.max():.3f}"


def test_clip_eval_parity(ref, ref_models):
    """T-frame eval clip: NMS keeps, kept rows, and the per-stage temporal
    memory must match the reference ``RouterWithB.forward`` eval branch
    (``RouterV4.py:489-515``) frame by frame."""
    torch = ref.torch
    cfg, model, variables, feats, labels, clip, inputs = _build_pair(
        ref, ref_models, train=False)
    rec = _Recorder(clip)

    with torch.no_grad():
        ref_out = clip(inputs)
    assert len(ref_out["lane_lines"]) == T

    mem0 = init_memory(cfg, 1, T)
    outs, final_mem = model.apply(
        variables, feats, None, train=False, initial_memory=mem0,
        method=PHNet.detect)

    kept = np.asarray(outs.kept)         # [T, 1, K, dim]
    num_kept = np.asarray(outs.num_kept)  # [T, 1]

    s_stages = HP["refine_layers"]
    saw_keeps = 0
    for t in range(T):
        routed_ref, keep_inds, keep = rec.get_lanes_io[t]
        # get_lanes returns keep already sliced to num_to_keep (the Lane
        # list may be shorter: predictions_to_pred drops <2-point lanes)
        keep_np = (keep.numpy() if hasattr(keep, "numpy")
                   else np.asarray(keep, np.int64))
        gk = np.where(keep_inds.numpy())[0][keep_np]  # global, greedy order
        n_ref = len(gk)
        assert num_kept[t, 0] == n_ref, f"frame {t} keep count"
        saw_keeps += n_ref
        kept_ref = routed_ref.numpy()[gk]
        np.testing.assert_allclose(
            kept[t, 0, :n_ref, :7], kept_ref[:, :7],
            rtol=5e-4, atol=5e-4, err_msg=f"frame {t} kept rows hdr")
        np.testing.assert_allclose(
            kept[t, 0, :n_ref, 7:], kept_ref[:, 7:],
            rtol=2e-3, atol=2e-3, err_msg=f"frame {t} kept rows xs")

        ref_mem = rec.memory[t]  # list per stage: [n_pos+1, 1, 2C]
        mem_tol = 1e-4 if t == 0 else 8e-3
        for s in range(s_stages):
            rmem = ref_mem[s].numpy()[:, 0, :]
            ours_pos, ours_neg = _ring_rows(final_mem, s, t, cfg.max_lanes)
            assert len(ours_pos) == len(rmem) - 1, f"frame {t} stage {s}"
            # reference rows are anchor-index-sorted (boolean mask indexing),
            # ours in greedy keep order -> reorder ours by anchor index
            np.testing.assert_allclose(
                ours_pos[np.argsort(gk)], rmem[:-1],
                rtol=mem_tol, atol=mem_tol,
                err_msg=f"frame {t} stage {s} memory positives")
            np.testing.assert_allclose(
                ours_neg, rmem[-1], rtol=mem_tol, atol=mem_tol,
                err_msg=f"frame {t} stage {s} memory negative")
    assert saw_keeps > 0  # the fixture must actually exercise the keep path


def test_clip_train_parity(ref, ref_models):
    """T-frame train clip: per-stage predictions, router scores, matched
    anchor sets, memory writes, and the total clip loss must match the
    reference train branch (``RouterV4.py:487-526``) with its shipped
    ``DILaneCriterionV5``."""
    torch = ref.torch
    cfg, model, variables, feats, labels, clip, inputs = _build_pair(
        ref, ref_models, train=True)
    rec = _Recorder(clip)

    with torch.no_grad():
        ref_loss = clip(inputs)

    mem0 = init_memory(cfg, 1, T)
    outs, final_mem = model.apply(
        variables, feats, labels, train=True, initial_memory=mem0,
        rngs={"dropout": jax.random.key(2)}, method=PHNet.detect)

    s_stages = HP["refine_layers"]
    for t in range(T):
        out_ref, diff_ref = rec.det_outs[t]
        # frame 0 (no memory yet) is exact to f32 noise; frames with memory
        # sit downstream of torch's train-mode (non-fused) attention
        # reduction, whose ~1e-3 reassociation drift the xs rebuild
        # amplifies by 1/tan(theta) (measured: hdr <= 7.5e-3, xs <= 3.4e-2
        # at stage 2 — see geometry _line_xs)
        hdr_tol, xs_tol = (1e-5, 1e-5) if t == 0 else (2e-4, 5e-4)
        for s in range(s_stages):
            # stage 0 of frame 0 is exact to f32 noise; stages >= 1 sit
            # downstream of the hoisted stage-0 chain, whose batched-over-T
            # reduction tiling reassociates floats — a few of the 240
            # pooled-feature rows then cross ReLU boundaries in the router
            # (measured: 4/240 off by >1e-5, all under 1e-3)
            frac = 0.0 if (t == 0 and s == 0) else 0.02
            _assert_mostly_close(
                outs.diff[t, s], diff_ref[s].squeeze(-1).numpy(),
                tol=hdr_tol, max_frac=frac, hard_cap=1e-3,
                msg=f"frame {t} diff stage {s}")
            for name, ours_p, ref_p in (
                    ("fir", outs.pred_fir[t, s],
                     out_ref["predictions_fir"][s]),
                    ("sec", outs.pred_sec[t, s],
                     out_ref["predictions_sec"][s])):
                ours_p = np.asarray(ours_p)
                ref_p = ref_p.numpy()
                np.testing.assert_allclose(
                    ours_p[..., :7], ref_p[..., :7], rtol=hdr_tol,
                    atol=hdr_tol, err_msg=f"frame {t} {name} hdr stage {s}")
                np.testing.assert_allclose(
                    ours_p[..., 7:], ref_p[..., 7:], rtol=xs_tol,
                    atol=xs_tol, err_msg=f"frame {t} {name} xs stage {s}")

        # matched anchor sets (second branch) feeding the memory
        valid_t = np.asarray(labels[0, t, :, 1] == 1.0)
        ref_mem = rec.memory[t]
        for s in range(s_stages):
            ours_m = np.asarray(outs.matched_sec[t, s, 0])[valid_t]
            # reference criterion returns the second branch's matched anchor
            # indices per stage (lossV5.py:198-208). Frame 0 must agree
            # EXACTLY; in later frames the f32 drift can flip one near-tied
            # assignment, so bound the symmetric difference instead.
            ref_m = np.sort(rec.matched[t][s].astype(np.int64))
            sym = np.setxor1d(ours_m, ref_m)
            assert sym.size == 0, (
                f"frame {t} stage {s} matched anchors: "
                f"{np.sort(ours_m)} vs {ref_m}")
            rmem = ref_mem[s].numpy()[:, 0, :]
            assert len(rmem) - 1 == len(ours_m), f"frame {t} stage {s}"
            ours_pos, ours_neg = _ring_rows(final_mem, s, t, cfg.max_lanes)
            # memory rows compared at the COMMON matched anchors (rows keyed
            # by anchor index on both sides)
            common = np.intersect1d(ours_m, ref_m)
            ours_order = np.argsort(ours_m)
            ours_by_anchor = {int(a): ours_pos[i]
                              for i, a in enumerate(ours_m)}
            ref_by_anchor = {int(a): rmem[i] for i, a in enumerate(ref_m)}
            tol = 1e-4 if t == 0 else 5e-4
            frac = 0.0
            for a_idx in common:
                _assert_mostly_close(
                    ours_by_anchor[int(a_idx)], ref_by_anchor[int(a_idx)],
                    tol=tol, max_frac=frac, hard_cap=0.01,
                    msg=f"frame {t} stage {s} memory row anchor {a_idx}")
            _assert_mostly_close(
                ours_neg, rmem[-1], tol=tol, max_frac=frac,
                hard_cap=0.01, msg=f"frame {t} stage {s} memory negative")

    criterion = LaneCriterion(cfg, LossConfig())
    our_loss, _ = criterion(outs, labels)
    # ours is the per-frame mean (trainVIL.py divides by N*T); theirs the sum
    np.testing.assert_allclose(
        float(our_loss), float(ref_loss) / T, rtol=1e-5,
        err_msg="clip loss")


# ---------------------------------------------------------------------------
# OpenLane variant: bounded memory window + soft routing, vs the actual
# reference RouterOL.forward (Router4OL.py:515-583). Weights flow in the
# import direction (torch init -> import_head_state_dict), covering the OL
# layout (single length, separate offset head, learned position embedding).
# ---------------------------------------------------------------------------
OL_T = 6
OL_WINDOW = 3   # save_freq_max: small so the pop-oldest path is exercised
OL_MAX_LANES = 4


def _build_ol_pair(ref, ref_ol_models, train):
    torch = ref.torch
    ref_ol_models.nms = _make_torch_nms(torch)

    from phnet_tpu.config import (
        BackboneConfig, HeadConfig, LaneSpec, MemoryConfig, ModelConfig,
        NeckConfig,
    )
    from phnet_tpu.utils.torch_import import import_head_state_dict

    cfg = ModelConfig(
        img_h=IMG_H, img_w=IMG_W,
        lane=LaneSpec(n_offsets=N_OFFSETS, n_lengths=1),
        backbone=BackboneConfig(), neck=NeckConfig(),
        head=HeadConfig(
            num_priors=HP["num_priors"], sample_points=HP["sample_points"],
            fc_hidden_dim=HP["fc_hidden_dim"],
            prior_feat_channels=HP["prior_feat_channels"],
            refine_layers=HP["refine_layers"], num_fc=2,
            decoder_layers=2, decoder_heads=8, decoder_ffn_dim=256,
            decoder_dropout=0.0, pos_encoding="learned",
            separate_offset_head=True,
        ),
        memory=MemoryConfig(window=OL_WINDOW, slots_per_frame=5),
        test=TestParams(conf_threshold=CONF, nms_thres=NMS_THRES,
                        nms_topk=OL_MAX_LANES),
        max_lanes=OL_MAX_LANES, routing="soft", nms_backend="jax",
    )
    model = PHNet(cfg)

    rng = np.random.default_rng(11)
    c = HP["prior_feat_channels"]
    feats = tuple(
        jax.image.resize(
            jnp.array(rng.normal(size=(OL_T, 1, 6, 12, c)), jnp.float32),
            (OL_T, 1, hh, ww, c), method="linear")
        for hh, ww in SIZES
    )

    n_meta = 5 + 1
    dim = n_meta + N_OFFSETS
    labels = np.full((1, OL_T, OL_MAX_LANES, dim), -1e5, np.float32)
    labels[..., 0] = 1.0
    labels[..., 1] = 0.0
    for t, n_valid in enumerate([2, 0, 3, 1, 2, 3][:OL_T]):
        for i in range(n_valid):
            labels[0, t, i, :2] = (0.0, 1.0)
            labels[0, t, i, 2] = rng.uniform(0, 0.2)
            labels[0, t, i, 3] = rng.uniform(0.1, 0.9)
            labels[0, t, i, 4] = rng.uniform(0.3, 0.7)
            labels[0, t, i, 5] = rng.uniform(0.3, 0.9)
            n_rows = int(rng.integers(16, N_OFFSETS))
            labels[0, t, i, n_meta:n_meta + n_rows] = np.sort(
                rng.uniform(1, IMG_W - 2, n_rows))
    labels = jnp.asarray(labels)

    # reference DetNetV2 with a pinned torch init; import its weights
    ref_cfg = types.SimpleNamespace(
        img_w=IMG_W, img_h=IMG_H, num_points=N_OFFSETS,
        num_priors=HP["num_priors"], max_lanes=OL_MAX_LANES,
        test_parameters=types.SimpleNamespace(
            conf_threshold=CONF, nms_thres=NMS_THRES))
    torch.manual_seed(0)
    det = ref_ol_models.DetNetV2(
        prior_feat_channels=c, fc_hidden_dim=HP["fc_hidden_dim"], num_fc=2,
        refine_layers=HP["refine_layers"],
        sample_points=HP["sample_points"], cfg=ref_cfg)
    sd = {k: v.numpy() for k, v in det.state_dict().items()}

    import flax

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, labels, train=train, method=PHNet.detect)
    variables = flax.core.unfreeze(variables)
    head_params = import_head_state_dict(sd)
    want = jax.tree_util.tree_structure(variables["params"]["frame"]["head"])
    got = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, head_params))
    assert want == got, "imported OL param tree mismatch"
    variables["params"]["frame"]["head"] = head_params

    clip = ref_ol_models.RouterOL.__new__(ref_ol_models.RouterOL)
    torch.nn.Module.__init__(clip)
    t_feats = [torch.tensor(np.asarray(f).squeeze(1).transpose(0, 3, 1, 2))
               for f in feats]

    class _Injector(torch.nn.Module):
        def forward(self, frame):
            return t_feats

    clip.backbone = _Injector()
    clip.detNet = det
    clip.criterion = None
    clip.save_freq_max = OL_WINDOW
    clip.crop_size = 480
    clip.org_size = (1280, 1920)

    if train:
        from libs.utils.loss4OLV3 import Criterion4OL

        clip.criterion = Criterion4OL(_ref_cfg(
            1, cls_weight=8.0, reg_weight=0.5, iou_weight=1.5))
        clip.train()
        for mod in clip.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        det.transformer_Dec.eval()  # fused SDPA path, see _build_pair
    else:
        clip.eval()

    inputs = {
        "frame": torch.zeros(OL_T, 3, IMG_H, IMG_W),
        "lanes": torch.tensor(np.asarray(labels[0])),
    }
    return cfg, model, variables, feats, labels, clip, inputs


def test_ol_clip_eval_parity(ref, ref_ol_models):
    """OL eval clip: soft routing + NMS keeps + the BOUNDED memory window
    (append then pop-oldest past save_freq_max, ``Router4OL.py:555-556``)
    must match our ring buffer frame by frame."""
    torch = ref.torch
    cfg, model, variables, feats, labels, clip, inputs = _build_ol_pair(
        ref, ref_ol_models, train=False)
    rec = _Recorder(clip)

    with torch.no_grad():
        ref_out = clip(inputs)
    assert len(ref_out["lane_lines"]) == OL_T

    mem0 = init_memory(cfg, 1, OL_WINDOW)
    outs, final_mem = model.apply(
        variables, feats, None, train=False, initial_memory=mem0,
        method=PHNet.detect)

    kept = np.asarray(outs.kept)
    num_kept = np.asarray(outs.num_kept)
    s_stages = HP["refine_layers"]
    saw_keeps = 0
    for t in range(OL_T):
        routed_ref, keep_inds, keep = rec.get_lanes_io[t]
        keep_np = (keep.numpy() if hasattr(keep, "numpy")
                   else np.asarray(keep, np.int64))
        gk = np.where(keep_inds.numpy())[0][keep_np]
        n_ref = len(gk)
        assert num_kept[t, 0] == n_ref, f"frame {t} keep count"
        saw_keeps += n_ref
        kept_ref = routed_ref.numpy()[gk]
        np.testing.assert_allclose(
            kept[t, 0, :n_ref, :6], kept_ref[:, :6],
            rtol=5e-4, atol=5e-4, err_msg=f"frame {t} kept rows hdr")
        np.testing.assert_allclose(
            kept[t, 0, :n_ref, 6:], kept_ref[:, 6:],
            rtol=2e-3, atol=2e-3, err_msg=f"frame {t} kept rows xs")

        # the ring only retains the last OL_WINDOW frames (= what the
        # reference's pop-oldest list holds at the end of the clip)
        if t >= OL_T - OL_WINDOW:
            ref_mem = rec.memory[t]
            mem_tol = 8e-3
            for s in range(s_stages):
                rmem = ref_mem[s].numpy()[:, 0, :]
                ours_pos, ours_neg = _ring_rows(
                    final_mem, s, t % OL_WINDOW, cfg.max_lanes)
                assert len(ours_pos) == len(rmem) - 1, f"frame {t} stage {s}"
                np.testing.assert_allclose(
                    ours_pos[np.argsort(gk)], rmem[:-1],
                    rtol=mem_tol, atol=mem_tol,
                    err_msg=f"frame {t} stage {s} memory positives")
                np.testing.assert_allclose(
                    ours_neg, rmem[-1], rtol=mem_tol, atol=mem_tol,
                    err_msg=f"frame {t} stage {s} memory negative")
    assert saw_keeps > 0


def test_ol_clip_train_parity(ref, ref_ol_models):
    """OL train clip: per-stage predictions, matched sets, windowed memory,
    and the clip loss vs RouterOL + its shipped Criterion4OL."""
    torch = ref.torch
    cfg, model, variables, feats, labels, clip, inputs = _build_ol_pair(
        ref, ref_ol_models, train=True)
    rec = _Recorder(clip)

    with torch.no_grad():
        ref_loss = clip(inputs)

    mem0 = init_memory(cfg, 1, OL_WINDOW)
    outs, final_mem = model.apply(
        variables, feats, labels, train=True, initial_memory=mem0,
        rngs={"dropout": jax.random.key(2)}, method=PHNet.detect)

    s_stages = HP["refine_layers"]
    for t in range(OL_T):
        out_ref, diff_ref = rec.det_outs[t]
        # frame-0 floor is 1e-4 here (vs 1e-5 in the VIL test): the OL test
        # imports torch-initialized weights, whose f32 rounding differs
        # slightly from the export direction
        hdr_tol, xs_tol = (1e-4, 1e-4) if t == 0 else (5e-4, 3e-3)
        for s in range(s_stages):
            _assert_mostly_close(
                outs.diff[t, s], diff_ref[s].squeeze(-1).numpy(),
                tol=hdr_tol, max_frac=0.0, hard_cap=1e-3,
                msg=f"frame {t} diff stage {s}")
            for name, ours_p, ref_p in (
                    ("fir", outs.pred_fir[t, s],
                     out_ref["predictions_fir"][s]),
                    ("sec", outs.pred_sec[t, s],
                     out_ref["predictions_sec"][s])):
                ours_p = np.asarray(ours_p)
                ref_p = ref_p.numpy()
                np.testing.assert_allclose(
                    ours_p[..., :6], ref_p[..., :6], rtol=hdr_tol,
                    atol=hdr_tol, err_msg=f"frame {t} {name} hdr stage {s}")
                np.testing.assert_allclose(
                    ours_p[..., 6:], ref_p[..., 6:], rtol=xs_tol,
                    atol=xs_tol, err_msg=f"frame {t} {name} xs stage {s}")

        valid_t = np.asarray(labels[0, t, :, 1] == 1.0)
        for s in range(s_stages):
            ours_m = np.asarray(outs.matched_sec[t, s, 0])[valid_t]
            ref_m = np.sort(rec.matched[t][s].astype(np.int64))
            assert np.array_equal(np.sort(ours_m), ref_m), (
                f"frame {t} stage {s} matched anchors: "
                f"{np.sort(ours_m)} vs {ref_m}")
            if t < OL_T - OL_WINDOW:
                continue  # slot overwritten by a later frame
            rmem = rec.memory[t][s].numpy()[:, 0, :]
            ours_pos, ours_neg = _ring_rows(
                final_mem, s, t % OL_WINDOW, cfg.max_lanes)
            assert len(rmem) - 1 == len(ours_pos), f"frame {t} stage {s}"
            tol = 1e-4 if t == 0 else 5e-4
            _assert_mostly_close(
                ours_pos[np.argsort(ours_m)], rmem[:-1],
                tol=tol, max_frac=0.0, hard_cap=0.01,
                msg=f"frame {t} stage {s} memory positives")
            _assert_mostly_close(
                ours_neg, rmem[-1], tol=tol, max_frac=0.0, hard_cap=0.01,
                msg=f"frame {t} stage {s} memory negative")

    from phnet_tpu.config import LossConfig as LC
    criterion = LaneCriterion(cfg, LC(
        cls_weight=8.0, reg_weight=0.5, iou_weight=1.5,
        focal_alpha=(0.1, 0.9), style="blend_cls", use_lane_iou=True))
    our_loss, _ = criterion(outs, labels)
    np.testing.assert_allclose(
        float(our_loss), float(ref_loss) / OL_T, rtol=1e-5,
        err_msg="OL clip loss")
