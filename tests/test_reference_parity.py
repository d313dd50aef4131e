"""Direct numeric parity against the ACTUAL reference code.

Imports ``/root/reference``'s torch modules (with imgaug/mmcv stubbed at
import time) and asserts on pinned random tensors that:

* our assignment (``losses/assign.py`` + on-device Hungarian) produces the
  exact matching of ``dynamic_assign.assignV2`` (VIL layout) and
  ``dynamic_assign.assign`` (OL layout);
* our ``LaneCriterion.frame_loss`` equals ``DILaneCriterionV5.loss4OneStep``
  (``lossV5.py:194-208``) and ``Criterion4OL.loss4OneStep``
  (``loss4OLV3.py:104-123``) to float32 tolerance.

Skips cleanly when the reference tree or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import LaneSpec, LossConfig, ModelConfig
from phnet_tpu.losses import LaneCriterion
from phnet_tpu.losses.assign import assign_frame

REF = "/root/reference"

IMG_H, IMG_W = 384, 768
N_OFFSETS = 36
A = 64  # priors (small for speed; reference uses 240)
L = 6   # padded target rows


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference modules, or skip."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("imgaug")
    _stub("imgaug.augmenters")
    _stub("imgaug.augmentables")
    _stub("imgaug.augmentables.lines", LineString=object,
          LineStringsOnImage=object)
    _stub("imgaug.augmentables.segmaps", SegmentationMapsOnImage=object)
    _stub("imgaug.augmentables.heatmaps", HeatmapsOnImage=object)
    _stub("mmcv", jit=lambda **kw: (lambda f: f))
    # libs.dataset.__init__ pulls data.py which does `from optionsV2 import
    # OPTION` (an options file expected at the reference repo root)
    _stub("optionsV2", OPTION=types.SimpleNamespace(max_object=8, root="."))
    from libs.utils import dynamic_assign, dynamic_assignV2, loss4OLV3, lossV5

    return types.SimpleNamespace(
        torch=torch, dynamic_assign=dynamic_assign,
        dynamic_assignV2=dynamic_assignV2, lossV5=lossV5,
        loss4OLV3=loss4OLV3)


def make_problem(seed, n_lengths, n_valid):
    """Random but plausible predictions + padded targets in our layout
    (identical numeric layout to the reference's: xs from col 5+n_lengths)."""
    rng = np.random.default_rng(seed)
    n_meta = 5 + n_lengths
    dim = n_meta + N_OFFSETS
    preds = np.zeros((A, dim), np.float32)
    preds[:, :2] = rng.normal(0, 1, (A, 2))
    preds[:, 2] = rng.uniform(0, 0.3, A)
    preds[:, 3] = rng.uniform(0, 1, A)
    preds[:, 4] = rng.uniform(0.2, 0.8, A)
    preds[:, 5:n_meta] = rng.uniform(0, 1, (A, n_lengths))
    preds[:, n_meta:] = rng.uniform(0, 1, (A, N_OFFSETS))

    tgts = np.full((L, dim), -1e5, np.float32)
    tgts[:, 0] = 1.0
    tgts[:, 1] = 0.0
    for i in range(n_valid):
        tgts[i, :2] = (0.0, 1.0)
        tgts[i, 2] = rng.uniform(0, 0.2)
        tgts[i, 3] = rng.uniform(0.1, 0.9)
        tgts[i, 4] = rng.uniform(0.3, 0.7)
        tgts[i, 5:n_meta] = rng.uniform(0.3, 0.9, n_lengths)
        n_rows = int(rng.integers(16, N_OFFSETS))
        tgts[i, n_meta:n_meta + n_rows] = np.sort(
            rng.uniform(1, IMG_W - 2, n_rows))
    return preds, tgts


@pytest.mark.parametrize("seed,n_valid", [(0, 1), (1, 3), (2, 6), (3, 4)])
def test_assignv2_matches_reference(ref, seed, n_valid):
    """ours == dynamic_assign.assignV2 (VIL, n_lengths=2, xs at col 7)."""
    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=2)
    preds, tgts = make_problem(seed, 2, n_valid)
    valid = tgts[:, 1] == 1

    rows, cols = ref.dynamic_assign.assignV2(
        ref.torch.tensor(preds), ref.torch.tensor(tgts[valid]), IMG_W, IMG_H)
    ref_pairs = set(zip(rows.tolist(), cols.tolist()))

    ours = np.array(assign_frame(
        jnp.array(preds), jnp.array(tgts), jnp.array(valid),
        spec, IMG_W, IMG_H))
    our_pairs = {(int(ours[i]), i) for i in range(L) if valid[i]}
    assert our_pairs == ref_pairs


@pytest.mark.parametrize("seed,n_valid", [(0, 1), (1, 2), (2, 4)])
def test_assign_matches_reference_ol(ref, seed, n_valid):
    """ours == dynamic_assign.assign (OL, n_lengths=1, xs at col 6)."""
    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=1)
    preds, tgts = make_problem(seed + 10, 1, n_valid)
    valid = tgts[:, 1] == 1

    rows, cols = ref.dynamic_assign.assign(
        ref.torch.tensor(preds), ref.torch.tensor(tgts[valid]), IMG_W, IMG_H)
    ref_pairs = set(zip(rows.tolist(), cols.tolist()))

    ours = np.array(assign_frame(
        jnp.array(preds), jnp.array(tgts), jnp.array(valid),
        spec, IMG_W, IMG_H))
    our_pairs = {(int(ours[i]), i) for i in range(L) if valid[i]}
    assert our_pairs == ref_pairs


@pytest.mark.parametrize("seed,n_valid", [(0, 1), (1, 2), (2, 4), (3, 6)])
def test_dynamic_topk_assigner_matches_reference(ref, seed, n_valid):
    """ours == dynamic_assignV2.DynamicTopkAssigner.assign (OL layout,
    CLRerNet LaneIoU costs, dynamic-k matching)."""
    from phnet_tpu.losses.assign import dynamic_topk_assign

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=1)
    preds, tgts = make_problem(seed + 40, 1, n_valid)
    valid = tgts[:, 1] == 1

    assigner = ref.dynamic_assignV2.DynamicTopkAssigner()
    rows, cols = assigner.assign(
        ref.torch.tensor(preds), ref.torch.tensor(tgts[valid]))
    ref_pairs = set(zip(rows.tolist(), cols.tolist()))

    match = np.array(dynamic_topk_assign(
        jnp.array(preds), jnp.array(tgts), jnp.array(valid), spec, IMG_W))
    our_pairs = {(a, t) for a in range(A) for t in range(L) if match[a, t]}
    assert our_pairs == ref_pairs


@pytest.mark.parametrize("seed,n_valid", [(0, 1), (1, 2), (2, 4), (3, 6)])
def test_anc_assign_matches_reference(ref, seed, n_valid):
    """ours == dynamic_assign.anc_assign (OL layout, +1e-2 score style,
    IoU length=12, SimOTA dynamic-k)."""
    from phnet_tpu.losses.assign import anc_assign

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=1)
    preds, tgts = make_problem(seed + 60, 1, n_valid)
    valid = tgts[:, 1] == 1

    rows, cols = ref.dynamic_assign.anc_assign(
        ref.torch.tensor(preds), ref.torch.tensor(tgts[valid]), IMG_W, IMG_H)
    ref_pairs = set(zip(rows.tolist(), cols.tolist()))

    match = np.array(anc_assign(
        jnp.array(preds), jnp.array(tgts), jnp.array(valid),
        spec, IMG_W, IMG_H))
    our_pairs = {(a, t) for a in range(A) for t in range(L) if match[a, t]}
    assert our_pairs == ref_pairs


@pytest.mark.parametrize("seed,n_valid", [(0, 1), (1, 2), (2, 4), (3, 6)])
def test_assign_one2many_matches_reference(ref, seed, n_valid):
    """ours == dynamic_assign.assignOne2Many (repeated Hungarian rounds,
    positional dynamic-k gate)."""
    from phnet_tpu.losses.assign import assign_one2many

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=1)
    preds, tgts = make_problem(seed + 70, 1, n_valid)
    valid = tgts[:, 1] == 1

    rows, cols = ref.dynamic_assign.assignOne2Many(
        ref.torch.tensor(preds), ref.torch.tensor(tgts[valid]), IMG_W, IMG_H)
    ref_pairs = set(zip(rows.tolist(), cols.tolist()))

    match = np.array(assign_one2many(
        jnp.array(preds), jnp.array(tgts), jnp.array(valid),
        spec, IMG_W, IMG_H))
    our_pairs = {(a, t) for a in range(A) for t in range(L) if match[a, t]}
    assert our_pairs == ref_pairs


@pytest.mark.parametrize("seed,nc,nl", [(0, 3, 3), (1, 4, 2), (2, 2, 5),
                                        (3, 6, 6)])
def test_assign_cross_frame_matches_reference(ref, seed, nc, nl):
    """ours == dynamic_assign.assignCrossFrame + dynamic_k_assign_CF
    (targets-vs-targets temporal matching, binary 0.8-IoU dynamic k)."""
    from phnet_tpu.losses.assign import assign_cross_frame

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=1)
    _, curr = make_problem(seed + 80, 1, nc)
    _, last = make_problem(seed + 90, 1, nl)
    # overlap some lanes so the 0.8 IoU threshold actually fires
    n_shared = min(nc, nl) // 2 + 1
    last[:n_shared] = curr[:n_shared]
    valid_c = curr[:, 1] == 1
    valid_l = last[:, 1] == 1

    rows, cols = ref.dynamic_assign.assignCrossFrame(
        ref.torch.tensor(curr[valid_c]), ref.torch.tensor(last[valid_l]),
        IMG_W, IMG_H)
    ref_pairs = set(zip(rows.tolist(), cols.tolist()))

    match = np.array(assign_cross_frame(
        jnp.array(curr), jnp.array(last), jnp.array(valid_c),
        jnp.array(valid_l), spec, IMG_W, IMG_H))
    our_pairs = {(a, t) for a in range(L) for t in range(L) if match[a, t]}
    assert our_pairs == ref_pairs


def _ref_cfg(n_lengths, cls_weight, reg_weight, iou_weight):
    return types.SimpleNamespace(
        num_points=N_OFFSETS, max_lanes=L, img_h=IMG_H, img_w=IMG_W,
        cls_weight=cls_weight, reg_weight=reg_weight, iou_weight=iou_weight)


def _stack_outputs(torch, pred_fir, pred_sec):
    """Reference output dict: predictions_{fir,sec} = [stage][batch] lists."""
    return {
        "predictions_fir": [[torch.tensor(p)] for p in pred_fir],
        "predictions_sec": [[torch.tensor(p)] for p in pred_sec],
    }


@pytest.mark.parametrize("seed,n_valid", [(0, 3), (1, 1), (2, 6), (3, 4)])
def test_vil_criterion_matches_reference(ref, seed, n_valid):
    """frame_loss == DILaneCriterionV5.loss4OneStep on pinned tensors."""
    torch = ref.torch
    rng = np.random.default_rng(seed + 100)
    pred_fir = np.stack([make_problem(seed * 13 + s, 2, n_valid)[0]
                         for s in range(3)])
    pred_sec = np.stack([make_problem(seed * 13 + 7 + s, 2, n_valid)[0]
                         for s in range(3)])
    _, tgts = make_problem(seed, 2, n_valid)
    diff = rng.uniform(0.01, 0.99, (3, A)).astype(np.float32)

    crit_ref = ref.lossV5.DILaneCriterionV5(
        _ref_cfg(2, cls_weight=2.5, reg_weight=0.5, iou_weight=2.0))
    with torch.no_grad():
        _, ref_loss = crit_ref.loss4OneStep(
            _stack_outputs(torch, pred_fir, pred_sec),
            {"lane_line": torch.tensor(tgts)[None]},
            diff=[torch.tensor(d)[None, :, None] for d in diff],
        )
    ref_loss = float(ref_loss)

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=2)
    cfg = ModelConfig(img_h=IMG_H, img_w=IMG_W, lane=spec, max_lanes=L)
    lc = LossConfig(cls_weight=2.5, reg_weight=0.5, iou_weight=2.0,
                    focal_alpha=(0.5, 0.5), style="blend_all")
    ours, _ = LaneCriterion(cfg, lc).frame_loss(
        jnp.array(pred_fir), jnp.array(pred_sec), jnp.array(diff),
        jnp.array(tgts))
    np.testing.assert_allclose(float(ours), ref_loss, rtol=5e-5)


@pytest.mark.parametrize("seed,n_valid", [(0, 2), (1, 1), (2, 5)])
def test_ol_criterion_matches_reference(ref, seed, n_valid):
    """frame_loss(blend_cls) == Criterion4OL.loss4OneStep on pinned tensors."""
    torch = ref.torch
    rng = np.random.default_rng(seed + 200)
    pred_fir = np.stack([make_problem(seed * 17 + s, 1, n_valid)[0]
                         for s in range(3)])
    pred_sec = np.stack([make_problem(seed * 17 + 9 + s, 1, n_valid)[0]
                         for s in range(3)])
    _, tgts = make_problem(seed + 5, 1, n_valid)
    diff = rng.uniform(0.01, 0.99, (3, A)).astype(np.float32)

    crit_ref = ref.loss4OLV3.Criterion4OL(
        _ref_cfg(1, cls_weight=8.0, reg_weight=0.5, iou_weight=1.5))
    with torch.no_grad():
        _, ref_loss = crit_ref.loss4OneStep(
            _stack_outputs(torch, pred_fir, pred_sec),
            {"lane_line": torch.tensor(tgts)[None]},
            diff=[torch.tensor(d)[None, :, None] for d in diff],
        )
    ref_loss = float(ref_loss)

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=1)
    cfg = ModelConfig(img_h=IMG_H, img_w=IMG_W, lane=spec, max_lanes=L)
    lc = LossConfig(cls_weight=8.0, reg_weight=0.5, iou_weight=1.5,
                    focal_alpha=(0.1, 0.9), style="blend_cls",
                    use_lane_iou=True)
    ours, _ = LaneCriterion(cfg, lc).frame_loss(
        jnp.array(pred_fir), jnp.array(pred_sec), jnp.array(diff),
        jnp.array(tgts))
    np.testing.assert_allclose(float(ours), ref_loss, rtol=5e-5)


def test_vil_criterion_empty_frame_matches_reference(ref):
    """No valid targets: cls-only loss path (lossV5.py:106-113)."""
    torch = ref.torch
    rng = np.random.default_rng(7)
    pred_fir = np.stack([make_problem(40 + s, 2, 0)[0] for s in range(3)])
    pred_sec = np.stack([make_problem(50 + s, 2, 0)[0] for s in range(3)])
    _, tgts = make_problem(7, 2, 0)
    diff = rng.uniform(0.01, 0.99, (3, A)).astype(np.float32)

    crit_ref = ref.lossV5.DILaneCriterionV5(
        _ref_cfg(2, cls_weight=2.5, reg_weight=0.5, iou_weight=2.0))
    with torch.no_grad():
        _, ref_loss = crit_ref.loss4OneStep(
            _stack_outputs(torch, pred_fir, pred_sec),
            {"lane_line": torch.tensor(tgts)[None]},
            diff=[torch.tensor(d)[None, :, None] for d in diff],
        )

    spec = LaneSpec(n_offsets=N_OFFSETS, n_lengths=2)
    cfg = ModelConfig(img_h=IMG_H, img_w=IMG_W, lane=spec, max_lanes=L)
    lc = LossConfig(cls_weight=2.5, reg_weight=0.5, iou_weight=2.0)
    ours, _ = LaneCriterion(cfg, lc).frame_loss(
        jnp.array(pred_fir), jnp.array(pred_sec), jnp.array(diff),
        jnp.array(tgts))
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=5e-5)


# ---------------------------------------------------------------------------
# Full-head forward parity: our LaneHead vs the reference RouterV2 (torch),
# with weights exported from our flax params.
# ---------------------------------------------------------------------------
HP = dict(num_priors=64, sample_points=12, fc_hidden_dim=64,
          prior_feat_channels=64, refine_layers=3)


@pytest.fixture(scope="module")
def ref_models(ref):
    """Import libs.models.RouterV4 with CUDA/timm/torchvision bits stubbed."""
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", trunc_normal_=lambda *a, **k: None,
          DropPath=object)
    _stub("mmcv.cnn", ConvModule=object)
    _stub("libs.ops", nms=types.SimpleNamespace(nms=None))
    _stub("libs.ops.nms", nms=None)
    _stub("libs.models.SeqFormer.util")
    _stub("libs.models.SeqFormer.util.misc", NestedTensor=object)
    from libs.models import RouterV4

    return RouterV4


def _our_head_cfg():
    from phnet_tpu.config import (
        BackboneConfig, HeadConfig, LaneSpec, MemoryConfig, ModelConfig,
        NeckConfig, TestParams,
    )

    return ModelConfig(
        img_h=IMG_H, img_w=IMG_W,
        lane=LaneSpec(n_offsets=N_OFFSETS, n_lengths=2),
        backbone=BackboneConfig(),
        neck=NeckConfig(),
        head=HeadConfig(
            num_priors=HP["num_priors"], sample_points=HP["sample_points"],
            fc_hidden_dim=HP["fc_hidden_dim"],
            prior_feat_channels=HP["prior_feat_channels"],
            refine_layers=HP["refine_layers"], num_fc=2,
            decoder_layers=2, decoder_heads=8, decoder_ffn_dim=256,
            decoder_dropout=0.1, pos_encoding="sine", pos_temperature=16.0,
            pos_normalize=True,
        ),
        memory=MemoryConfig(window=5, slots_per_frame=5),
        test=TestParams(),
        max_lanes=8,
    )


def _export_head_weights(torch, params):
    """flax LaneHead params -> reference RouterV2 state_dict."""
    import numpy as onp

    def t(a):
        return torch.tensor(onp.asarray(a, dtype=onp.float32))

    sd = {}
    sd["prior_embeddings.weight"] = t(params["prior_embeddings"])
    sd["pro_embedding.weight"] = t(params["pro_embedding"])

    # merged branch heads -> cls/reg module stacks (head 0 = cls, 1 = reg)
    for branch, suffix in (("heads_fir", ""), ("heads_sec", "_sec")):
        hp = params[branch]
        for i in range(2):
            k = onp.asarray(hp[f"fc{i}_kernel"])
            b = onp.asarray(hp[f"fc{i}_bias"])
            sd[f"cls_modules{suffix}.{2 * i}.weight"] = t(k[0].T)
            sd[f"cls_modules{suffix}.{2 * i}.bias"] = t(b[0])
            sd[f"reg_modules{suffix}.{2 * i}.weight"] = t(k[1].T)
            sd[f"reg_modules{suffix}.{2 * i}.bias"] = t(b[1])
        sd[f"cls_layers{suffix}.weight"] = t(onp.asarray(hp["out0_kernel"]).T)
        sd[f"cls_layers{suffix}.bias"] = t(hp["out0_bias"])
        sd[f"reg_layers{suffix}.weight"] = t(onp.asarray(hp["out1_kernel"]).T)
        sd[f"reg_layers{suffix}.bias"] = t(hp["out1_bias"])

    # dynamic heads
    for s in range(HP["refine_layers"]):
        dp = params[f"dyn_head_{s}"]
        pre = f"DHead_series.{s}"
        for ours, theirs in (("gen1_a", "dynamic_layer_1.0"),
                             ("gen1_b", "dynamic_layer_1.1"),
                             ("gen2_a", "dynamic_layer_2.0"),
                             ("gen2_b", "dynamic_layer_2.1"),
                             ("out_a", "out_layer.0"),
                             ("out_b", "out_layer.1")):
            sd[f"{pre}.{theirs}.weight"] = t(onp.asarray(dp[ours]["kernel"]).T)
            sd[f"{pre}.{theirs}.bias"] = t(dp[ours]["bias"])
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{pre}.{n}.weight"] = t(dp[n]["scale"])
            sd[f"{pre}.{n}.bias"] = t(dp[n]["bias"])

    # router (per-stage params live in router_{s} on our side)
    c, p = HP["prior_feat_channels"], HP["sample_points"]
    for s in range(HP["refine_layers"]):
        rp = params[f"router_{s}"]
        taps = onp.asarray(rp["taps"])          # [A, blocks*18]
        cbias = onp.asarray(rp["conv_bias"])    # [A, blocks*2]
        lnp = onp.asarray(rp["ln_params"])      # [2+4b, C, P]
        sd[f"router.pre_norm.{s}.weight"] = t(lnp[0])
        sd[f"router.pre_norm.{s}.bias"] = t(lnp[1])
        for b in range(4):
            base = f"router.DWNets.{s}.{b}"
            t1 = taps[:, (2 * b) * 9:(2 * b + 1) * 9].reshape(-1, 1, 3, 3)
            t2 = taps[:, (2 * b + 1) * 9:(2 * b + 2) * 9].reshape(-1, 1, 3, 3)
            o = 2 + 4 * b
            sd[f"{base}.0.weight"] = t(t1)
            sd[f"{base}.0.bias"] = t(cbias[:, 2 * b])
            sd[f"{base}.1.weight"] = t(lnp[o])
            sd[f"{base}.1.bias"] = t(lnp[o + 1])
            sd[f"{base}.3.weight"] = t(t2)
            sd[f"{base}.3.bias"] = t(cbias[:, 2 * b + 1])
            sd[f"{base}.4.weight"] = t(lnp[o + 2])
            sd[f"{base}.4.bias"] = t(lnp[o + 3])
        sd[f"router.layers.{s}.0.weight"] = t(onp.asarray(rp["Dense_0"]["kernel"]).T)
        sd[f"router.layers.{s}.0.bias"] = t(rp["Dense_0"]["bias"])
        sd[f"router.layers.{s}.2.weight"] = t(onp.asarray(rp["Dense_1"]["kernel"]).T)
        sd[f"router.layers.{s}.2.bias"] = t(rp["Dense_1"]["bias"])

    # temporal decoder (fused qkv/kv on our side -> packed in_proj on theirs)
    td = params["temporal_decoder"]
    for i in range(2):
        lp = td[f"layer{i}"]
        pre = f"transformer_Dec.layers.{i}"
        qkv_k = onp.asarray(lp["self_attn"]["qkv"]["kernel"])  # [D, 3D]
        sd[f"{pre}.self_attn.in_proj_weight"] = t(qkv_k.T)
        sd[f"{pre}.self_attn.in_proj_bias"] = t(lp["self_attn"]["qkv"]["bias"])
        sd[f"{pre}.self_attn.out_proj.weight"] = t(
            onp.asarray(lp["self_attn"]["out"]["kernel"]).T)
        sd[f"{pre}.self_attn.out_proj.bias"] = t(lp["self_attn"]["out"]["bias"])
        q_k = onp.asarray(lp["cross_attn"]["q"]["kernel"])    # [D, D]
        kv_k = onp.asarray(lp["cross_attn"]["kv"]["kernel"])  # [D, 2D]
        sd[f"{pre}.multihead_attn.in_proj_weight"] = t(
            onp.concatenate([q_k.T, kv_k.T], axis=0))
        sd[f"{pre}.multihead_attn.in_proj_bias"] = t(onp.concatenate([
            onp.asarray(lp["cross_attn"]["q"]["bias"]),
            onp.asarray(lp["cross_attn"]["kv"]["bias"])]))
        sd[f"{pre}.multihead_attn.out_proj.weight"] = t(
            onp.asarray(lp["cross_attn"]["out"]["kernel"]).T)
        sd[f"{pre}.multihead_attn.out_proj.bias"] = t(
            lp["cross_attn"]["out"]["bias"])
        for ours, theirs in (("norm1", "norm1"), ("norm2", "norm2"),
                             ("norm3", "norm3"), ("ffn1", "linear1"),
                             ("ffn2", "linear2")):
            node = lp[ours]
            if "kernel" in node:
                sd[f"{pre}.{theirs}.weight"] = t(onp.asarray(node["kernel"]).T)
            else:
                sd[f"{pre}.{theirs}.weight"] = t(node["scale"])
            sd[f"{pre}.{theirs}.bias"] = t(node["bias"])
    sd["transformer_Dec.norm.weight"] = t(td["final_norm"]["scale"])
    sd["transformer_Dec.norm.bias"] = t(td["final_norm"]["bias"])
    return sd


@pytest.mark.parametrize("with_memory", [False, True])
def test_head_forward_parity(ref, ref_models, with_memory):
    """One frame through our LaneHead == the reference RouterV2 head, with
    identical weights (exported from our params)."""
    torch = ref.torch
    from phnet_tpu.models.head import LaneHead

    cfg = _our_head_cfg()
    head = LaneHead(cfg)

    rng = np.random.default_rng(0)
    b, c = 1, HP["prior_feat_channels"]
    sizes = [(48, 96), (24, 48), (12, 24)]  # fine -> coarse (FPN order)
    feats = tuple(
        jnp.array(rng.normal(size=(b, hh, ww, c)), jnp.float32)
        for hh, ww in sizes
    )
    m = 7
    mem_np = rng.normal(size=(HP["refine_layers"], m,
                              2 * HP["fc_hidden_dim"])).astype(np.float32)
    if with_memory:
        mem_vals = jnp.array(mem_np)[None].transpose(0, 1, 2, 3)  # [B,S,M,2C]
        mem_vals = jnp.array(mem_np)[None]
        mem_mask = jnp.ones((b, m), bool)
    else:
        mem_vals = jnp.zeros((b, HP["refine_layers"], 1, 2 * HP["fc_hidden_dim"]))
        mem_mask = jnp.zeros((b, 1), bool)

    variables = head.init(jax.random.key(0), feats, mem_vals, mem_mask,
                          train=False)
    outs = head.apply(variables, feats, mem_vals, mem_mask, train=False)

    # reference head with our weights
    ref_cfg = types.SimpleNamespace(img_w=IMG_W, img_h=IMG_H,
                                    num_points=N_OFFSETS)
    det = ref_models.RouterV2(
        prior_feat_channels=c, fc_hidden_dim=HP["fc_hidden_dim"],
        num_priors=HP["num_priors"], num_fc=2,
        refine_layers=HP["refine_layers"],
        sample_points=HP["sample_points"], cfg=ref_cfg)
    sd = _export_head_weights(torch, variables["params"])
    missing, unexpected = det.load_state_dict(sd, strict=False)
    # buffers (priors etc.) are derived; no real parameter may be missing
    real_missing = [k for k in missing
                    if not k.startswith(("priors", "sample_x", "prior_",
                                         "PositionEmbedding."))]
    assert not real_missing, real_missing
    assert not unexpected, unexpected
    det.eval()
    # refresh derived priors from the loaded embeddings
    init_priors, priors_on_fm = det.generate_priors_from_embeddings()
    det.priors.data = init_priors
    det.priors_on_featmap.data = priors_on_fm

    t_feats = [torch.tensor(np.asarray(f).transpose(0, 3, 1, 2))
               for f in feats]
    if with_memory:
        last_cuts = [[torch.tensor(mem_np[s][:, None, :])
                      for s in range(HP["refine_layers"])]]
    else:
        last_cuts = []
    with torch.no_grad():
        out, attn_list, diff_list = det(t_feats, last_cuts=last_cuts)

    # with memory, stages > 0 sit downstream of the decoder's f32
    # attention reductions; einsum-vs-bmm accumulation order costs ~1e-3
    rtol, atol = (2e-3, 2e-3) if with_memory else (2e-4, 5e-4)
    for s in range(HP["refine_layers"]):
        np.testing.assert_allclose(
            np.asarray(outs.diff[s]),
            diff_list[s].squeeze(-1).numpy(),
            rtol=rtol, atol=atol, err_msg=f"diff stage {s}")
        np.testing.assert_allclose(
            np.asarray(outs.pred_fir[s]),
            out["predictions_fir"][s].numpy(),
            rtol=rtol, atol=atol, err_msg=f"pred_fir stage {s}")
        np.testing.assert_allclose(
            np.asarray(outs.pred_sec[s]),
            out["predictions_sec"][s].numpy(),
            rtol=rtol, atol=atol, err_msg=f"pred_sec stage {s}")


# ---------------------------------------------------------------------------
# Reference-checkpoint import: the inverse of _export_head_weights. A
# RouterWithB .pth.tar state_dict loads into our PHNet variables.
# ---------------------------------------------------------------------------
def test_reference_checkpoint_import(ref):
    """Export our head params to the reference's state_dict format, wrap
    them as a full RouterWithB checkpoint (DDP 'module.' + {'state_dict'}),
    import back, and require exact recovery of every head param."""
    torch = ref.torch
    from phnet_tpu.models.head import LaneHead
    from phnet_tpu.utils.torch_import import load_reference_checkpoint

    cfg = _our_head_cfg()
    head = LaneHead(cfg)
    rng = np.random.default_rng(1)
    b, c = 1, HP["prior_feat_channels"]
    feats = tuple(
        jnp.array(rng.normal(size=(b, hh, ww, c)), jnp.float32)
        for hh, ww in [(48, 96), (24, 48), (12, 24)]
    )
    mem_vals = jnp.zeros((b, HP["refine_layers"], 1, 2 * HP["fc_hidden_dim"]))
    mem_mask = jnp.zeros((b, 1), bool)
    variables = head.init(jax.random.key(3), feats, mem_vals, mem_mask,
                          train=False)

    sd = _export_head_weights(torch, variables["params"])
    ckpt = {"state_dict": {
        "module.detNet." + k: v.numpy() for k, v in sd.items()}}

    # fresh (different) init to prove the load overwrites everything
    fresh = head.init(jax.random.key(9), feats, mem_vals, mem_mask,
                      train=False)
    shell = {"params": {"frame": {"head": fresh["params"]}},
             "batch_stats": {}}
    loaded = load_reference_checkpoint(shell, ckpt)

    got = loaded["params"]["frame"]["head"]
    want = variables["params"]
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_g) == len(flat_w)
    for path, leaf in flat_g:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_w[path]),
            err_msg=str(path))

    # imported params drive the head to the same outputs
    o1 = head.apply(variables, feats, mem_vals, mem_mask, train=False)
    o2 = head.apply({"params": got}, feats, mem_vals, mem_mask, train=False)
    np.testing.assert_allclose(np.asarray(o1.pred_fir),
                               np.asarray(o2.pred_fir), atol=1e-6)


# ---------------------------------------------------------------------------
# OL head: import the reference DetNetV2's state_dict (torch init) into our
# OL-preset LaneHead and require forward parity — validates the OL layout
# of import_head_state_dict (iou stacks, learned position embedding).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_ol_models(ref):
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", trunc_normal_=lambda *a, **k: None,
          DropPath=object)
    _stub("mmcv.cnn", ConvModule=object)
    _stub("libs.ops", nms=types.SimpleNamespace(nms=None))
    _stub("libs.ops.nms", nms=None)
    _stub("libs.models.SeqFormer.util")
    _stub("libs.models.SeqFormer.util.misc", NestedTensor=object)
    from libs.models import Router4OL

    return Router4OL


@pytest.mark.parametrize("with_memory", [False, True])
def test_ol_head_import_forward_parity(ref, ref_ol_models, with_memory):
    torch = ref.torch
    from phnet_tpu.config import (
        BackboneConfig, HeadConfig, LaneSpec, MemoryConfig, ModelConfig,
        NeckConfig, TestParams,
    )
    from phnet_tpu.models.head import LaneHead
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
            decoder_dropout=0.1, pos_encoding="learned",
            separate_offset_head=True,
        ),
        memory=MemoryConfig(window=5, slots_per_frame=5),
        test=TestParams(), max_lanes=4, routing="soft",
    )
    head = LaneHead(cfg)

    ref_cfg = types.SimpleNamespace(
        img_w=IMG_W, img_h=IMG_H, num_points=N_OFFSETS,
        num_priors=HP["num_priors"])
    # pin the torch init draw: the parity tolerance absorbs float
    # reassociation drift through 3 refinement stages, and an unlucky
    # random draw can exceed it (the comparison is exactness-of-import,
    # not statistics — any fixed draw is equally valid)
    torch.manual_seed(0)
    det = ref_ol_models.DetNetV2(
        prior_feat_channels=HP["prior_feat_channels"],
        fc_hidden_dim=HP["fc_hidden_dim"], num_fc=2,
        refine_layers=HP["refine_layers"],
        sample_points=HP["sample_points"], cfg=ref_cfg)
    det.eval()
    sd = {k: v.numpy() for k, v in det.state_dict().items()}

    rng = np.random.default_rng(5)
    b, c = 1, HP["prior_feat_channels"]
    sizes = [(48, 96), (24, 48), (12, 24)]
    feats = tuple(
        jnp.array(rng.normal(size=(b, hh, ww, c)), jnp.float32)
        for hh, ww in sizes
    )
    m = 6
    mem_np = rng.normal(size=(HP["refine_layers"], m,
                              2 * HP["fc_hidden_dim"])).astype(np.float32)
    if with_memory:
        mem_vals = jnp.array(mem_np)[None]
        mem_mask = jnp.ones((b, m), bool)
        last_cuts = [[torch.tensor(mem_np[s][:, None, :])
                      for s in range(HP["refine_layers"])]]
    else:
        mem_vals = jnp.zeros((b, HP["refine_layers"], 1,
                              2 * HP["fc_hidden_dim"]))
        mem_mask = jnp.zeros((b, 1), bool)
        last_cuts = []

    variables = head.init(jax.random.key(0), feats, mem_vals, mem_mask,
                          train=False)
    params = import_head_state_dict(sd)
    # tree structure must match exactly (no missing / extra params)
    want = jax.tree_util.tree_structure(variables["params"])
    got = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, params))
    assert want == got, f"param tree mismatch:\n{want}\nvs\n{got}"
    outs = head.apply({"params": params}, feats, mem_vals, mem_mask,
                      train=False)

    t_feats = [torch.tensor(np.asarray(f).transpose(0, 3, 1, 2))
               for f in feats]
    with torch.no_grad():
        out, attn_list, diff_list = det(t_feats, last_cuts=last_cuts)

    rtol, atol = (2e-3, 2e-3) if with_memory else (2e-4, 5e-4)
    for s in range(HP["refine_layers"]):
        np.testing.assert_allclose(
            np.asarray(outs.diff[s]), diff_list[s].squeeze(-1).numpy(),
            rtol=rtol, atol=atol, err_msg=f"diff stage {s}")
        np.testing.assert_allclose(
            np.asarray(outs.pred_fir[s]),
            out["predictions_fir"][s].numpy(),
            rtol=rtol, atol=atol, err_msg=f"pred_fir stage {s}")
        np.testing.assert_allclose(
            np.asarray(outs.pred_sec[s]),
            out["predictions_sec"][s].numpy(),
            rtol=rtol, atol=atol, err_msg=f"pred_sec stage {s}")


def test_reference_router4olv2_constructor_defect(ref, ref_ol_models):
    """Document a reference defect: ``Router4OLV2.RouterV2`` (the model
    behind testOLV3.py/trainOLV3.py) passes ``num_priors``/``out_channels``
    kwargs to ``AdaptiveRouter4LaneV2`` (Router4OLV2.py:120-124) whose
    ``__init__`` accepts neither (Router.py:84) — the multiscale variant
    cannot be constructed as shipped. Our ``models/head_ms.py`` implements
    the evident intent (per-stage Conv1d reduction + linear scorer). This
    test pins the defect so the divergence stays documented."""
    torch = ref.torch
    del torch
    from libs.models import Router4OLV2

    ref_cfg = types.SimpleNamespace(
        img_w=IMG_W, img_h=IMG_H, num_points=N_OFFSETS, num_priors=32)
    with pytest.raises(TypeError, match="num_priors|out_channels|unexpected"):
        Router4OLV2.RouterV2(
            prior_feat_channels=[16, 8, 4], reg_hidden_dim=32, num_fc=2,
            refine_layers=3, sample_points=[12, 24, 48], cfg=ref_cfg)


def test_dynamic_conv_v2_forward_parity(ref):
    """Our DynamicConv in V2 mode == the reference DynamicConvV2
    (dynamic_head.py:61) with its torch-initialized weights imported."""
    torch = ref.torch
    import importlib

    dynamic_head = importlib.import_module("libs.models.utils.dynamic_head")
    from phnet_tpu.models.dynamic_conv import DynamicConv
    from phnet_tpu.utils.torch_import import _lin, _ln

    P, C, OUT = 12, 16, 64
    torch.manual_seed(0)  # pin the init draw (see OL head parity note)
    tmod = dynamic_head.DynamicConvV2(
        feat_size=P, inplanes=C, outplanes=OUT, early_return=False).eval()
    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}

    ours = DynamicConv(feat_size=P, hidden_dim=C, param_reduction=4,
                       out_dim=OUT, out_hidden=2 * OUT)
    params = {}
    for our, theirs in (("gen1_a", "dynamic_layer_1.0"),
                        ("gen1_b", "dynamic_layer_1.1"),
                        ("gen2_a", "dynamic_layer_2.0"),
                        ("gen2_b", "dynamic_layer_2.1"),
                        ("out_a", "out_layer.0"),
                        ("out_b", "out_layer.1")):
        params[our] = _lin(sd, theirs)
    for n in ("norm1", "norm2", "norm3"):
        params[n] = _ln(sd, n)

    rng = np.random.default_rng(11)
    b, a = 2, 5
    pro = rng.normal(size=(b, a, OUT)).astype(np.float32)
    roi = rng.normal(size=(b, a, P, C)).astype(np.float32)

    # shape sanity: the import must line up with a fresh init's tree
    fresh = ours.init(jax.random.key(0), jnp.array(pro), jnp.array(roi))
    for path, leaf in jax.tree_util.tree_leaves_with_path(fresh["params"]):
        got = params
        for k in path:
            got = got[k.key]
        assert np.asarray(got).shape == leaf.shape, path

    out_ours = ours.apply({"params": params}, jnp.array(pro), jnp.array(roi))
    with torch.no_grad():
        out_ref = tmod(torch.tensor(pro), torch.tensor(roi))
    np.testing.assert_allclose(
        np.asarray(out_ours), out_ref.numpy(), rtol=2e-4, atol=5e-4)
