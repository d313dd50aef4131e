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
    from libs.utils import dynamic_assign, loss4OLV3, lossV5

    return types.SimpleNamespace(
        torch=torch, dynamic_assign=dynamic_assign, lossV5=lossV5,
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
