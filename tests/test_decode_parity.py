"""Reference-direct decode parity.

Imports the ACTUAL reference decode methods — ``RouterV2.predictions_to_pred``
/ ``get_lanes`` (``/root/reference/libs/models/RouterV4.py:349-442``) and
``DetNetV2.predictions_to_pred`` / ``get_lanes``
(``/root/reference/libs/models/Router4OL.py:394-479``, incl. the
extend-bottom run) — bound to a minimal stub object, and asserts our
``geometry.decode_predictions`` / ``decode_kept_rows`` plus the
conf-filter -> NMS -> decode chain produce identical Lane point sets on
randomized prediction rows, both lane layouts.

The methods are pure torch, so this pins the exact rounding/clamping
semantics (python banker's round on start/lengths, the -2 sentinel
masking, the <=1-point drop) that shift F1 by tenths if reproduced wrong
(SURVEY risk #4).
"""

import types
from types import MethodType

import numpy as np
import pytest

import jax.numpy as jnp

from test_reference_parity import (  # noqa: F401  (fixtures)
    IMG_H, IMG_W, ref, ref_models, ref_ol_models,
)
from test_clip_parity import _make_torch_nms

from phnet_tpu.config import LaneSpec
from phnet_tpu.geometry import decode_kept_rows, decode_predictions
from phnet_tpu.ops.nms import lane_nms, nms_proposals_from_predictions

CONF = 0.3
NMS_THRES = 10.0
MAX_LANES = 8


def _vil_stub(ref, ref_models, n_offsets):
    torch = ref.torch
    stub = types.SimpleNamespace()
    stub.prior_ys = torch.linspace(1, 0, steps=n_offsets,
                                   dtype=torch.float32)
    stub.n_strips = n_offsets - 1
    stub.img_w = IMG_W
    stub.cfg = types.SimpleNamespace(
        max_lanes=MAX_LANES,
        test_parameters=types.SimpleNamespace(
            conf_threshold=CONF, nms_thres=NMS_THRES))
    stub.predictions_to_pred = MethodType(
        ref_models.RouterV2.predictions_to_pred, stub)
    stub.get_lanes = MethodType(ref_models.RouterV2.get_lanes, stub)
    return stub


def _ol_stub(ref, ref_ol_models, n_offsets):
    torch = ref.torch
    stub = types.SimpleNamespace()
    stub.prior_ys = torch.linspace(1, 0, steps=n_offsets,
                                   dtype=torch.float32)
    stub.n_strips = n_offsets - 1
    stub.img_w = IMG_W
    stub.cfg = types.SimpleNamespace(
        max_lanes=MAX_LANES,
        test_parameters=types.SimpleNamespace(
            conf_threshold=CONF, nms_thres=NMS_THRES))
    stub.predictions_to_pred = MethodType(
        ref_ol_models.DetNetV2.predictions_to_pred, stub)
    stub.get_lanes = MethodType(ref_ol_models.DetNetV2.get_lanes, stub)
    return stub


def _random_rows(seed, n, spec, rounded_lengths):
    """Plausible kept/routed rows: normalized xs incl. out-of-range values
    (exercises the OL extend-bottom mask and the -2 sentinel paths)."""
    rng = np.random.default_rng(seed)
    rows = np.zeros((n, spec.dim), np.float32)
    rows[:, 0] = rng.normal(0, 1, n)
    rows[:, 1] = rng.normal(0, 1, n)
    rows[:, spec.col_start_y] = rng.uniform(0, 1, n)
    rows[:, spec.col_start_x] = rng.uniform(0, 1, n)
    rows[:, 4] = rng.uniform(0.05, 0.95, n)  # theta
    if rounded_lengths:
        rows[:, spec.col_length] = rng.integers(
            0, spec.n_offsets + 4, n).astype(np.float32)
        if spec.n_lengths == 2:
            rows[:, spec.col_invalid_length] = rng.integers(
                0, 10, n).astype(np.float32)
    else:
        rows[:, spec.col_length] = rng.uniform(0, 1.1, n)
        if spec.n_lengths == 2:
            rows[:, spec.col_invalid_length] = rng.uniform(0, 0.3, n)
    base = rng.uniform(0.05, 0.95, (n, 1))
    rows[:, spec.col_xs:] = (
        base + rng.normal(0, 0.15, (n, spec.n_offsets))
    )  # some values leave [0, 1]
    return rows


def _assert_lanes_equal(ours, theirs, msg):
    assert len(ours) == len(theirs), (
        f"{msg}: {len(ours)} lanes vs {len(theirs)}")
    for i, (a, b) in enumerate(zip(ours, theirs)):
        # atol 1e-7: the reference's prior_ys is a float32 linspace upcast
        # to double (RouterV4.py:353-354), ours float64 natively -- ~4e-9
        # per y; emission is %.1f px so this can never move a byte
        np.testing.assert_allclose(
            a.points, np.asarray(b.points, np.float64), rtol=0, atol=1e-7,
            err_msg=f"{msg}: lane {i} points")
        np.testing.assert_allclose(
            float(a.metadata["conf"]), float(b.metadata["conf"]),
            rtol=1e-6, err_msg=f"{msg}: lane {i} conf")


@pytest.mark.parametrize("seed", range(6))
def test_vil_predictions_to_pred_parity(ref, ref_models, seed):
    """decode_predictions == the actual RouterV2.predictions_to_pred
    (RouterV4.py:349-392) on pre-rounded kept rows, incl. the
    invalid-length start shift and the cut-height y uncrop."""
    torch = ref.torch
    spec = LaneSpec(n_offsets=36, n_lengths=2)
    stub = _vil_stub(ref, ref_models, spec.n_offsets)
    rows = _random_rows(seed, 12, spec, rounded_lengths=True)
    ori_h, cut = 370, 129  # int(370 * 0.35)

    with torch.no_grad():
        theirs = stub.predictions_to_pred(
            torch.tensor(rows.copy()), ori_h, cut)
    ours = decode_predictions(rows.copy(), spec, ori_img_h=ori_h,
                              cut_height=cut)
    _assert_lanes_equal(ours, theirs, f"vil seed {seed}")


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("n_offsets", [36, 72])
def test_ol_predictions_to_pred_parity(ref, ref_ol_models, seed, n_offsets):
    """decode_predictions(extend_bottom=True) == the actual
    DetNetV2.predictions_to_pred (Router4OL.py:394-435): the contiguous
    in-image run below the start row survives, the rest is masked."""
    torch = ref.torch
    spec = LaneSpec(n_offsets=n_offsets, n_lengths=1)
    stub = _ol_stub(ref, ref_ol_models, n_offsets)
    rows = _random_rows(seed + 50, 12, spec, rounded_lengths=True)

    with torch.no_grad():
        theirs = stub.predictions_to_pred(torch.tensor(rows.copy()),
                                          1280, 480)
    ours = decode_predictions(rows.copy(), spec, extend_bottom=True)
    _assert_lanes_equal(ours, theirs, f"ol seed {seed}")


def _our_chain(rows, spec, conf, thres, top_k):
    """Our conf-filter -> NMS -> kept rows chain (same ops the model's
    _nms_keeps and the servers use)."""
    e = np.exp(rows[:, :2] - rows[:, :2].max(axis=1, keepdims=True))
    scores = (e / e.sum(axis=1, keepdims=True))[:, 1].astype(np.float32)
    valid = scores >= conf
    props = np.asarray(nms_proposals_from_predictions(
        jnp.asarray(rows), spec, IMG_W))
    keep_idx, num_kept, _ = lane_nms(
        jnp.asarray(props), jnp.asarray(scores), jnp.asarray(valid),
        thresh=thres, n_offsets=spec.n_offsets, top_k=top_k)
    keep_idx = np.asarray(keep_idx)[: int(num_kept)]
    return rows[keep_idx], keep_idx


@pytest.mark.parametrize("seed", range(5))
def test_vil_get_lanes_chain_parity(ref, ref_models, seed):
    """Full VIL decode chain (conf filter -> NMS -> length rounding ->
    predictions_to_pred) == the actual RouterV2.get_lanes
    (RouterV4.py:394-442) with the CUDA NMS transcription."""
    torch = ref.torch
    import libs.models.RouterV4 as RouterV4

    RouterV4.nms = _make_torch_nms(torch)
    spec = LaneSpec(n_offsets=36, n_lengths=2)
    stub = _vil_stub(ref, ref_models, spec.n_offsets)
    rows = _random_rows(seed + 100, 64, spec, rounded_lengths=False)
    org_size = (370, 640)
    cut_scale = 0.35

    with torch.no_grad():
        decoded, keep_inds, keep = stub.get_lanes(
            torch.tensor(rows.copy())[None], org_size, cut_scale)
    gk = np.where(keep_inds.numpy())[0][
        keep.numpy() if hasattr(keep, "numpy") else np.asarray(keep, int)]

    kept_rows, keep_idx = _our_chain(rows, spec, CONF, NMS_THRES, MAX_LANES)
    assert np.array_equal(keep_idx, gk), f"keeps {keep_idx} vs {gk}"
    ours = decode_kept_rows(
        kept_rows, spec, ori_img_h=org_size[0],
        cut_height=int(org_size[0] * cut_scale))
    _assert_lanes_equal(ours, decoded[0], f"vil chain seed {seed}")
    assert len(gk) > 0  # the fixture must exercise the keep path


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n_offsets", [36, 72])
def test_ol_get_lanes_chain_parity(ref, ref_ol_models, seed, n_offsets):
    """Full OL decode chain == the actual DetNetV2.get_lanes
    (Router4OL.py:437-479): single length field, no theta in the NMS rows,
    extend-bottom decode."""
    torch = ref.torch
    import libs.models.Router4OL as Router4OL

    Router4OL.nms = _make_torch_nms(torch)
    spec = LaneSpec(n_offsets=n_offsets, n_lengths=1)
    stub = _ol_stub(ref, ref_ol_models, n_offsets)
    rows = _random_rows(seed + 200, 64, spec, rounded_lengths=False)

    with torch.no_grad():
        decoded, keep_inds, keep = stub.get_lanes(
            torch.tensor(rows.copy())[None], (1280, 1920), 480)
    gk = np.where(keep_inds.numpy())[0][
        keep.numpy() if hasattr(keep, "numpy") else np.asarray(keep, int)]

    kept_rows, keep_idx = _our_chain(rows, spec, CONF, NMS_THRES, MAX_LANES)
    assert np.array_equal(keep_idx, gk), f"keeps {keep_idx} vs {gk}"
    ours = decode_kept_rows(kept_rows, spec)
    _assert_lanes_equal(ours, decoded[0], f"ol chain seed {seed}")
    assert len(gk) > 0
