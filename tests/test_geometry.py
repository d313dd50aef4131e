"""Tests for lane geometry: resampling, label encode, prediction decode."""

import math

import numpy as np
import pytest

from phnet_tpu.config import LaneSpec
from phnet_tpu.geometry import (
    Lane,
    build_prior_embeddings,
    decode_predictions,
    encode_lane_label,
    lane_to_culane_points,
    prior_ys,
    sample_lane,
    sample_ys_for,
)

IMG_H, IMG_W = 384, 768


def straight_lane(x0, slope, y_top, y_bot=IMG_H - 1, n=20):
    """Points bottom-to-top along x = x0 + slope * (y_bot - y)."""
    ys = np.linspace(y_bot, y_top, n)
    xs = x0 + slope * (y_bot - ys)
    return [(float(x), float(y)) for x, y in zip(xs, ys)]


def test_sample_ys_grid():
    ys = sample_ys_for(IMG_H, 36)
    assert len(ys) == 36
    assert ys[0] == IMG_H
    np.testing.assert_allclose(ys[-1], 0.0, atol=1e-9)


def test_sample_lane_straight_line():
    pts = straight_lane(100.0, 0.5, y_top=100.0)
    sample_ys = sample_ys_for(IMG_H, 36)
    extrap, interp, outside, inside = sample_lane(pts, sample_ys, IMG_W)
    all_xs = np.hstack([extrap, interp])
    # every sampled x must lie on the line
    covered_ys = sample_ys[sample_ys >= 100.0]
    expected = 100.0 + 0.5 * (IMG_H - 1 - covered_ys)
    np.testing.assert_allclose(all_xs, expected, atol=1e-6)
    assert len(outside) + len(inside) == len(all_xs)


def test_sample_lane_requires_sorted():
    with pytest.raises(ValueError):
        sample_lane([(0, 10), (5, 20), (10, 15)], sample_ys_for(IMG_H, 36), IMG_W)


@pytest.mark.parametrize("n_lengths", [1, 2])
def test_encode_label_roundtrip_geometry(n_lengths):
    spec = LaneSpec(n_offsets=36, n_lengths=n_lengths)
    lanes = [straight_lane(200.0, 0.3, y_top=50.0), straight_lane(500.0, -0.2, y_top=120.0)]
    label = encode_lane_label(lanes, [0, 1], spec, IMG_H, IMG_W, max_lanes=4)
    assert label.shape == (4, spec.dim)
    # two valid lanes
    np.testing.assert_array_equal(label[:2, 1], 1.0)
    np.testing.assert_array_equal(label[2:, 1], 0.0)
    # start_x normalization differs between layouts
    xs0 = label[0, spec.col_xs :]
    valid_xs = xs0[xs0 > -1e4]
    assert len(valid_xs) > 25
    # xs stored in absolute pixels along the line
    sample_ys = sample_ys_for(IMG_H, 36)
    expected = 200.0 + 0.3 * (IMG_H - 1 - sample_ys[: len(valid_xs)])
    np.testing.assert_allclose(valid_xs, expected, atol=1e-4)
    # theta sane: atan-based value in (0, 1)
    assert 0.0 < label[0, spec.col_theta] < 1.0
    if n_lengths == 2:
        assert label[0, spec.col_start_x] == pytest.approx(valid_xs[0] / IMG_W)
    else:
        assert label[0, spec.col_start_x] == pytest.approx(valid_xs[0] / (IMG_W - 1))


def test_encode_label_skips_short_lanes():
    spec = LaneSpec(36, 2)
    label = encode_lane_label([[(100, 300)]], [0], spec, IMG_H, IMG_W, 8)
    assert label[0, 1] == 0.0  # invalid


def test_decode_predictions_vil_roundtrip():
    spec = LaneSpec(36, 2)
    pred = np.zeros((1, spec.dim), dtype=np.float32)
    pred[0, 1] = 5.0
    pred[0, spec.col_start_y] = 0.0
    pred[0, spec.col_length] = 20.0  # already rounded to strips
    pred[0, spec.col_invalid_length] = 0.0
    pred[0, spec.col_xs :] = np.linspace(0.2, 0.6, 36)
    lanes = decode_predictions(pred, spec, ori_img_h=1080, cut_height=378)
    assert len(lanes) == 1
    pts = lanes[0].points
    assert len(pts) == 20
    # ys increase (top to bottom ordering reversed -> ascending normalized y)
    assert np.all(np.diff(pts[:, 1]) > 0)
    # bottom point maps to normalized y == 1 (image bottom), uncropped
    np.testing.assert_allclose(pts[-1, 1], 1.0, atol=1e-6)
    # top visible row: strip 19 -> prior_y = 1 - 19/35, rescaled by crop
    py = prior_ys(36)[19]
    np.testing.assert_allclose(pts[0, 1], (py * (1080 - 378) + 378) / 1080, atol=1e-6)


def test_decode_predictions_invalid_len_shifts_start():
    spec = LaneSpec(36, 2)
    pred = np.zeros((1, spec.dim), dtype=np.float32)
    pred[0, spec.col_start_y] = 0.0
    pred[0, spec.col_length] = 10.0
    pred[0, spec.col_invalid_length] = 4.0
    pred[0, spec.col_xs :] = 0.5
    lanes = decode_predictions(pred, spec)
    # start = 0 + 4, end = 4 + 10 - 1 = 13 -> 10 points
    assert len(lanes[0].points) == 10


def test_decode_predictions_ol_extend_bottom():
    spec = LaneSpec(36, 1)
    pred = np.zeros((1, spec.dim), dtype=np.float32)
    pred[0, spec.col_start_y] = 10.0 / 35.0
    pred[0, spec.col_length] = 10.0
    xs = np.full(36, 0.5, dtype=np.float32)
    xs[:4] = -0.3  # out of image below the start: must stay masked
    pred[0, spec.col_xs :] = xs
    lanes = decode_predictions(pred, spec, extend_bottom=True)
    # rows 4..9 extend the lane downward (in-image), rows 0..3 dropped,
    # rows 10..19 are the predicted span
    assert len(lanes[0].points) == 16


def test_lane_object_eval():
    pts = np.stack([np.linspace(0.2, 0.4, 10), np.linspace(0.1, 1.0, 10)], axis=1)
    lane = Lane(points=pts)
    xs = lane(np.array([0.5, 2.0]))
    assert abs(xs[0] - np.interp(0.5, pts[:, 1], pts[:, 0])) < 1e-2
    assert xs[1] == -2.0  # out of domain


def test_build_prior_embeddings_matches_reference_layout():
    w = build_prior_embeddings(240)
    assert w.shape == (240, 3)
    # left block: start_x = 0, thetas alternate 0.16/0.32
    assert np.all(w[:60, 1] == 0.0)
    assert w[0, 2] == pytest.approx(0.16) and w[1, 2] == pytest.approx(0.32)
    # bottom blocks: start_y = 0
    assert np.all(w[60:180, 0] == 0.0)
    # right block: start_x = 1
    assert np.all(w[180:, 1] == 1.0)
    strip = 0.8 / (60 // 2 - 1)
    assert w[58, 0] == pytest.approx((58 // 2) * strip)


def test_lane_to_culane_points_scaling():
    pts = np.stack([np.linspace(0.1, 0.5, 8), np.linspace(0.2, 1.0, 8)], axis=1)
    lane = Lane(points=pts)
    out = lane_to_culane_points(lane, size=(1080, 1920))
    assert out.shape == (8, 2)
    np.testing.assert_allclose(out[0], [0.5 * 1920, 1.0 * 1080], atol=1e-6)
    out_ol = lane_to_culane_points(lane, size=(800, 1920), half_scale=True, y_offset=480)
    np.testing.assert_allclose(out_ol[0], [0.5 * 1920 / 2, (1.0 * 800 + 480) / 2], atol=1e-5)
