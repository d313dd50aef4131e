"""Seeded pixel-exactness fuzz of the native rasterizer vs cv2 (in-suite).

Protects the exact-port claim of ``evaluation/native/culane_eval.cpp``
against future edits: every drawing primitive the native CULane scorer
uses (replicas of OpenCV ``drawing.cpp`` internals) is compared
pixel-for-pixel against the real cv2 implementation shipped in the
image, plus the spline/draw-lane composites against the transcription
oracle (``evaluation/official_oracle.py``). The heavy dev-loop version
with larger N lives in ``tools/check_raster.py`` — this is the same
comparison code at suite-friendly N with a pinned seed.
"""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import check_raster as cr  # noqa: E402  (builds the native lib on import)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_spline_matches_oracle(rng):
    assert cr.check_spline(rng, 60) == 0


def test_circle_fill_matches_cv2(rng):
    assert cr.check_circle(rng, 250) == 0


def test_line2_matches_cv2(rng):
    assert cr.check_line2(rng, 250) == 0


def test_fill_convex_poly_matches_cv2(rng):
    assert cr.check_fill_poly(rng, 250) == 0


def test_thick_line_matches_cv2(rng):
    assert cr.check_thick_line(rng, 250) == 0


def test_draw_lane_matches_oracle(rng):
    assert cr.check_draw_lane(rng, 40) == 0
