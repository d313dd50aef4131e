"""Dev loop: pixel-exact comparison of the native rasterizer vs cv2.

Each OpenCV-replica primitive in culane_eval.cpp has a direct cv2 oracle:
  thick_line        <-> cv2.line(thickness=N, LINE_8)
  fill_convex_poly  <-> cv2.fillConvexPoly(shift=16, LINE_8)
  circle_fill       <-> cv2.circle(thickness=-1)
  line2             <-> cv2.line(thickness=1, LINE_8, shift=16)
  draw_lane         <-> official_oracle._draw_lane (spline + cv2.line)

Run: python tools/check_raster.py [--n 2000]
Prints per-primitive mismatch counts; exits nonzero on any mismatch.
"""

import argparse
import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2  # noqa: E402

from phnet_tpu.evaluation import native_eval as ne  # noqa: E402

assert ne.build(force=False)
lib = ctypes.CDLL(ne._SO_PATH)

u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
f8p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
i8p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
f4p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

lib.culane_thick_line.argtypes = [ctypes.c_int] * 7 + [u8p]
lib.culane_fill_convex_poly.argtypes = [i8p] + [ctypes.c_int] * 4 + [u8p]
lib.culane_circle_fill.argtypes = [ctypes.c_int] * 5 + [u8p]
lib.culane_line2.argtypes = [ctypes.c_longlong] * 4 + [ctypes.c_int] * 2 + [u8p]
lib.culane_draw_lane.argtypes = [f8p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, u8p]
lib.culane_spline_interp.argtypes = [f8p, ctypes.c_int, ctypes.c_int, f4p]
lib.culane_spline_interp.restype = ctypes.c_int


def report(name, fails, total, examples):
    print(f"{name}: {total - len(fails)}/{total} exact"
          + ("" if not fails else f"  FIRST FAILS: {examples[:3]}"))
    return len(fails)


def check_thick_line(rng, n, H=120, W=200):
    fails, ex = [], []
    for i in range(n):
        # mix of in-bounds, edge-touching, and far out-of-bounds
        lo, hi = (-50, 250) if i % 3 else (-500, 700)
        x0, y0, x1, y1 = [int(rng.integers(lo, hi)) for _ in range(4)]
        t = int(rng.integers(2, 41))
        a = np.zeros((H, W), np.uint8)
        cv2.line(a, (x0, y0), (x1, y1), 1, t)
        b = np.zeros((H, W), np.uint8)
        lib.culane_thick_line(x0, y0, x1, y1, t, W, H, b)
        if not np.array_equal(a, b):
            fails.append(i)
            ex.append(((x0, y0, x1, y1, t), int((a != b).sum())))
    return report("thick_line", fails, n, ex)


def check_fill_poly(rng, n, H=120, W=200):
    fails, ex = [], []
    for i in range(n):
        lo, hi = (-30 << 16, 230 << 16) if i % 3 else (-400 << 16, 600 << 16)
        pts = rng.integers(lo, hi, (4, 2)).astype(np.int64)
        # convex: build from a center + sorted angles
        c = pts.mean(0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        pts = pts[np.argsort(ang)]
        a = np.zeros((H, W), np.uint8)
        cv2.fillConvexPoly(a, pts.astype(np.int64).reshape(-1, 1, 2), 1,
                           cv2.LINE_8, 16)
        b = np.zeros((H, W), np.uint8)
        lib.culane_fill_convex_poly(np.ascontiguousarray(pts.reshape(-1)),
                                    4, 16, W, H, b)
        if not np.array_equal(a, b):
            fails.append(i)
            ex.append((pts.tolist(), int((a != b).sum())))
    return report("fill_convex_poly", fails, n, ex)


def check_circle(rng, n, H=120, W=200):
    fails, ex = [], []
    for i in range(n):
        cx, cy = int(rng.integers(-60, 260)), int(rng.integers(-60, 180))
        r = int(rng.integers(0, 60))
        a = np.zeros((H, W), np.uint8)
        cv2.circle(a, (cx, cy), r, 1, -1)
        b = np.zeros((H, W), np.uint8)
        lib.culane_circle_fill(cx, cy, r, W, H, b)
        if not np.array_equal(a, b):
            fails.append(i)
            ex.append(((cx, cy, r), int((a != b).sum())))
    return report("circle_fill", fails, n, ex)


def check_line2(rng, n, H=120, W=200):
    fails, ex = [], []
    for i in range(n):
        lo, hi = (-30 << 16, 230 << 16) if i % 3 else (-400 << 16, 600 << 16)
        x0, y0, x1, y1 = [int(rng.integers(lo, hi)) for _ in range(4)]
        a = np.zeros((H, W), np.uint8)
        cv2.line(a, (x0, y0), (x1, y1), 1, 1, cv2.LINE_8, 16)
        b = np.zeros((H, W), np.uint8)
        lib.culane_line2(x0, y0, x1, y1, W, H, b)
        if not np.array_equal(a, b):
            fails.append(i)
            ex.append(((x0, y0, x1, y1), int((a != b).sum())))
    return report("line2", fails, n, ex)


def check_draw_lane(rng, n, H=384, W=768):
    from phnet_tpu.evaluation.official_oracle import _draw_lane
    fails, ex = [], []
    for i in range(n):
        npts = int(rng.integers(2, 9))
        ys = np.sort(rng.uniform(H * 0.3, H - 2, npts))[::-1]
        xs = rng.uniform(-80, W + 80, npts)
        lane = np.stack([xs, ys], -1)
        a = _draw_lane(lane, H, W, 30)
        b = np.zeros((H, W), np.uint8)
        lib.culane_draw_lane(np.ascontiguousarray(lane.reshape(-1)),
                             npts, W, H, 30, b)
        if not np.array_equal(a, b):
            fails.append(i)
            ex.append((i, int((a != b).sum())))
    return report("draw_lane (vs oracle)", fails, n, ex)


def check_spline(rng, n):
    from phnet_tpu.evaluation.official_oracle import spline_interp_times
    fails, ex = [], []
    for i in range(n):
        npts = int(rng.integers(3, 9))
        pts = rng.uniform(-100, 800, (npts, 2))
        a = spline_interp_times([tuple(p) for p in pts], 50)
        out = np.zeros(((npts - 1) * 50 + 1) * 2, np.float32)
        m = lib.culane_spline_interp(
            np.ascontiguousarray(pts.reshape(-1)), npts, 50, out)
        b = out[:2 * m].reshape(-1, 2)
        if len(a) != m or not np.array_equal(a.astype(np.float32), b):
            fails.append(i)
            ex.append((i, len(a), m,
                       float(np.abs(a - b).max()) if len(a) == m else -1))
    return report("spline (vs oracle)", fails, n, ex)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    bad = 0
    bad += check_spline(rng, min(args.n, 300))
    bad += check_circle(rng, args.n)
    bad += check_line2(rng, args.n)
    bad += check_fill_poly(rng, args.n)
    bad += check_thick_line(rng, args.n)
    bad += check_draw_lane(rng, min(args.n, 200))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
