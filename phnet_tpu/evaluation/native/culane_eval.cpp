// CULane-format lane evaluator, self-contained C++ (no OpenCV).
//
// Native equivalent of the reference's evaluation/culane C++ tool
// (spline.cpp / lane_compare.cpp / counter.cpp / evaluate.cpp): per frame,
// spline-interpolate both lane sets, rasterize each lane as a thick
// polyline into a bitmap, compute pairwise pixel IoU, Hungarian-match, and
// count TP at IoU > threshold. OpenMP parallelizes over frames.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Intentional deviations from the reference binary (verified equivalent on
// thresholded counts by tests/test_native_eval.py against the independent
// python metric; per-pair IoUs agree to a few 1e-3):
//  * spline: reference uses per-segment cubic splines sampled 50x per input
//    segment (spline.cpp splineInterpTimes); we use one natural cubic
//    spline over the whole polyline parametrized by chord length, sampled
//    at ~1px arc steps. 2-point lanes stay straight segments (same as
//    lane_compare.cpp:23-28).
//  * raster: reference draws with cv::line(thickness=w) whose caps/joins
//    are OpenCV-rounded; we stamp round-capped thick segments directly.
//    Near-threshold pairs can differ by <1e-2 IoU; counts match elsewhere.
//  * matching: same Hungarian objective as counter.cpp:139-161 (maximize
//    summed similarity, TP at IoU > threshold).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Pt {
  double x, y;
};

using Lanes = std::vector<std::vector<Pt>>;

Lanes parse_lines_txt(const char* path) {
  Lanes lanes;
  std::ifstream in(path);
  if (!in.good()) return lanes;
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    std::vector<Pt> lane;
    double x, y;
    while (ss >> x >> y) lane.push_back({x, y});
    if (lane.size() >= 2) lanes.push_back(std::move(lane));
  }
  return lanes;
}

// Natural cubic spline through the points, parametrized by chord length;
// `times` subdivisions per segment (reference splineInterpTimes uses 50).
std::vector<Pt> spline_interp(const std::vector<Pt>& pts, int times = 50) {
  const int n = static_cast<int>(pts.size());
  if (n == 2) {
    std::vector<Pt> out;
    out.reserve(times + 1);
    for (int k = 0; k <= times; ++k) {
      double u = double(k) / times;
      out.push_back({pts[0].x + (pts[1].x - pts[0].x) * u,
                     pts[0].y + (pts[1].y - pts[0].y) * u});
    }
    return out;
  }
  // chord-length parameter
  std::vector<double> t(n, 0.0);
  for (int i = 1; i < n; ++i) {
    double dx = pts[i].x - pts[i - 1].x, dy = pts[i].y - pts[i - 1].y;
    t[i] = t[i - 1] + std::max(std::sqrt(dx * dx + dy * dy), 1e-9);
  }
  // natural cubic spline second derivatives for one coordinate
  auto solve_m = [&](auto coord) {
    std::vector<double> a(n, 0), b(n, 0), c(n, 0), d(n, 0), m(n, 0);
    b[0] = b[n - 1] = 1.0;
    for (int i = 1; i < n - 1; ++i) {
      double h0 = t[i] - t[i - 1], h1 = t[i + 1] - t[i];
      a[i] = h0;
      b[i] = 2.0 * (h0 + h1);
      c[i] = h1;
      d[i] = 6.0 * ((coord(i + 1) - coord(i)) / h1 -
                    (coord(i) - coord(i - 1)) / h0);
    }
    // Thomas solve
    for (int i = 1; i < n; ++i) {
      double w = a[i] / b[i - 1];
      b[i] -= w * c[i - 1];
      d[i] -= w * d[i - 1];
    }
    m[n - 1] = d[n - 1] / b[n - 1];
    for (int i = n - 2; i >= 0; --i) m[i] = (d[i] - c[i] * m[i + 1]) / b[i];
    return m;
  };
  auto X = [&](int i) { return pts[i].x; };
  auto Y = [&](int i) { return pts[i].y; };
  std::vector<double> mx = solve_m(X), my = solve_m(Y);

  std::vector<Pt> out;
  out.reserve((n - 1) * times + 1);
  for (int i = 0; i < n - 1; ++i) {
    double h = t[i + 1] - t[i];
    for (int k = 0; k < times; ++k) {
      double u = t[i] + h * k / times;
      double A = (t[i + 1] - u) / h, B = (u - t[i]) / h;
      double x = A * pts[i].x + B * pts[i + 1].x +
                 ((A * A * A - A) * mx[i] + (B * B * B - B) * mx[i + 1]) *
                     (h * h) / 6.0;
      double y = A * pts[i].y + B * pts[i + 1].y +
                 ((A * A * A - A) * my[i] + (B * B * B - B) * my[i + 1]) *
                     (h * h) / 6.0;
      out.push_back({x, y});
    }
  }
  out.push_back(pts.back());
  return out;
}

// Rasterize a polyline with round-capped thick segments (cv::line
// semantics at thickness = width).
void draw_lane(const std::vector<Pt>& poly, int w, int h, int width,
               std::vector<uint8_t>& img) {
  std::fill(img.begin(), img.end(), 0);
  const double r = width / 2.0, r2 = r * r;
  for (size_t s = 0; s + 1 < poly.size(); ++s) {
    double x0 = poly[s].x, y0 = poly[s].y, x1 = poly[s + 1].x,
           y1 = poly[s + 1].y;
    int xmin = std::max(0, (int)std::floor(std::min(x0, x1) - r));
    int xmax = std::min(w - 1, (int)std::ceil(std::max(x0, x1) + r));
    int ymin = std::max(0, (int)std::floor(std::min(y0, y1) - r));
    int ymax = std::min(h - 1, (int)std::ceil(std::max(y0, y1) + r));
    double dx = x1 - x0, dy = y1 - y0;
    double len2 = dx * dx + dy * dy;
    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        double px = x - x0, py = y - y0;
        double tt = len2 > 0 ? std::clamp((px * dx + py * dy) / len2, 0.0, 1.0)
                             : 0.0;
        double ex = px - tt * dx, ey = py - tt * dy;
        if (ex * ex + ey * ey <= r2) img[(size_t)y * w + x] = 1;
      }
    }
  }
}

// Hungarian (Jonker-Volgenant) minimizing cost, rows <= cols.
std::vector<int> hungarian(const std::vector<std::vector<double>>& cost) {
  int nr = cost.size();
  if (nr == 0) return {};
  int nc = cost[0].size();
  const double INF = 1e18;
  std::vector<double> u(nr, 0), v(nc, 0);
  std::vector<int> col4row(nr, -1), row4col(nc, -1);
  for (int cur = 0; cur < nr; ++cur) {
    std::vector<double> shortest(nc, INF);
    std::vector<int> path(nc, -1);
    std::vector<char> visited(nc, 0), row_scanned(nr, 0);
    int i = cur, sink = -1;
    double minv = 0;
    while (sink < 0) {
      row_scanned[i] = 1;
      int jmin = -1;
      double best = INF;
      for (int j = 0; j < nc; ++j) {
        if (visited[j]) continue;
        double red = minv + cost[i][j] - u[i] - v[j];
        if (red < shortest[j]) {
          shortest[j] = red;
          path[j] = i;
        }
        if (shortest[j] < best) {
          best = shortest[j];
          jmin = j;
        }
      }
      minv = best;
      visited[jmin] = 1;
      if (row4col[jmin] < 0)
        sink = jmin;
      else
        i = row4col[jmin];
    }
    u[cur] += minv;
    for (int r = 0; r < nr; ++r)
      if (row_scanned[r] && r != cur) u[r] += minv - shortest[col4row[r]];
    for (int j = 0; j < nc; ++j)
      if (visited[j]) v[j] += shortest[j] - minv;
    int j = sink;
    while (true) {
      int r = path[j];
      row4col[j] = r;
      std::swap(col4row[r], j);
      if (r == cur) break;
    }
  }
  return col4row;
}

struct FrameResult {
  long tp = 0, fp = 0, fn = 0, n_pred = 0;
  double iou_sum = 0;  // sum of matched prediction IoUs
};

FrameResult eval_frame(const Lanes& pred, const Lanes& anno, int w, int h,
                       int width, double thr) {
  FrameResult r;
  r.n_pred = pred.size();
  if (pred.empty() && anno.empty()) return r;
  if (pred.empty()) {
    r.fn = anno.size();
    return r;
  }
  if (anno.empty()) {
    r.fp = pred.size();
    return r;
  }
  size_t npix = (size_t)w * h;
  std::vector<std::vector<uint8_t>> pm(pred.size(),
                                       std::vector<uint8_t>(npix));
  std::vector<std::vector<uint8_t>> am(anno.size(),
                                       std::vector<uint8_t>(npix));
  std::vector<uint8_t> tmp(npix);
  for (size_t i = 0; i < pred.size(); ++i)
    draw_lane(spline_interp(pred[i]), w, h, width, pm[i]);
  for (size_t i = 0; i < anno.size(); ++i)
    draw_lane(spline_interp(anno[i]), w, h, width, am[i]);

  std::vector<std::vector<double>> iou(
      pred.size(), std::vector<double>(anno.size(), 0.0));
  for (size_t i = 0; i < pred.size(); ++i)
    for (size_t j = 0; j < anno.size(); ++j) {
      long inter = 0, uni = 0;
      const uint8_t* a = pm[i].data();
      const uint8_t* b = am[j].data();
      for (size_t k = 0; k < npix; ++k) {
        inter += a[k] & b[k];
        uni += a[k] | b[k];
      }
      iou[i][j] = uni > 0 ? double(inter) / double(uni) : 0.0;
    }
  // minimize (1 - iou); rows must be the smaller side
  bool swapped = pred.size() > anno.size();
  size_t nr = swapped ? anno.size() : pred.size();
  size_t nc = swapped ? pred.size() : anno.size();
  std::vector<std::vector<double>> cost(nr, std::vector<double>(nc));
  for (size_t i = 0; i < nr; ++i)
    for (size_t j = 0; j < nc; ++j)
      cost[i][j] = 1.0 - (swapped ? iou[j][i] : iou[i][j]);
  std::vector<int> match = hungarian(cost);
  for (size_t i = 0; i < nr; ++i) {
    int j = match[i];
    if (j < 0) continue;
    double v = swapped ? iou[j][i] : iou[i][j];
    r.iou_sum += v;
    if (v > thr) r.tp++;
  }
  r.fp = pred.size() - r.tp;
  r.fn = anno.size() - r.tp;
  return r;
}

}  // namespace

extern "C" {

// Evaluate n (pred, anno) file pairs; outputs accumulated counters.
// Returns number of frames processed.
int culane_evaluate_files(const char** pred_paths, const char** anno_paths,
                          int n, int img_w, int img_h, int lane_width,
                          double iou_thr, long* tp, long* fp, long* fn,
                          double* iou_sum, long* n_pred) {
  long TP = 0, FP = 0, FN = 0, NP = 0;
  double IOU = 0;
#pragma omp parallel for schedule(dynamic) reduction(+:TP,FP,FN,NP,IOU)
  for (int i = 0; i < n; ++i) {
    Lanes pred = parse_lines_txt(pred_paths[i]);
    Lanes anno = parse_lines_txt(anno_paths[i]);
    FrameResult r = eval_frame(pred, anno, img_w, img_h, lane_width, iou_thr);
    TP += r.tp;
    FP += r.fp;
    FN += r.fn;
    NP += r.n_pred;
    IOU += r.iou_sum;
  }
  *tp = TP;
  *fp = FP;
  *fn = FN;
  *iou_sum = IOU;
  *n_pred = NP;
  return n;
}

}  // extern "C"
