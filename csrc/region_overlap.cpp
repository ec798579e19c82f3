// VOT polygon-overlap kernel (C++ reimplementation of the protocol semantics).
//
// The VOT accuracy/robustness/EAO numbers are defined by an exact integer-grid
// polygon rasterization (reference: utils/pysot/utils/src/region.c — the
// non-legacy path, since the toolkit never sets REGION_LEGACY_RASTERIZATION):
//
//   1. each polygon's vertices are rounded (round-half-away-from-zero, C round),
//   2. per scan row, edge crossings produce integer node positions via a
//      truncating cast of the interpolated x,
//   3. nodes are sorted; equal consecutive nodes collapse; spans fill INCLUSIVE
//      of the right node, clamped to the raster;
//   4. overlap = |A∩B| / |A∪B| counted over the joint rounded bounding box,
//      with a 1e-10 area-ratio early-out and a bounds pre-check.
//
// This file is written from the algorithm's observable semantics (verified by a
// differential test against the compiled reference in tests/test_region.cpp.py);
// it is not a copy. Exposed via a minimal C ABI for ctypes.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Bounds {
  float top, bottom, left, right;
};

Bounds poly_bounds(const float* xs, const float* ys, int n) {
  Bounds b{FLT_MAX, -FLT_MAX, FLT_MAX, -FLT_MAX};
  for (int i = 0; i < n; i++) {
    b.top = std::min(b.top, ys[i]);
    b.bottom = std::max(b.bottom, ys[i]);
    b.left = std::min(b.left, xs[i]);
    b.right = std::max(b.right, xs[i]);
  }
  return b;
}

Bounds round_bounds(Bounds b) {
  return Bounds{std::floor(b.top), std::ceil(b.bottom), std::floor(b.left),
                std::ceil(b.right)};
}

Bounds intersect(Bounds a, Bounds b) {
  return Bounds{std::max(a.top, b.top), std::min(a.bottom, b.bottom),
                std::max(a.left, b.left), std::min(a.right, b.right)};
}

float bounds_iou(Bounds a, Bounds b) {
  Bounds r = intersect(a, b);
  float inter = (r.right - r.left) * (r.bottom - r.top);
  float uni = (a.right - a.left) * (a.bottom - a.top) +
              (b.right - b.left) * (b.bottom - b.top) - inter;
  return std::max(0.0f, inter / uni);
}

// Scan-line rasterization with the protocol's exact integer behavior.
// Writes 0/1 bytes into mask (size width*height); mask may be null (count only).
int rasterize(const float* xs_in, const float* ys_in, int n, char* mask,
              int width, int height) {
  std::vector<float> xs(n), ys(n);
  for (int i = 0; i < n; i++) {
    xs[i] = std::round(xs_in[i]);
    ys[i] = std::round(ys_in[i]);
  }
  if (mask) std::memset(mask, 0, (size_t)width * height);

  std::vector<int> nodeX(n);
  int sum = 0;

  for (int y = 0; y < height; y++) {
    int nodes = 0;
    int j = n - 1;
    for (int i = 0; i < n; i++) {
      const int yi = (int)ys[i], yj = (int)ys[j];
      const bool crosses =
          (yi <= y && yj > y) || (yj <= y && yi > y) ||
          (yi < y && yj >= y) || (yj < y && yi >= y) ||
          (yi == yj && yi == y);
      if (crosses) {
        double r = (double)ys[j] - ys[i];
        double k = (double)xs[j] - xs[i];
        if (r != 0)
          nodeX[nodes++] = (int)((double)xs[i] + (double)(y - ys[i]) / r * k);
      }
      j = i;
    }
    std::sort(nodeX.begin(), nodeX.begin() + nodes);

    int i = 0;
    while (i < nodes - 1) {
      if (nodeX[i] == nodeX[i + 1]) {  // vertex exactly on the scanline
        i++;
        continue;
      }
      if (nodeX[i] >= width) break;
      if (nodeX[i + 1] >= 0) {
        int lo = std::max(nodeX[i], 0);
        int hi = std::min(nodeX[i + 1], width - 1);
        for (int x = lo; x <= hi; x++) {
          if (mask) mask[(size_t)y * width + x] = 1;
          sum++;
        }
      }
      i += 2;
    }
  }
  return sum;
}

}  // namespace

extern "C" {

// Returns intersection-over-union of the two polygons within `bounds`
// (top, bottom, left, right; pass -FLT_MAX/FLT_MAX for unbounded).
float region_polygon_overlap(const float* x1, const float* y1, int n1,
                             const float* x2, const float* y2, int n2,
                             float b_top, float b_bottom, float b_left,
                             float b_right) {
  Bounds bounds{b_top, b_bottom, b_left, b_right};
  Bounds bb1 = intersect(round_bounds(poly_bounds(x1, y1, n1)), bounds);
  Bounds bb2 = intersect(round_bounds(poly_bounds(x2, y2, n2)), bounds);

  float ox = std::min(bb1.left, bb2.left);
  float oy = std::min(bb1.top, bb2.top);
  int width = (int)(std::max(bb1.right, bb2.right) - ox) + 1;
  int height = (int)(std::max(bb1.bottom, bb2.bottom) - oy) + 1;

  double a1 = (double)(bb1.right - bb1.left) * (bb1.bottom - bb1.top);
  double a2 = (double)(bb2.right - bb2.left) * (bb2.bottom - bb2.top);
  if (a1 / a2 < 1e-10 || a2 / a1 < 1e-10 || width < 1 || height < 1) return 0;
  if (bounds_iou(bb1, bb2) == 0) return 0;

  std::vector<float> ox1(n1), oy1(n1), ox2(n2), oy2(n2);
  for (int i = 0; i < n1; i++) { ox1[i] = x1[i] - ox; oy1[i] = y1[i] - oy; }
  for (int i = 0; i < n2; i++) { ox2[i] = x2[i] - ox; oy2[i] = y2[i] - oy; }

  std::vector<char> m1((size_t)width * height), m2((size_t)width * height);
  rasterize(ox1.data(), oy1.data(), n1, m1.data(), width, height);
  rasterize(ox2.data(), oy2.data(), n2, m2.data(), width, height);

  int64_t inter = 0, uni = 0;
  for (size_t i = 0; i < (size_t)width * height; i++) {
    if (m1[i] && m2[i]) inter++;
    if (m1[i] || m2[i]) uni++;
  }
  // note: uni == 0 yields IEEE 0/0 = NaN, matching the reference's behavior
  return (float)inter / (float)uni;
}

// Batched trajectory overlap: polygons flattened as x/y pairs with per-frame
// offsets and counts; writes n_frames overlaps into `out`.
void region_polygon_overlap_traj(const float* xs1, const float* ys1,
                                 const int* offs1, const int* cnts1,
                                 const float* xs2, const float* ys2,
                                 const int* offs2, const int* cnts2,
                                 int n_frames, float b_top, float b_bottom,
                                 float b_left, float b_right, float* out) {
  for (int i = 0; i < n_frames; i++) {
    out[i] = region_polygon_overlap(xs1 + offs1[i], ys1 + offs1[i], cnts1[i],
                                    xs2 + offs2[i], ys2 + offs2[i], cnts2[i],
                                    b_top, b_bottom, b_left, b_right);
  }
}

// Rasterize one polygon into a byte mask (caller-allocated width*height).
int region_rasterize(const float* xs, const float* ys, int n, char* mask,
                     int width, int height) {
  return rasterize(xs, ys, n, mask, width, height);
}

}  // extern "C"
