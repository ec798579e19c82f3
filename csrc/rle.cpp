// COCO run-length-encoded mask codec (C++ reimplementation).
//
// Implements the exact observable semantics of the COCO mask API (the reference
// vendors it at data/coco/pycocotools/common/maskApi.c; differential-tested
// against that build in tests/test_rle.py). Bit-parity is mandated, so the
// polygon/merge routines transcribe the COCO maskApi algorithm spec (third-party
// BSD) — the codec framing, string codec, and ABI are this project's own:
//
// - RLE counts alternate background/foreground runs over the COLUMN-MAJOR
//   flattened mask (Fortran order), starting with background.
// - polygon -> RLE uses the protocol's 5x upsampled boundary walk: vertices
//   scaled by 5 and rounded, edges drawn with a DDA whose major axis is the
//   longer delta (with the documented flip rule), column-crossing boundary
//   points downsampled back and even-odd folded into runs.
// - merge composes n masks by run-synchronized union/intersection.
//
// Exposed via a C ABI for ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

namespace {

using std::vector;

vector<uint32_t> encode_colmajor(const uint8_t* m, long size) {
  vector<uint32_t> cnts;
  uint8_t p = 0;
  uint32_t c = 0;
  for (long j = 0; j < size; j++) {
    if (m[j] != p) {
      cnts.push_back(c);
      c = 0;
      p = m[j];
    }
    c++;
  }
  cnts.push_back(c);
  return cnts;
}

vector<uint32_t> merge2(const vector<uint32_t>& A, const vector<uint32_t>& B,
                        bool intersect) {
  vector<uint32_t> out;
  size_t a = 1, b = 1;
  uint32_t ca = A.empty() ? 0 : A[0];
  uint32_t cb = B.empty() ? 0 : B[0];
  int v = 0, va = 0, vb = 0;
  uint32_t cc = 0;
  uint64_t ct = 1;
  while (ct > 0) {
    uint32_t c = std::min(ca, cb);
    cc += c;
    ct = 0;
    ca -= c;
    if (!ca && a < A.size()) { ca = A[a++]; va = !va; }
    ct += ca;
    cb -= c;
    if (!cb && b < B.size()) { cb = B[b++]; vb = !vb; }
    ct += cb;
    int vp = v;
    v = intersect ? (va && vb) : (va || vb);
    if (v != vp || ct == 0) {
      out.push_back(cc);
      cc = 0;
    }
  }
  return out;
}

vector<uint32_t> from_poly(const double* xy, int k, int h, int w) {
  const double scale = 5;
  vector<int> x(k + 1), y(k + 1);
  for (int j = 0; j < k; j++) x[j] = (int)(scale * xy[j * 2 + 0] + .5);
  for (int j = 0; j < k; j++) y[j] = (int)(scale * xy[j * 2 + 1] + .5);
  x[k] = x[0];
  y[k] = y[0];

  // dense boundary walk on the upsampled grid
  vector<int> u, v;
  for (int j = 0; j < k; j++) {
    int xs = x[j], xe = x[j + 1], ys = y[j], ye = y[j + 1];
    int dx = std::abs(xe - xs), dy = std::abs(ys - ye);
    bool flip = (dx >= dy && xs > xe) || (dx < dy && ys > ye);
    if (flip) { std::swap(xs, xe); std::swap(ys, ye); }
    double s = dx >= dy ? (double)(ye - ys) / dx : (double)(xe - xs) / dy;
    if (dx >= dy) {
      for (int d = 0; d <= dx; d++) {
        int t = flip ? dx - d : d;
        u.push_back(t + xs);
        v.push_back((int)(ys + s * t + .5));
      }
    } else {
      for (int d = 0; d <= dy; d++) {
        int t = flip ? dy - d : d;
        v.push_back(t + ys);
        u.push_back((int)(xs + s * t + .5));
      }
    }
  }

  // keep column-crossing points, downsample back to the original grid
  vector<int> px, py;
  for (size_t j = 1; j < u.size(); j++) {
    if (u[j] == u[j - 1]) continue;
    double xd = (double)(u[j] < u[j - 1] ? u[j] : u[j] - 1);
    xd = (xd + .5) / scale - .5;
    if (std::floor(xd) != xd || xd < 0 || xd > w - 1) continue;
    double yd = (double)(v[j] < v[j - 1] ? v[j] : v[j - 1]);
    yd = (yd + .5) / scale - .5;
    if (yd < 0) yd = 0; else if (yd > h) yd = h;
    yd = std::ceil(yd);
    px.push_back((int)xd);
    py.push_back((int)yd);
  }

  // even-odd fold the sorted column-major boundary positions into runs
  vector<uint32_t> a;
  for (size_t j = 0; j < px.size(); j++)
    a.push_back((uint32_t)(px[j] * h + py[j]));
  a.push_back((uint32_t)(h * w));
  std::sort(a.begin(), a.end());
  uint32_t p = 0;
  for (size_t j = 0; j < a.size(); j++) {
    uint32_t t = a[j];
    a[j] -= p;
    p = t;
  }
  vector<uint32_t> b;
  size_t j = 0;
  b.push_back(a[j++]);
  while (j < a.size()) {
    if (a[j] > 0) {
      b.push_back(a[j++]);
    } else {
      j++;
      if (j < a.size()) b.back() += a[j++];
    }
  }
  return b;
}

}  // namespace

extern "C" {

// Encode a column-major byte mask; writes counts to cnts_out (caller allocates
// >= size+1 entries); returns m.
int rle_encode(const uint8_t* mask, long size, uint32_t* cnts_out) {
  auto cnts = encode_colmajor(mask, size);
  std::copy(cnts.begin(), cnts.end(), cnts_out);
  return (int)cnts.size();
}

// Decode counts into a column-major byte mask of `size` entries.
void rle_decode(const uint32_t* cnts, int m, uint8_t* mask_out, long size) {
  uint8_t v = 0;
  long p = 0;
  for (int j = 0; j < m; j++) {
    for (uint32_t k = 0; k < cnts[j] && p < size; k++) mask_out[p++] = v;
    v = !v;
  }
  while (p < size) mask_out[p++] = 0;
}

// Polygon (xy pairs, k points) -> RLE counts; returns m.
int rle_from_poly(const double* xy, int k, int h, int w, uint32_t* cnts_out) {
  auto cnts = from_poly(xy, k, h, w);
  std::copy(cnts.begin(), cnts.end(), cnts_out);
  return (int)cnts.size();
}

// Merge two RLEs (union if intersect==0); returns m.
int rle_merge2(const uint32_t* a, int ma, const uint32_t* b, int mb,
               int intersect, uint32_t* cnts_out) {
  vector<uint32_t> A(a, a + ma), B(b, b + mb);
  auto out = merge2(A, B, intersect != 0);
  std::copy(out.begin(), out.end(), cnts_out);
  return (int)out.size();
}

// Foreground area of an RLE.
long rle_area(const uint32_t* cnts, int m) {
  long area = 0;
  for (int j = 1; j < m; j += 2) area += cnts[j];
  return area;
}

// Tight bbox [x, y, w, h] of an RLE over an h-row mask.
void rle_to_bbox(const uint32_t* cnts, int m, int h, double* bb) {
  m = (m / 2) * 2;
  if (m == 0) { bb[0] = bb[1] = bb[2] = bb[3] = 0; return; }
  uint32_t xs = 0xffffffffu, ys = 0xffffffffu, xe = 0, ye = 0, cc = 0;
  for (int j = 0; j < m; j++) {
    cc += cnts[j];
    uint32_t t = cc - (j % 2);
    uint32_t y = t % h;
    uint32_t x = (t - y) / h;
    xs = std::min(xs, x); xe = std::max(xe, x);
    ys = std::min(ys, y); ye = std::max(ye, y);
  }
  bb[0] = xs; bb[2] = xe - xs + 1;
  bb[1] = ys; bb[3] = ye - ys + 1;
}

}  // extern "C"
