// arbih: native host-side runtime for the TPU acoustic-raytracing framework.
//
// The reference implements its spatial index, OBJ loading and ray queries in
// native (Zig) code. Here the equivalent host-side runtime is C++ exposed
// through a C ABI (loaded via ctypes): the BIH arena builder — the
// "graph builder" feeding the TPU's HBM-resident geometry arena — plus an
// OBJ triangle-soup parser and a brute-force Möller–Trumbore nearest-hit
// query used for host-side gameplay raycasts and as a second oracle.
//
// Build policy matches models/bih.py exactly (midpoint split on the largest
// centroid-bounds extent, stable partition, even-index fallback on
// degenerate splits, left_max/right_min interval bounds — in turn mirroring
// reference src/raytracer.zig:451-564), so the produced arenas are
// bit-identical to the NumPy builder's and interchangeable with it.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <numeric>
#include <string>
#include <vector>

namespace {

constexpr int32_t kLeaf = -1;

struct Builder {
  // prim arrays, reordered in place during the build
  std::vector<float> low;   // (n, 3)
  std::vector<float> high;  // (n, 3)
  std::vector<int32_t> values;
  // node arrays
  std::vector<int32_t> axis;
  std::vector<float> left_max;
  std::vector<float> right_min;
  std::vector<int32_t> left;
  std::vector<int32_t> right;
  std::vector<int32_t> leaf_start;
  std::vector<int32_t> leaf_count;
  int32_t max_leaf_size = 8;

  int32_t new_node() {
    axis.push_back(kLeaf);
    left_max.push_back(0.f);
    right_min.push_back(0.f);
    left.push_back(-1);
    right.push_back(-1);
    leaf_start.push_back(0);
    leaf_count.push_back(0);
    return static_cast<int32_t>(axis.size()) - 1;
  }

  void build(int32_t node, int32_t start, int32_t count, const float cb_low[3],
             const float cb_high[3]) {
    if (count <= max_leaf_size) {
      leaf_start[node] = start;
      leaf_count[node] = count;
      return;
    }
    float d[3] = {cb_high[0] - cb_low[0], cb_high[1] - cb_low[1],
                  cb_high[2] - cb_low[2]};
    int ax;
    if (d[0] > d[1] && d[0] > d[2]) ax = 0;
    else if (d[1] > d[2]) ax = 1;
    else ax = 2;
    float split = 0.5f * (cb_low[ax] + cb_high[ax]);

    std::vector<float> centers(count);
    for (int32_t i = 0; i < count; ++i) {
      centers[i] = 0.5f * (low[(start + i) * 3 + ax] + high[(start + i) * 3 + ax]);
    }
    std::vector<int32_t> perm;
    perm.reserve(count);
    for (int32_t i = 0; i < count; ++i)
      if (centers[i] < split) perm.push_back(i);
    int32_t n_left = static_cast<int32_t>(perm.size());
    if (n_left == 0 || n_left == count) {
      // degenerate: stable-sort by center, split evenly by index
      std::vector<int32_t> order(count);
      std::iota(order.begin(), order.end(), 0);
      std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
        return centers[a] < centers[b];
      });
      n_left = count / 2;
      std::vector<char> go_left(count, 0);
      for (int32_t i = 0; i < n_left; ++i) go_left[order[i]] = 1;
      perm.clear();
      for (int32_t i = 0; i < count; ++i)
        if (go_left[i]) perm.push_back(i);
      for (int32_t i = 0; i < count; ++i)
        if (!go_left[i]) perm.push_back(i);
    } else {
      for (int32_t i = 0; i < count; ++i)
        if (centers[i] >= split) perm.push_back(i);
    }

    // apply permutation to the prim range
    std::vector<float> tmpf(count * 3);
    for (int32_t i = 0; i < count; ++i)
      std::memcpy(&tmpf[i * 3], &low[(start + perm[i]) * 3], 12);
    std::memcpy(&low[start * 3], tmpf.data(), count * 12);
    for (int32_t i = 0; i < count; ++i)
      std::memcpy(&tmpf[i * 3], &high[(start + perm[i]) * 3], 12);
    std::memcpy(&high[start * 3], tmpf.data(), count * 12);
    std::vector<int32_t> tmpi(count);
    for (int32_t i = 0; i < count; ++i) tmpi[i] = values[start + perm[i]];
    std::memcpy(&values[start], tmpi.data(), count * 4);

    float lmax = -std::numeric_limits<float>::infinity();
    float rmin = std::numeric_limits<float>::infinity();
    float lcl[3], lch[3], rcl[3], rch[3];
    for (int k = 0; k < 3; ++k) {
      lcl[k] = rcl[k] = std::numeric_limits<float>::infinity();
      lch[k] = rch[k] = -std::numeric_limits<float>::infinity();
    }
    for (int32_t i = 0; i < count; ++i) {
      const float* lo = &low[(start + i) * 3];
      const float* hi = &high[(start + i) * 3];
      bool is_left = i < n_left;
      if (is_left) lmax = std::max(lmax, hi[ax]);
      else rmin = std::min(rmin, lo[ax]);
      for (int k = 0; k < 3; ++k) {
        float c = 0.5f * (lo[k] + hi[k]);
        if (is_left) {
          lcl[k] = std::min(lcl[k], c);
          lch[k] = std::max(lch[k], c);
        } else {
          rcl[k] = std::min(rcl[k], c);
          rch[k] = std::max(rch[k], c);
        }
      }
    }
    axis[node] = ax;
    left_max[node] = lmax;
    right_min[node] = rmin;
    int32_t ln = new_node();
    int32_t rn = new_node();
    left[node] = ln;
    right[node] = rn;
    build(ln, start, n_left, lcl, lch);
    build(rn, start + n_left, count - n_left, rcl, rch);
  }
};

}  // namespace

extern "C" {

// Builds the BIH. Outputs are written into caller-allocated buffers sized
// by a first call with query_sizes=1 (returns node count only).
// Returns the number of nodes, or -1 on error.
int32_t arbih_build(const float* aabb_low, const float* aabb_high,
                    const int32_t* values, int32_t n, int32_t max_leaf_size,
                    int32_t query_sizes,
                    // node outputs (capacity >= node count):
                    int32_t* out_axis, float* out_left_max, float* out_right_min,
                    int32_t* out_left, int32_t* out_right,
                    int32_t* out_leaf_start, int32_t* out_leaf_count,
                    // reordered prim outputs (size n):
                    float* out_low, float* out_high, int32_t* out_values) {
  if (n < 0) return -1;
  Builder b;
  b.max_leaf_size = max_leaf_size;
  b.low.assign(aabb_low, aabb_low + n * 3);
  b.high.assign(aabb_high, aabb_high + n * 3);
  b.values.assign(values, values + n);
  if (n > 0) {
    float cl[3], ch[3];
    for (int k = 0; k < 3; ++k) {
      cl[k] = std::numeric_limits<float>::infinity();
      ch[k] = -std::numeric_limits<float>::infinity();
    }
    for (int32_t i = 0; i < n; ++i) {
      for (int k = 0; k < 3; ++k) {
        float c = 0.5f * (b.low[i * 3 + k] + b.high[i * 3 + k]);
        cl[k] = std::min(cl[k], c);
        ch[k] = std::max(ch[k], c);
      }
    }
    int32_t root = b.new_node();
    b.build(root, 0, n, cl, ch);
  }
  int32_t n_nodes = static_cast<int32_t>(b.axis.size());
  if (query_sizes) return n_nodes;
  std::memcpy(out_axis, b.axis.data(), n_nodes * 4);
  std::memcpy(out_left_max, b.left_max.data(), n_nodes * 4);
  std::memcpy(out_right_min, b.right_min.data(), n_nodes * 4);
  std::memcpy(out_left, b.left.data(), n_nodes * 4);
  std::memcpy(out_right, b.right.data(), n_nodes * 4);
  std::memcpy(out_leaf_start, b.leaf_start.data(), n_nodes * 4);
  std::memcpy(out_leaf_count, b.leaf_count.data(), n_nodes * 4);
  std::memcpy(out_low, b.low.data(), size_t(n) * 12);
  std::memcpy(out_high, b.high.data(), size_t(n) * 12);
  std::memcpy(out_values, b.values.data(), size_t(n) * 4);
  return n_nodes;
}

// Brute-force Möller–Trumbore nearest hit for a batch of rays
// (main.zig:1041-1079 semantics: dir normalized, eps 1e-6). Host-side
// gameplay raycasts + differential oracle. tris: (T, 9) [v0 v1 v2].
// out_t: (R,) distance or +inf; out_idx: (R,) triangle index or -1.
void arbih_nearest_hit(const float* tris, int32_t n_tris, const float* origins,
                       const float* dirs, int32_t n_rays, float* out_t,
                       int32_t* out_idx) {
  const float eps = 1e-6f;
  for (int32_t r = 0; r < n_rays; ++r) {
    const float* o = &origins[r * 3];
    float d[3] = {dirs[r * 3], dirs[r * 3 + 1], dirs[r * 3 + 2]};
    float inv = 1.0f / std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    d[0] *= inv; d[1] *= inv; d[2] *= inv;
    float best = std::numeric_limits<float>::infinity();
    int32_t best_i = -1;
    for (int32_t i = 0; i < n_tris; ++i) {
      const float* a = &tris[i * 9];
      const float* bb = a + 3;
      const float* c = a + 6;
      float ab[3] = {bb[0] - a[0], bb[1] - a[1], bb[2] - a[2]};
      float ac[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
      float h[3] = {d[1] * ac[2] - d[2] * ac[1], d[2] * ac[0] - d[0] * ac[2],
                    d[0] * ac[1] - d[1] * ac[0]};
      float det = ab[0] * h[0] + ab[1] * h[1] + ab[2] * h[2];
      if (det > -eps && det < eps) continue;
      float f = 1.0f / det;
      float s[3] = {o[0] - a[0], o[1] - a[1], o[2] - a[2]};
      float u = f * (s[0] * h[0] + s[1] * h[1] + s[2] * h[2]);
      if (u < 0.0f || u > 1.0f) continue;
      float q[3] = {s[1] * ab[2] - s[2] * ab[1], s[2] * ab[0] - s[0] * ab[2],
                    s[0] * ab[1] - s[1] * ab[0]};
      float v = f * (d[0] * q[0] + d[1] * q[1] + d[2] * q[2]);
      if (v < 0.0f || u + v > 1.0f) continue;
      float t = f * (ac[0] * q[0] + ac[1] * q[1] + ac[2] * q[2]);
      if (t < eps) continue;
      if (t < best) {
        best = t;
        best_i = i;
      }
    }
    out_t[r] = best;
    out_idx[r] = best_i;
  }
}

// Minimal OBJ triangle-soup parser (v/vt/f v\/vt semantics of
// main.zig:320-388). First call with positions=null to get the triangle
// count; second call fills positions (T*9 floats). Returns T or -1.
int32_t arbih_parse_obj(const char* text, int64_t len, float* positions) {
  std::vector<float> verts;
  std::vector<int32_t> faces;  // vertex indices, 3 per triangle
  const char* p = text;
  const char* end = text + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    if (!nl) nl = end;
    if (nl - p >= 2 && p[0] == 'v' && p[1] == ' ') {
      float x, y, z;
      if (std::sscanf(p + 2, "%f %f %f", &x, &y, &z) == 3) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (nl - p >= 2 && p[0] == 'f' && p[1] == ' ') {
      int a, b, c, d, e, f;
      if (std::sscanf(p + 2, "%d/%d %d/%d %d/%d", &a, &b, &c, &d, &e, &f) == 6) {
        faces.push_back(a - 1);
        faces.push_back(c - 1);
        faces.push_back(e - 1);
      } else if (std::sscanf(p + 2, "%d %d %d", &a, &c, &e) == 3) {
        faces.push_back(a - 1);
        faces.push_back(c - 1);
        faces.push_back(e - 1);
      }
    }
    p = nl + 1;
  }
  int32_t n_tris = static_cast<int32_t>(faces.size() / 3);
  if (positions) {
    for (int32_t t = 0; t < n_tris; ++t) {
      for (int k = 0; k < 3; ++k) {
        int32_t vi = faces[t * 3 + k];
        std::memcpy(&positions[(t * 3 + k) * 3], &verts[vi * 3], 12);
      }
    }
  }
  return n_tris;
}

}  // extern "C"
