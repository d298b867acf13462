// moss_tpu native host library.
//
// TPU-native counterpart of the reference's host/native support code: the
// compute-path CUDA kernels became Pallas kernels (ops/rasterize_tpu.py), and
// this library provides the *host-side* native pieces a production framework
// needs around them:
//
//  1. rasterize_cpu: an exact sequential implementation of the reference
//     forward blend (submodules/diff-gaussian-rasterization/cuda_rasterizer/
//     forward.cu:261-383 semantics, incl. tile-rect cutoff, alpha clamp 0.99,
//     skip < 1/255, T < 1e-4 termination) — the fast CPU parity oracle for
//     kernel verification at scales where a python loop is infeasible
//     (BASELINE config 1: "CPU-runnable" reference path).
//
//  2. mean_knn3_dist2: mean squared distance to the 3 nearest neighbours via
//     a uniform grid hash — the host-side equivalent of simple-knn
//     (submodules/simple-knn/simple_knn.cu) used for initial Gaussian scales
//     when no accelerator is attached.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 1. exact CPU reference rasterizer (forward)
// ---------------------------------------------------------------------------
// mean2d (P,2), conic (P,3)[a,b,c], color (P,3), opacity (P), depth (P),
// radius (P) int32, valid (P) uint8. Outputs: out_color (H,W,3),
// out_depth/out_alpha/out_T (H,W).
void rasterize_cpu(const float* mean2d, const float* conic, const float* color,
                   const float* opacity, const float* depth,
                   const int32_t* radius, const uint8_t* valid, int P, int H,
                   int W, int tile_h, int tile_w, const float* bg,
                   float* out_color, float* out_depth, float* out_alpha,
                   float* out_T) {
  const float ALPHA_MAX = 0.99f;
  const float ALPHA_MIN = 1.0f / 255.0f;
  const float T_EPS = 1e-4f;

  // depth order over valid splats
  std::vector<int> order(P);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    float da = valid[a] ? depth[a] : INFINITY;
    float db = valid[b] ? depth[b] : INFINITY;
    return da < db;
  });

  const int grid_h = (H + tile_h - 1) / tile_h;
  const int grid_w = (W + tile_w - 1) / tile_w;
  const int n_tiles = grid_h * grid_w;

  // per-tile splat lists in depth order (the binning of rasterizer_impl.cu)
  std::vector<std::vector<int>> tiles(n_tiles);
  for (int oi = 0; oi < P; ++oi) {
    int g = order[oi];
    if (!valid[g] || radius[g] <= 0) continue;
    float x = mean2d[2 * g], y = mean2d[2 * g + 1];
    float r = (float)radius[g];
    int min_x = std::clamp((int)std::floor((x - r) / tile_w), 0, grid_w);
    int max_x = std::clamp((int)std::floor((x + r + tile_w - 1) / tile_w), 0, grid_w);
    int min_y = std::clamp((int)std::floor((y - r) / tile_h), 0, grid_h);
    int max_y = std::clamp((int)std::floor((y + r + tile_h - 1) / tile_h), 0, grid_h);
    for (int ty = min_y; ty < max_y; ++ty)
      for (int tx = min_x; tx < max_x; ++tx) tiles[ty * grid_w + tx].push_back(g);
  }

  for (int py = 0; py < H; ++py) {
    for (int px = 0; px < W; ++px) {
      int tid = (py / tile_h) * grid_w + (px / tile_w);
      float T = 1.0f, C0 = 0, C1 = 0, C2 = 0, D = 0, Wsum = 0;
      for (int g : tiles[tid]) {
        float dx = mean2d[2 * g] - (float)px;
        float dy = mean2d[2 * g + 1] - (float)py;
        float a = conic[3 * g], b = conic[3 * g + 1], c = conic[3 * g + 2];
        float power = -0.5f * (a * dx * dx + c * dy * dy) - b * dx * dy;
        if (power > 0.0f) continue;
        float alpha = std::min(ALPHA_MAX, opacity[g] * std::exp(power));
        if (alpha < ALPHA_MIN) continue;
        float test_T = T * (1.0f - alpha);
        if (test_T < T_EPS) break;
        float w = alpha * T;
        C0 += color[3 * g] * w;
        C1 += color[3 * g + 1] * w;
        C2 += color[3 * g + 2] * w;
        D += depth[g] * w;
        Wsum += w;
        T = test_T;
      }
      int pid = py * W + px;
      out_color[3 * pid] = C0 + T * bg[0];
      out_color[3 * pid + 1] = C1 + T * bg[1];
      out_color[3 * pid + 2] = C2 + T * bg[2];
      out_depth[pid] = D;
      out_alpha[pid] = Wsum;
      out_T[pid] = T;
    }
  }
}

// ---------------------------------------------------------------------------
// 2. mean squared distance to the 3 nearest neighbours (grid hash)
// ---------------------------------------------------------------------------
void mean_knn3_dist2(const float* pts, int N, float* out) {
  if (N <= 1) {
    for (int i = 0; i < N; ++i) out[i] = 0.f;
    return;
  }
  float mn[3] = {INFINITY, INFINITY, INFINITY};
  float mx[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (int i = 0; i < N; ++i)
    for (int d = 0; d < 3; ++d) {
      mn[d] = std::min(mn[d], pts[3 * i + d]);
      mx[d] = std::max(mx[d], pts[3 * i + d]);
    }
  float span = std::max({mx[0] - mn[0], mx[1] - mn[1], mx[2] - mn[2], 1e-9f});
  // aim for ~8 points per cell
  int res = std::max(1, (int)std::cbrt((double)N / 8.0));
  float cell = span / res + 1e-12f;
  int dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = std::max(1, (int)std::floor((mx[d] - mn[d]) / cell) + 1);
  auto cell_of = [&](const float* p, int d) {
    int c = (int)((p[d] - mn[d]) / cell);
    return std::clamp(c, 0, dims[d] - 1);
  };
  std::vector<std::vector<int>> buckets((size_t)dims[0] * dims[1] * dims[2]);
  auto bidx = [&](int x, int y, int z) {
    return ((size_t)x * dims[1] + y) * dims[2] + z;
  };
  for (int i = 0; i < N; ++i)
    buckets[bidx(cell_of(pts + 3 * i, 0), cell_of(pts + 3 * i, 1),
                 cell_of(pts + 3 * i, 2))].push_back(i);

  for (int i = 0; i < N; ++i) {
    const float* p = pts + 3 * i;
    int cx = cell_of(p, 0), cy = cell_of(p, 1), cz = cell_of(p, 2);
    float best[3] = {INFINITY, INFINITY, INFINITY};
    // expand rings until the 3rd-best distance is safely inside the ring
    for (int ring = 0; ring < std::max({dims[0], dims[1], dims[2]}); ++ring) {
      bool any_cell = false;
      for (int x = std::max(0, cx - ring); x <= std::min(dims[0] - 1, cx + ring); ++x)
        for (int y = std::max(0, cy - ring); y <= std::min(dims[1] - 1, cy + ring); ++y)
          for (int z = std::max(0, cz - ring); z <= std::min(dims[2] - 1, cz + ring); ++z) {
            if (std::max({std::abs(x - cx), std::abs(y - cy), std::abs(z - cz)}) != ring)
              continue;  // only the new shell
            any_cell = true;
            for (int j : buckets[bidx(x, y, z)]) {
              if (j == i) continue;
              float dx = p[0] - pts[3 * j], dy = p[1] - pts[3 * j + 1],
                    dz = p[2] - pts[3 * j + 2];
              float d2 = dx * dx + dy * dy + dz * dz;
              if (d2 < best[2]) {
                best[2] = d2;
                if (best[2] < best[1]) std::swap(best[1], best[2]);
                if (best[1] < best[0]) std::swap(best[0], best[1]);
              }
            }
          }
      float ring_dist = (float)ring * cell;  // guaranteed-covered radius
      if (best[2] < ring_dist * ring_dist || (!any_cell && ring > 0)) break;
    }
    float s = 0;
    int cnt = 0;
    for (int k = 0; k < 3; ++k)
      if (std::isfinite(best[k])) {
        s += best[k];
        ++cnt;
      }
    out[i] = cnt ? s / cnt : 0.f;
  }
}

}  // extern "C"
