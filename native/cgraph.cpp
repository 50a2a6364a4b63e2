// cgraph — native host-side graph construction kernels for cgcnet_tpu.
//
// TPU-native replacement for the reference's torch-cluster C++/CUDA
// radius_graph and NumPy FPS loops (SURVEY.md §2.3 P2, §2 C10): the input
// pipeline must build radius-bounded kNN graphs and farthest-point samples
// for ~5k-node patches per batch element per epoch, and for 100k+-node
// whole-slide graphs. A uniform grid hash makes radius search O(N·k) instead
// of O(N²).
//
// C ABI only (consumed via ctypes — no pybind11 in this image). All buffers
// are caller-allocated numpy arrays.
//
// Build: see native/build.sh (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Radius-bounded kNN over 2-D points: for each point, up to `k` nearest
// neighbours (self included, slot 0) within `radius`, ties by lower index.
// pos: [n,2] float32 (row-major). out_nbr: [n,k] int32 (pre-filled by caller
// or overwritten; invalid slots set to own index). out_mask: [n,k] float32.
// Returns 0 on success.
int radius_knn(const float* pos, int64_t n, float radius, int k,
               int32_t* out_nbr, float* out_mask) {
  if (n == 0) return 0;
  const float r2 = radius * radius;

  // bounding box + grid of cell size `radius`
  float minx = pos[0], miny = pos[1], maxx = pos[0], maxy = pos[1];
  for (int64_t i = 1; i < n; ++i) {
    minx = std::min(minx, pos[2 * i]);
    maxx = std::max(maxx, pos[2 * i]);
    miny = std::min(miny, pos[2 * i + 1]);
    maxy = std::max(maxy, pos[2 * i + 1]);
  }
  const float cell = radius > 0 ? radius : 1.0f;
  const int64_t gx = std::max<int64_t>(1, (int64_t)((maxx - minx) / cell) + 1);
  const int64_t gy = std::max<int64_t>(1, (int64_t)((maxy - miny) / cell) + 1);

  // counting-sort points into cells
  std::vector<int64_t> cell_of(n), count(gx * gy + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = (int64_t)((pos[2 * i] - minx) / cell);
    int64_t cy = (int64_t)((pos[2 * i + 1] - miny) / cell);
    cx = std::min(cx, gx - 1);
    cy = std::min(cy, gy - 1);
    cell_of[i] = cx * gy + cy;
    count[cell_of[i] + 1]++;
  }
  for (int64_t c = 0; c < gx * gy; ++c) count[c + 1] += count[c];
  std::vector<int64_t> bucket(n);
  {
    std::vector<int64_t> cursor(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < n; ++i) bucket[cursor[cell_of[i]]++] = i;
  }

  // per-point search over the 3x3 cell neighbourhood
  std::vector<std::pair<float, int64_t>> cand;
  for (int64_t i = 0; i < n; ++i) {
    cand.clear();
    const float xi = pos[2 * i], yi = pos[2 * i + 1];
    const int64_t cx = cell_of[i] / gy, cy = cell_of[i] % gy;
    for (int64_t dx = -1; dx <= 1; ++dx) {
      for (int64_t dy = -1; dy <= 1; ++dy) {
        const int64_t nx = cx + dx, ny = cy + dy;
        if (nx < 0 || nx >= gx || ny < 0 || ny >= gy) continue;
        const int64_t c = nx * gy + ny;
        for (int64_t b = count[c]; b < count[c + 1]; ++b) {
          const int64_t j = bucket[b];
          const float ddx = pos[2 * j] - xi, ddy = pos[2 * j + 1] - yi;
          const float d2 = ddx * ddx + ddy * ddy;
          if (d2 <= r2) cand.emplace_back(d2, j);
        }
      }
    }
    // nearest k, ties by lower index (self has d2=0, index i — the builder
    // in ops/knn.py guarantees self wins slot 0 the same way)
    const size_t kk = std::min<size_t>(k, cand.size());
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    for (int s = 0; s < k; ++s) {
      if ((size_t)s < kk) {
        out_nbr[i * k + s] = (int32_t)cand[s].second;
        out_mask[i * k + s] = 1.0f;
      } else {
        out_nbr[i * k + s] = (int32_t)i;
        out_mask[i * k + s] = 0.0f;
      }
    }
  }
  return 0;
}

// Greedy max-min farthest point sampling over coordinates.
// Matches the reference FarthestSampler semantics (common/utils.py:187-197):
// given `start`, repeatedly take argmax (first on ties) of the running
// min-distance. dist metric: squared euclidean (argmax identical to
// euclidean). out: [num_samples] int32.
int fps_coords(const float* pos, int64_t n, int64_t start, int64_t num_samples,
               int32_t* out) {
  if (n == 0 || num_samples == 0) return 0;
  std::vector<float> running(n);
  out[0] = (int32_t)start;
  for (int64_t j = 0; j < n; ++j) {
    const float dx = pos[2 * j] - pos[2 * start];
    const float dy = pos[2 * j + 1] - pos[2 * start + 1];
    running[j] = dx * dx + dy * dy;
  }
  for (int64_t s = 1; s < num_samples; ++s) {
    int64_t best = 0;
    float bestv = running[0];
    for (int64_t j = 1; j < n; ++j)
      if (running[j] > bestv) { bestv = running[j]; best = j; }
    out[s] = (int32_t)best;
    const float bx = pos[2 * best], by = pos[2 * best + 1];
    for (int64_t j = 0; j < n; ++j) {
      const float dx = pos[2 * j] - bx, dy = pos[2 * j + 1] - by;
      const float d2 = dx * dx + dy * dy;
      if (d2 < running[j]) running[j] = d2;
    }
  }
  return 0;
}

// FPS over a precomputed [n,n] distance table (exact reference parity for
// tables stored in any metric). out: [num_samples] int32.
int fps_table(const float* dist, int64_t n, int64_t start, int64_t num_samples,
              int32_t* out) {
  if (n == 0 || num_samples == 0) return 0;
  std::vector<float> running(dist + start * n, dist + (start + 1) * n);
  out[0] = (int32_t)start;
  for (int64_t s = 1; s < num_samples; ++s) {
    int64_t best = 0;
    float bestv = running[0];
    for (int64_t j = 1; j < n; ++j)
      if (running[j] > bestv) { bestv = running[j]; best = j; }
    out[s] = (int32_t)best;
    const float* row = dist + best * n;
    for (int64_t j = 0; j < n; ++j)
      if (row[j] < running[j]) running[j] = row[j];
  }
  return 0;
}

// Transpose a padded-ELL adjacency. Returns max in-degree, or -1 if it
// exceeds width_t. out_nbr_t prefilled with own row index by the caller.
int64_t transpose_ell(const int32_t* nbr, const float* mask, int64_t n, int k,
                      int width_t, int32_t* out_nbr_t, float* out_mask_t) {
  std::vector<int32_t> fill(n, 0);
  int64_t maxdeg = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int s = 0; s < k; ++s) {
      if (mask[i * k + s] <= 0) continue;
      const int32_t j = nbr[i * k + s];
      const int32_t c = fill[j]++;
      if (c >= width_t) return -1;
      out_nbr_t[(int64_t)j * width_t + c] = (int32_t)i;
      out_mask_t[(int64_t)j * width_t + c] = 1.0f;
      if (fill[j] > maxdeg) maxdeg = fill[j];
    }
  }
  return maxdeg;
}

// Full pairwise euclidean distance table (reference euc_dist,
// construct_feature_graph.py:17-24, but float32 and in-memory).
int distance_table(const float* pos, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i * n + i] = 0.0f;
    for (int64_t j = i + 1; j < n; ++j) {
      const float dx = pos[2 * i] - pos[2 * j];
      const float dy = pos[2 * i + 1] - pos[2 * j + 1];
      const float d = std::sqrt(dx * dx + dy * dy);
      out[i * n + j] = d;
      out[j * n + i] = d;
    }
  }
  return 0;
}

}  // extern "C"
