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
#include <limits>
#include <vector>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

extern "C" {

// forward declarations (build_patch composes these)
int radius_knn(const float* pos, int64_t n, float radius, int k,
               int32_t* out_nbr, float* out_mask);
int64_t sample_and_sort(const float* pos, int64_t n, int64_t num_sub,
                        int64_t far_num, int64_t start, uint64_t seed,
                        float band, int32_t* out_choice);
int64_t transpose_ell(const int32_t* nbr, const float* mask, int64_t n, int k,
                      int width_t, int32_t* out_nbr_t, float* out_mask_t);

// Radius-bounded kNN over 2-D points: for each point, up to `k` nearest
// neighbours (self included, slot 0) within `radius`, ties by lower index.
// pos: [n,2] float32 (row-major). out_nbr: [n,k] int32 (pre-filled by caller
// or overwritten; invalid slots set to own index). out_mask: [n,k] float32.
// Returns 0 on success.
//
// Grid of cell size `radius` (3x3 neighbourhood covers the ball) with each
// cell's points SORTED BY Y. The query's own cell is scanned first with a
// tight branch-light loop (d2 > bound is the only hot branch) to seed the
// k-list; each neighbour cell is then restricted to the y-window
// [yi - w, yi + w] with w = sqrt(current k-th best) via binary search, and
// skipped outright when the point-to-cell-box gap already exceeds the
// bound. On clumped data (nuclei clusters far denser than the patch
// average) the plain 3x3 scan evaluated every candidate of the clump; the
// window scan touches only the O(k) nearest per neighbour cell.
// Exactness: a candidate outside the window has d2 >= dy^2 > bound, so it
// can neither beat nor tie (ties need d2 == bound) the current k-th; while
// the list is not yet full the bound is radius^2 itself and the window is
// the full radius.
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

  // counting-sort points into cells; SoA copies in bucket order, then each
  // cell's slice sorted by y so the candidate scan is a contiguous window
  std::vector<int32_t> cell_of(n);
  std::vector<int32_t> count(gx * gy + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = (int64_t)((pos[2 * i] - minx) / cell);
    int64_t cy = (int64_t)((pos[2 * i + 1] - miny) / cell);
    cx = std::min(cx, gx - 1);
    cy = std::min(cy, gy - 1);
    cell_of[i] = (int32_t)(cx * gy + cy);
    count[cell_of[i] + 1]++;
  }
  for (int64_t c = 0; c < gx * gy; ++c) count[c + 1] += count[c];
  std::vector<int32_t> order(n);
  {
    std::vector<int32_t> cursor(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[cell_of[i]]++] = (int32_t)i;
  }
  for (int64_t c = 0; c < gx * gy; ++c)
    std::sort(order.begin() + count[c], order.begin() + count[c + 1],
              [&](int32_t a, int32_t b) {
                return pos[2 * a + 1] < pos[2 * b + 1];
              });
  std::vector<float> bxs(n), bys(n);
  for (int64_t b = 0; b < n; ++b) {
    bxs[b] = pos[2 * order[b]];
    bys[b] = pos[2 * order[b] + 1];
  }

  static const int8_t DX[9] = {0, 0, 0, -1, -1, -1, 1, 1, 1};
  static const int8_t DY[9] = {0, -1, 1, 0, -1, 1, 0, -1, 1};
  std::vector<float> bd(k);
  std::vector<int64_t> bj(k);
  for (int64_t i = 0; i < n; ++i) {
    int kk = 0;
    const float xi = pos[2 * i], yi = pos[2 * i + 1];
    const int64_t cx = cell_of[i] / gy, cy = cell_of[i] % gy;
    // query offsets inside its cell, for point-to-box gap bounds
    const float px = xi - (minx + cx * cell);
    const float py = yi - (miny + cy * cell);
    float bound = r2;
    for (int v = 0; v < 9; ++v) {
      const int64_t nx = cx + DX[v], ny = cy + DY[v];
      if (nx < 0 || nx >= gx || ny < 0 || ny >= gy) continue;
      const int64_t c = nx * gy + ny;
      int32_t b0 = count[c];
      const int32_t b1 = count[c + 1];
      if (b0 == b1) continue;
      if (v > 0) {
        // gap from the query point to the candidate cell box
        const float gpx = std::max(
            0.0f, DX[v] > 0 ? cell - px : (DX[v] < 0 ? px : 0.0f));
        const float gpy = std::max(
            0.0f, DY[v] > 0 ? cell - py : (DY[v] < 0 ? py : 0.0f));
        if (gpx * gpx + gpy * gpy > bound) continue;
      }
      // y-window from the current bound; +1 ulp so sqrt rounding can never
      // exclude a candidate with dy^2 == bound exactly. bound can be -1
      // when the self sentinel fills the k-th slot (k==1) — clamp before
      // sqrt or the NaN window defeats all pruning
      const float w = std::nextafter(
          std::sqrt(std::max(bound, 0.0f)),
          std::numeric_limits<float>::max());
      if (v > 0) {
        const float* ys = bys.data();
        b0 = (int32_t)(std::lower_bound(ys + b0, ys + b1, yi - w) - ys);
      }
      for (int32_t b = b0; b < b1; ++b) {
        const float dy = bys[b] - yi;
        if (dy > w) break;  // y-sorted: nothing closer follows
        const float ddx = bxs[b] - xi;
        const int64_t j = order[b];
        // self sorts strictly first even among coincident points (slot-0
        // self contract, matches ops/knn.py's -1 diagonal)
        const float d2 = j == i ? -1.0f : ddx * ddx + dy * dy;
        if (d2 > bound) continue;
        if (kk == k && d2 == bd[k - 1] && j > bj[k - 1]) continue;
        // insertion position: nearest first, ties by lower index (same
        // order as ops/knn.py's lexsort; self d2=0 wins slot 0)
        int p = kk < k ? kk : k - 1;
        while (p > 0 && (bd[p - 1] > d2 ||
                         (bd[p - 1] == d2 && bj[p - 1] > j))) {
          bd[p] = bd[p - 1];
          bj[p] = bj[p - 1];
          --p;
        }
        bd[p] = d2;
        bj[p] = j;
        if (kk < k) ++kk;
        if (kk == k) bound = bd[k - 1];
      }
    }
    for (int s = 0; s < k; ++s) {
      if (s < kk) {
        out_nbr[i * k + s] = (int32_t)bj[s];
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
// given `start`, repeatedly take argmax of the running min-distance.
// dist metric: squared euclidean (argmax identical to euclidean).
// out: [num_samples] int32 (original point indices).
//
// Implementation: exact greedy, restructured for speed — the naive loop
// (86 ms for 11404 -> 3991 samples, VERDICT round 1) cannot feed a ~15 ms
// train step. Points are counting-sorted into spatial grid cells; each
// sweep updates running = min(running, d2(best, .)) with AVX-512/AVX2
// min/max (exact ops — mul+add, no FMA) and rebuilds per-cell maxima, but
// SKIPS any cell whose bounding box is farther from `best` than its current
// maximum (no running value there can shrink, so the skip is lossless).
// Ties resolve by sorted order instead of input order — greedy FPS is
// otherwise unchanged, and the sort is deterministic.

namespace {

// fused min-update + max over [lo, hi): returns new max
inline float sweep_range(const float* px, const float* py, float* running,
                         int64_t lo, int64_t hi, float bx, float by,
                         bool seed) {
  float m = -1.0f;
  int64_t j = lo;
#if defined(__AVX512F__)
  const __m512 vbx = _mm512_set1_ps(bx), vby = _mm512_set1_ps(by);
  __m512 vm = _mm512_set1_ps(-1.0f);
  for (; j + 16 <= hi; j += 16) {
    const __m512 dx = _mm512_sub_ps(_mm512_loadu_ps(&px[j]), vbx);
    const __m512 dy = _mm512_sub_ps(_mm512_loadu_ps(&py[j]), vby);
    __m512 d2 = _mm512_add_ps(_mm512_mul_ps(dx, dx), _mm512_mul_ps(dy, dy));
    if (!seed) d2 = _mm512_min_ps(_mm512_loadu_ps(&running[j]), d2);
    _mm512_storeu_ps(&running[j], d2);
    vm = _mm512_max_ps(vm, d2);
  }
  m = std::max(m, _mm512_reduce_max_ps(vm));
#elif defined(__AVX2__)
  const __m256 vbx = _mm256_set1_ps(bx), vby = _mm256_set1_ps(by);
  __m256 vm = _mm256_set1_ps(-1.0f);
  for (; j + 8 <= hi; j += 8) {
    const __m256 dx = _mm256_sub_ps(_mm256_loadu_ps(&px[j]), vbx);
    const __m256 dy = _mm256_sub_ps(_mm256_loadu_ps(&py[j]), vby);
    __m256 d2 = _mm256_add_ps(_mm256_mul_ps(dx, dx), _mm256_mul_ps(dy, dy));
    if (!seed) d2 = _mm256_min_ps(_mm256_loadu_ps(&running[j]), d2);
    _mm256_storeu_ps(&running[j], d2);
    vm = _mm256_max_ps(vm, d2);
  }
  alignas(32) float mtmp[8];
  _mm256_store_ps(mtmp, vm);
  for (int t = 0; t < 8; ++t) m = std::max(m, mtmp[t]);
#endif
  for (; j < hi; ++j) {
    const float dx = px[j] - bx, dy = py[j] - by;
    float d2 = dx * dx + dy * dy;
    if (!seed) d2 = std::min(running[j], d2);
    running[j] = d2;
    m = std::max(m, d2);
  }
  return m;
}

}  // namespace

int fps_coords(const float* pos, int64_t n, int64_t start, int64_t num_samples,
               int32_t* out) {
  if (n == 0 || num_samples == 0) return 0;
  // ---- spatial cells (~256 points each) over the data bbox ----
  float minx = pos[0], maxx = pos[0], miny = pos[1], maxy = pos[1];
  for (int64_t i = 1; i < n; ++i) {
    minx = std::min(minx, pos[2 * i]);
    maxx = std::max(maxx, pos[2 * i]);
    miny = std::min(miny, pos[2 * i + 1]);
    maxy = std::max(maxy, pos[2 * i + 1]);
  }
  const float w = std::max(maxx - minx, 1e-6f), h = std::max(maxy - miny, 1e-6f);
  const int64_t ncell_target = std::max<int64_t>(1, n / 256);
  int64_t gx = std::max<int64_t>(
      1, (int64_t)std::lround(std::sqrt((double)ncell_target * w / h)));
  int64_t gy = std::max<int64_t>(1, (ncell_target + gx - 1) / gx);
  const int64_t nc = gx * gy;

  // counting sort into cells
  std::vector<int32_t> cell_of(n);
  std::vector<int64_t> cstart(nc + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = (int64_t)((pos[2 * i] - minx) / w * gx);
    int64_t cy = (int64_t)((pos[2 * i + 1] - miny) / h * gy);
    cx = std::min(cx, gx - 1);
    cy = std::min(cy, gy - 1);
    cell_of[i] = (int32_t)(cx * gy + cy);
    cstart[cell_of[i] + 1]++;
  }
  for (int64_t c = 0; c < nc; ++c) cstart[c + 1] += cstart[c];
  std::vector<int32_t> perm(n);
  std::vector<float> px(n), py(n);
  {
    std::vector<int64_t> cur(cstart.begin(), cstart.end() - 1);
    for (int64_t i = 0; i < n; ++i) {
      const int64_t p = cur[cell_of[i]]++;
      perm[p] = (int32_t)i;
      px[p] = pos[2 * i];
      py[p] = pos[2 * i + 1];
    }
  }
  // per-cell bounding boxes
  std::vector<float> bminx(nc), bmaxx(nc), bminy(nc), bmaxy(nc);
  for (int64_t c = 0; c < nc; ++c) {
    float mnx = 3.4e38f, mxx = -3.4e38f, mny = 3.4e38f, mxy = -3.4e38f;
    for (int64_t j = cstart[c]; j < cstart[c + 1]; ++j) {
      mnx = std::min(mnx, px[j]);
      mxx = std::max(mxx, px[j]);
      mny = std::min(mny, py[j]);
      mxy = std::max(mxy, py[j]);
    }
    bminx[c] = mnx; bmaxx[c] = mxx; bminy[c] = mny; bmaxy[c] = mxy;
  }

  std::vector<float> running(n), cellmax(nc, -1.0f);
  const float sx = pos[2 * start], sy = pos[2 * start + 1];
  out[0] = (int32_t)start;
  for (int64_t c = 0; c < nc; ++c)
    cellmax[c] = sweep_range(px.data(), py.data(), running.data(), cstart[c],
                             cstart[c + 1], sx, sy, /*seed=*/true);

  for (int64_t s = 1; s < num_samples; ++s) {
    float bestv = cellmax[0];
    for (int64_t c = 1; c < nc; ++c) bestv = std::max(bestv, cellmax[c]);
    int64_t best = -1;
    for (int64_t c = 0; c < nc && best < 0; ++c) {
      if (cellmax[c] == bestv) {
        for (int64_t j = cstart[c]; j < cstart[c + 1]; ++j)
          if (running[j] == bestv) { best = j; break; }
      }
    }
    out[s] = perm[best];
    const float bx = px[best], by = py[best];
    for (int64_t c = 0; c < nc; ++c) {
      if (cellmax[c] < 0) continue;  // empty cell
      // min squared distance from best to the cell bbox: if it cannot beat
      // the cell maximum, no running value there changes — skip (lossless)
      const float ddx =
          bx < bminx[c] ? bminx[c] - bx : (bx > bmaxx[c] ? bx - bmaxx[c] : 0.f);
      const float ddy =
          by < bminy[c] ? bminy[c] - by : (by > bmaxy[c] ? by - bmaxy[c] : 0.f);
      if (ddx * ddx + ddy * ddy >= cellmax[c]) continue;
      cellmax[c] = sweep_range(px.data(), py.data(), running.data(),
                               cstart[c], cstart[c + 1], bx, by, false);
    }
  }
  return 0;
}

// Fused node subsampling + spatial band sort — one GIL-free call for the
// loader's hottest per-item path (reference fuse sampling semantics,
// dataflow/data.py:211-219: far_num FPS picks + uniform remainder).
//
// far_num greedy-FPS picks from `start`; num_sub - far_num uniform picks
// (without replacement) from the complement via a partial Fisher-Yates on a
// splitmix64 stream seeded by `seed`; the combined index set is then sorted
// by (floor(x / band), y) — the band-limited order the BSR kernel needs.
// far_num = num_sub -> pure farthest sampling; far_num = 0 -> pure random.
// out_choice: [num_sub] int32 (original indices, spatially sorted).
// Returns the number of indices written.
int64_t sample_and_sort(const float* pos, int64_t n, int64_t num_sub,
                        int64_t far_num, int64_t start, uint64_t seed,
                        float band, int32_t* out_choice) {
  if (n == 0 || num_sub == 0) return 0;
  num_sub = std::min(num_sub, n);
  far_num = std::min(far_num, num_sub);
  if (far_num > 0) fps_coords(pos, n, start, far_num, out_choice);
  std::vector<uint8_t> sel(n, 0);
  for (int64_t i = 0; i < far_num; ++i) sel[out_choice[i]] = 1;
  std::vector<int32_t> rem;
  rem.reserve(n - far_num);
  for (int64_t j = 0; j < n; ++j)
    if (!sel[j]) rem.push_back((int32_t)j);
  const int64_t need =
      std::min<int64_t>(num_sub - far_num, (int64_t)rem.size());
  uint64_t st = seed;
  auto next = [&st]() {
    st += 0x9E3779B97F4A7C15ull;
    uint64_t z = st;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  for (int64_t i = 0; i < need; ++i) {
    const int64_t j = i + (int64_t)(next() % (uint64_t)(rem.size() - i));
    std::swap(rem[i], rem[j]);
    out_choice[far_num + i] = rem[i];
  }
  const int64_t total = far_num + need;
  // spatial band sort: primary floor(x/band), secondary y (ties stable)
  const float b = band > 0 ? band : 1.0f;
  std::stable_sort(out_choice, out_choice + total,
                   [&](int32_t a, int32_t c) {
                     const float ba = std::floor(pos[2 * a] / b);
                     const float bc = std::floor(pos[2 * c] / b);
                     if (ba != bc) return ba < bc;
                     return pos[2 * a + 1] < pos[2 * c + 1];
                   });
  return total;
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

// One-call patch builder — the loader's whole per-item pipeline without
// touching the GIL once: (optional) fuse/farthest/random subsample OR
// replayed choice, spatial band sort, per-node feature gather + z-score,
// radius-kNN, ELL transpose, and capacity padding, all written straight
// into caller-provided (batch-buffer) arrays.
//
// feats [n, fdim] (fdim appearance dims), coords [n, 2].
// choice_in: optional pre-sampled indices (use_fixed replay); NULL samples.
// num_sub >= n means keep the whole patch (still band-sorted).
// feat_mode: 0 = appearance++coords ('ca'), 1 = appearance ('a'),
//            2 = coords ('c'); mean/stdv are [f_out] for the sliced set.
// Outputs (cap rows each): out_x [cap, f_out], out_nbr/out_mask [cap, k],
// out_nbr_t/out_mask_t [cap, kt_cap]. Rows past the real count carry
// self-indices / zeros.
// Returns the real node count, or -1 if the transpose width overflows
// (caller falls back to the numpy path).
int64_t build_patch(
    const float* feats, const float* coords, int64_t n, int fdim,
    const int32_t* choice_in, int64_t choice_len,
    int64_t num_sub, int64_t far_num, int64_t start, uint64_t seed,
    float band, float radius, int k, int kt_cap, int feat_mode,
    const float* mean, const float* stdv, int64_t cap,
    float* out_x, int32_t* out_nbr, float* out_mask,
    int32_t* out_nbr_t, float* out_mask_t) {
  const float bnd = band > 0 ? band : 1.0f;
  auto band_less = [&](int32_t a, int32_t c) {
    const float ba = std::floor(coords[2 * a] / bnd);
    const float bc = std::floor(coords[2 * c] / bnd);
    if (ba != bc) return ba < bc;
    return coords[2 * a + 1] < coords[2 * c + 1];
  };
  std::vector<int32_t> choice;
  if (choice_in != nullptr) {
    const int64_t m0 = std::min(choice_len, cap);
    choice.assign(choice_in, choice_in + m0);
    std::stable_sort(choice.begin(), choice.end(), band_less);
  } else if (num_sub >= n) {
    choice.resize(std::min(n, cap));
    for (size_t i = 0; i < choice.size(); ++i) choice[i] = (int32_t)i;
    std::stable_sort(choice.begin(), choice.end(), band_less);
  } else {
    choice.resize(std::min(num_sub, cap));
    const int64_t total = sample_and_sort(
        coords, n, (int64_t)choice.size(), far_num, start, seed, band,
        choice.data());
    choice.resize(total);
  }
  const int64_t m = (int64_t)choice.size();
  const int f_out = feat_mode == 0 ? fdim + 2 : (feat_mode == 1 ? fdim : 2);

  // features: gather + z-score
  for (int64_t i = 0; i < m; ++i) {
    const int64_t src = choice[i];
    float* row = out_x + i * f_out;
    if (feat_mode == 2) {
      row[0] = (coords[2 * src] - mean[0]) / stdv[0];
      row[1] = (coords[2 * src + 1] - mean[1]) / stdv[1];
    } else {
      const float* fr = feats + src * fdim;
      for (int j = 0; j < fdim; ++j) row[j] = (fr[j] - mean[j]) / stdv[j];
      if (feat_mode == 0) {
        row[fdim] = (coords[2 * src] - mean[fdim]) / stdv[fdim];
        row[fdim + 1] = (coords[2 * src + 1] - mean[fdim + 1]) / stdv[fdim + 1];
      }
    }
  }
  std::memset(out_x + m * f_out, 0, sizeof(float) * (cap - m) * f_out);

  // sampled coordinates + radius kNN (writes the first m rows)
  std::vector<float> sc(2 * m);
  for (int64_t i = 0; i < m; ++i) {
    sc[2 * i] = coords[2 * choice[i]];
    sc[2 * i + 1] = coords[2 * choice[i] + 1];
  }
  radius_knn(sc.data(), m, radius, k, out_nbr, out_mask);
  for (int64_t i = m; i < cap; ++i)
    for (int s = 0; s < k; ++s) {
      out_nbr[i * k + s] = (int32_t)i;
      out_mask[i * k + s] = 0.0f;
    }

  // transpose (self-pattern prefill over all cap rows)
  for (int64_t i = 0; i < cap; ++i)
    for (int s = 0; s < kt_cap; ++s) {
      out_nbr_t[i * kt_cap + s] = (int32_t)i;
      out_mask_t[i * kt_cap + s] = 0.0f;
    }
  const int64_t md =
      transpose_ell(out_nbr, out_mask, m, k, kt_cap, out_nbr_t, out_mask_t);
  if (md < 0) return -1;
  return m;
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

// Local Shannon entropy (bits) of the grey-level histogram in a disk
// neighbourhood, reflect border — skimage.filters.rank.entropy semantics
// (the offline feature stage's bottleneck: 256 full-image convolutions in
// the numpy fallback take ~75 s on a 3584^2 tile; this sliding-histogram
// pass with an incremental sum(c*log2 c) accumulator is O(H*W*diameter)).
// gray: [h,w] uint8. out: [h,w] float32. Returns 0.
int local_entropy_u8(const uint8_t* gray, int64_t h, int64_t w, int radius,
                     float* out) {
  const int r = radius;
  const int64_t ph = h + 2 * r, pw = w + 2 * r;
  std::vector<uint8_t> pad(ph * pw);
  auto reflect = [](int64_t i, int64_t n) {
    // cv2 BORDER_REFLECT / scipy 'reflect' (edge duplicated):
    // -1 -> 0, -2 -> 1, n -> n-1
    while (i < 0 || i >= n) {
      if (i < 0) i = -i - 1;
      if (i >= n) i = 2 * n - 1 - i;
    }
    return i;
  };
  for (int64_t y = 0; y < ph; ++y) {
    const uint8_t* srow = gray + reflect(y - r, h) * w;
    uint8_t* drow = pad.data() + y * pw;
    for (int64_t x = 0; x < pw; ++x) drow[x] = srow[reflect(x - r, w)];
  }
  // disk half-widths per dy and total area
  std::vector<int> hw(2 * r + 1);
  int64_t area = 0;
  for (int dy = -r; dy <= r; ++dy) {
    int m = 0;
    while ((m + 1) * (m + 1) + dy * dy <= r * r) ++m;
    hw[dy + r] = m;
    area += 2 * m + 1;
  }
  // c*log2(c) table and per-count entropy lookup
  std::vector<double> tab(area + 1, 0.0);
  for (int64_t c = 1; c <= area; ++c) tab[c] = (double)c * std::log2((double)c);
  const double log2a = std::log2((double)area);

  std::vector<int> hist(256);
  for (int64_t y = 0; y < h; ++y) {
    std::fill(hist.begin(), hist.end(), 0);
    double s = 0.0;
    const int64_t py = y + r;
    // build window at x=0
    for (int dy = -r; dy <= r; ++dy) {
      const uint8_t* row = pad.data() + (py + dy) * pw;
      for (int dx = -hw[dy + r]; dx <= hw[dy + r]; ++dx) {
        const int c = ++hist[row[r + dx]];
        s += tab[c] - tab[c - 1];
      }
    }
    out[y * w] = (float)(log2a - s / (double)area);
    for (int64_t x = 1; x < w; ++x) {
      const int64_t px = x + r;
      for (int dy = -r; dy <= r; ++dy) {
        const uint8_t* row = pad.data() + (py + dy) * pw;
        const int m = hw[dy + r];
        int c = --hist[row[px - 1 - m]];
        s += tab[c] - tab[c + 1];
        c = ++hist[row[px + m]];
        s += tab[c] - tab[c - 1];
      }
      out[y * w + x] = (float)(log2a - s / (double)area);
    }
  }
  return 0;
}

// Per-row-tile nonzero block-column lists for the BSR Pallas kernel
// (native twin of cgcnet_tpu.ops.pallas.bsr_kernel.bsr_block_meta: sorted
// unique column tiles touched by each 128-row tile). Returns the max blocks
// needed by any row tile; fills out_cols [R, max_blocks] int32 / out_mask
// [R, max_blocks] float32 (caller-zeroed) only for tiles that fit —
// if the return value exceeds max_blocks the outputs are partial and the
// caller must fall back. Pass max_blocks=0 (null outs ok) to just measure.
int64_t bsr_block_meta(const int32_t* nbr, const float* mask, int64_t n,
                       int k, int tile, int max_blocks, int32_t* out_cols,
                       float* out_mask) {
  const int64_t r = (n + tile - 1) / tile;
  const int64_t nct = r;  // column tiles == row tiles (square adjacency)
  std::vector<uint8_t> seen(nct);
  std::vector<int32_t> cols;
  int64_t worst = 0;
  for (int64_t ri = 0; ri < r; ++ri) {
    std::fill(seen.begin(), seen.end(), 0);
    cols.clear();
    const int64_t lo = ri * tile, hi = std::min(n, lo + tile);
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t base = i * k;
      for (int s = 0; s < k; ++s) {
        if (mask[base + s] <= 0) continue;
        const int32_t c = nbr[base + s] / tile;
        if (!seen[c]) {
          seen[c] = 1;
          cols.push_back(c);
        }
      }
    }
    worst = std::max<int64_t>(worst, (int64_t)cols.size());
    if (max_blocks > 0 && (int64_t)cols.size() <= max_blocks) {
      std::sort(cols.begin(), cols.end());
      for (size_t s = 0; s < cols.size(); ++s) {
        out_cols[ri * max_blocks + (int64_t)s] = cols[s];
        out_mask[ri * max_blocks + (int64_t)s] = 1.0f;
      }
    }
  }
  return worst;
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
