// Native k-nearest-neighbour mean squared distance (simple-knn parity).
//
// The reference's simple-knn CUDA submodule (SURVEY.md C20) computes each
// point's mean squared distance to its 3 nearest neighbours via a
// Morton-sorted spatial grid; it seeds the initial Gaussian scales
// (scene/gaussian_model.py:148). On TPU we use the MXU brute-force kernel
// (ops/knn.py); this C++ implementation is the host-side equivalent for
// CPU-only paths (dataset synthesis, morphology tooling) and as an
// independent cross-check of the TPU kernel.
//
// Algorithm: uniform grid hash sized to ~2 points/cell, then an expanding
// ring search per point until k neighbours are guaranteed exact
// (ring distance bound), parallelized over std::thread workers.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libwheat3dgs_knn.so knn.cpp -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Grid {
  float mins[3];
  float cell;          // cell edge length
  int dims[3];
  std::vector<int> cell_start;   // CSR offsets, dims^3 + 1
  std::vector<int> order;        // point ids sorted by cell
};

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

Grid build_grid(const float* pts, int n) {
  Grid g;
  float maxs[3];
  for (int d = 0; d < 3; ++d) { g.mins[d] = pts[d]; maxs[d] = pts[d]; }
  for (int i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      float v = pts[3 * i + d];
      if (v < g.mins[d]) g.mins[d] = v;
      if (v > maxs[d]) maxs[d] = v;
    }
  // ~2 points per cell on average.
  double vol = 1.0;
  for (int d = 0; d < 3; ++d)
    vol *= std::max(1e-9f, maxs[d] - g.mins[d]);
  g.cell = (float)std::cbrt(vol * 2.0 / std::max(1, n));
  if (!(g.cell > 0)) g.cell = 1.0f;
  for (int d = 0; d < 3; ++d) {
    g.dims[d] = std::max(1, (int)((maxs[d] - g.mins[d]) / g.cell) + 1);
    g.dims[d] = std::min(g.dims[d], 512);
  }
  // Recompute cell so the capped dims still cover the extent.
  for (int d = 0; d < 3; ++d)
    g.cell = std::max(g.cell, (maxs[d] - g.mins[d]) / g.dims[d] + 1e-9f);

  int num_cells = g.dims[0] * g.dims[1] * g.dims[2];
  std::vector<int> counts(num_cells + 1, 0);
  std::vector<int> cell_of(n);
  for (int i = 0; i < n; ++i) {
    int c[3];
    for (int d = 0; d < 3; ++d)
      c[d] = clampi((int)((pts[3 * i + d] - g.mins[d]) / g.cell), 0,
                    g.dims[d] - 1);
    cell_of[i] = (c[2] * g.dims[1] + c[1]) * g.dims[0] + c[0];
    counts[cell_of[i] + 1]++;
  }
  for (int c = 0; c < num_cells; ++c) counts[c + 1] += counts[c];
  g.cell_start = counts;
  g.order.resize(n);
  std::vector<int> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
  for (int i = 0; i < n; ++i) g.order[cursor[cell_of[i]]++] = i;
  return g;
}

}  // namespace

extern "C" {

// out[i] = mean squared distance from point i to its k nearest neighbours.
void knn_mean_sq_dist(const float* pts, int n, int k, float* out,
                      int n_threads) {
  if (n <= 1) { for (int i = 0; i < n; ++i) out[i] = 0.f; return; }
  k = std::min(k, n - 1);
  Grid grid = build_grid(pts, n);
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());

  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<float> best;
    for (;;) {
      int i = next.fetch_add(256);
      if (i >= n) break;
      int end = std::min(n, i + 256);
      for (int p = i; p < end; ++p) {
        const float* q = pts + 3 * p;
        int c[3];
        for (int d = 0; d < 3; ++d)
          c[d] = clampi((int)((q[d] - grid.mins[d]) / grid.cell), 0,
                        grid.dims[d] - 1);
        best.assign(k, INFINITY);
        float worst = INFINITY;
        int max_ring = std::max({grid.dims[0], grid.dims[1], grid.dims[2]});
        for (int ring = 0; ring <= max_ring; ++ring) {
          // Exactness: any point outside the visited box is at least
          // (ring-1)*cell away from q's cell, so once best-k is full and
          // worst < ((ring-1)*cell)^2 nothing farther can improve it.
          if (best[k - 1] != INFINITY && ring > 0) {
            float bound = (float)(ring - 1) * grid.cell;
            if (worst < bound * bound) break;
          }
          // Iterate the UNclamped shell (|coord - c| == ring on some axis),
          // skipping out-of-bounds cells — never revisits a cell, so no
          // neighbour is double-inserted into the best-k list.
          for (int dz = -ring; dz <= ring; ++dz) {
            int z = c[2] + dz;
            if (z < 0 || z >= grid.dims[2]) continue;
            bool z_face = (dz == -ring || dz == ring);
            for (int dy = -ring; dy <= ring; ++dy) {
              int y = c[1] + dy;
              if (y < 0 || y >= grid.dims[1]) continue;
              bool y_face = (dy == -ring || dy == ring);
              int xstep = (z_face || y_face) ? 1 : 2 * ring;
              if (xstep == 0) xstep = 1;
              for (int dx_ = -ring; dx_ <= ring; dx_ += xstep) {
                int x = c[0] + dx_;
                if (x < 0 || x >= grid.dims[0]) continue;
                int cell = (z * grid.dims[1] + y) * grid.dims[0] + x;
                for (int s = grid.cell_start[cell];
                     s < grid.cell_start[cell + 1]; ++s) {
                  int j = grid.order[s];
                  if (j == p) continue;
                  const float* r = pts + 3 * j;
                  float ddx = q[0] - r[0], ddy = q[1] - r[1],
                        ddz = q[2] - r[2];
                  float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                  if (d2 < best[k - 1]) {
                    int pos = k - 1;
                    while (pos > 0 && best[pos - 1] > d2) {
                      best[pos] = best[pos - 1];
                      --pos;
                    }
                    best[pos] = d2;
                    worst = best[k - 1];
                  }
                }
              }
            }
          }
        }
        float acc = 0.f;
        int cnt = 0;
        for (int s = 0; s < k; ++s)
          if (best[s] != INFINITY) { acc += best[s]; ++cnt; }
        out[p] = cnt ? acc / cnt : 0.f;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
