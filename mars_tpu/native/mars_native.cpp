// mars_native: exact host-side solvers for the TPU pipeline.
//
// The reference leans on third-party native code (SURVEY §2.4): POT's
// network-simplex EMD (ot.emd2), scipy's C++ Jonker-Volgenant assignment,
// and pycocotools' C RLE codec.  These are this framework's first-party
// equivalents — exact oracles for validating the device kernels (Sinkhorn
// EMD, auction assignment) and host fallbacks for serialization:
//
//   emd_uniform:      exact EMD with uniform marginals via successive
//                     shortest paths (integer-scaled supplies, Dijkstra
//                     with Johnson potentials)
//   lsa_maximize:     exact rectangular linear assignment (Jonker-Volgenant
//                     style shortest augmenting paths)
//   rle_encode/decode: COCO-style column-major RLE for host serialization
//
// Exposed with plain C linkage for ctypes.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

constexpr double INF = std::numeric_limits<double>::infinity();

}  // namespace

extern "C" {

// Exact EMD between uniform marginals over a dense t x c cost matrix.
// Solves the transportation problem with supplies c (integer, per row) and
// demands t (per column) — total flow t*c — and returns cost/(t*c), which
// equals ot.emd2(a=1/t, b=1/c, M).
double emd_uniform(const double* cost, int t, int c) {
  const int n = t + c + 2;       // source, rows, cols, sink
  const int S = 0, T = n - 1;
  // node supplies: every row node needs c units, every col node t units.
  std::vector<long long> row_left(t, c), col_left(c, t);
  std::vector<double> pot(n, 0.0);  // Johnson potentials
  std::vector<double> dist(n);
  std::vector<int> prev_node(n);
  // residual flows on row->col arcs (flow can be pushed back)
  std::vector<long long> flow(static_cast<size_t>(t) * c, 0);

  long long remaining = static_cast<long long>(t) * c;
  double total_cost = 0.0;

  // First potentials: one Bellman-Ford-ish relaxation suffices because all
  // arcs go S->row(0 cost), row->col(cost), col->T(0): dist(row)=0,
  // dist(col)=min_i cost, dist(T)=min over cols.
  for (int j = 0; j < c; ++j) {
    double m = INF;
    for (int i = 0; i < t; ++i) m = std::min(m, cost[i * c + j]);
    pot[1 + t + j] = m;
  }
  {
    double m = INF;
    for (int j = 0; j < c; ++j) m = std::min(m, pot[1 + t + j]);
    pot[T] = m;
  }

  while (remaining > 0) {
    // Dijkstra on reduced costs over the residual graph.
    std::fill(dist.begin(), dist.end(), INF);
    std::vector<bool> done(n, false);
    dist[S] = 0.0;
    prev_node[S] = -1;
    using QE = std::pair<double, int>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    pq.push({0.0, S});
    while (!pq.empty()) {
      auto [d, u] = pq.top();
      pq.pop();
      if (done[u]) continue;
      done[u] = true;
      if (u == S) {
        for (int i = 0; i < t; ++i) {
          if (row_left[i] > 0) {
            // reduced cost of the S->row arc (arc cost 0)
            double rc = 0.0 + pot[S] - pot[1 + i];
            if (rc < 0) rc = 0;  // numerical guard
            double nd = d + rc;
            if (nd < dist[1 + i]) {
              dist[1 + i] = nd;
              prev_node[1 + i] = S;
              pq.push({nd, 1 + i});
            }
          }
        }
      } else if (u >= 1 && u < 1 + t) {
        int i = u - 1;
        for (int j = 0; j < c; ++j) {
          double rc = cost[i * c + j] + pot[u] - pot[1 + t + j];
          double nd = d + std::max(rc, 0.0);  // clamp = numerical guard
          int v = 1 + t + j;
          if (nd < dist[v]) {
            dist[v] = nd;
            prev_node[v] = u;
            pq.push({nd, v});
          }
        }
      } else if (u >= 1 + t && u < 1 + t + c) {
        int j = u - 1 - t;
        // col -> sink
        if (col_left[j] > 0) {
          double rc = 0.0 + pot[u] - pot[T];
          double nd = d + std::max(rc, 0.0);
          if (nd < dist[T]) {
            dist[T] = nd;
            prev_node[T] = u;
            pq.push({nd, T});
          }
        }
        // col -> row back arcs (cancel existing flow)
        for (int i = 0; i < t; ++i) {
          if (flow[static_cast<size_t>(i) * c + j] > 0) {
            double rc = -cost[i * c + j] + pot[u] - pot[1 + i];
            double nd = d + std::max(rc, 0.0);  // clamp = numerical guard
            int v = 1 + i;
            if (nd < dist[v]) {
              dist[v] = nd;
              prev_node[v] = u;
              pq.push({nd, v});
            }
          }
        }
      }
    }
    if (dist[T] == INF) return -1.0;  // infeasible (should not happen)

    for (int u = 0; u < n; ++u)
      if (dist[u] < INF) pot[u] += dist[u];

    // find bottleneck along path
    long long push = remaining;
    for (int v = T; prev_node[v] != -1; v = prev_node[v]) {
      int u = prev_node[v];
      if (u == S) {
        push = std::min(push, row_left[v - 1]);
      } else if (u >= 1 && u < 1 + t && v >= 1 + t) {
        // forward row->col: unbounded capacity
      } else if (u >= 1 + t && v == T) {
        push = std::min(push, col_left[u - 1 - t]);
      } else if (u >= 1 + t && v >= 1 && v < 1 + t) {
        // back arc col->row: capacity = existing flow
        int j = u - 1 - t;
        int i = v - 1;
        push = std::min(push, flow[static_cast<size_t>(i) * c + j]);
      }
    }
    // apply
    for (int v = T; prev_node[v] != -1; v = prev_node[v]) {
      int u = prev_node[v];
      if (u == S) {
        row_left[v - 1] -= push;
      } else if (u >= 1 && u < 1 + t && v >= 1 + t && v < T) {
        int i = u - 1, j = v - 1 - t;
        flow[static_cast<size_t>(i) * c + j] += push;
        total_cost += push * cost[i * c + j];
      } else if (u >= 1 + t && v == T) {
        col_left[u - 1 - t] -= push;
      } else if (u >= 1 + t && v >= 1 && v < 1 + t) {
        int j = u - 1 - t, i = v - 1;
        flow[static_cast<size_t>(i) * c + j] -= push;
        total_cost -= push * cost[i * c + j];
      }
    }
    remaining -= push;
  }
  return total_cost / (static_cast<double>(t) * c);
}

// Exact rectangular assignment, maximize total score; t <= n.
// Shortest-augmenting-path (Jonker-Volgenant) on negated scores.
// out_cols[i] = assigned column of row i.
void lsa_maximize(const double* score, int t, int n, int* out_cols) {
  // convert to min-cost
  std::vector<double> u(t + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0);   // p[j] = row matched to column j (1-based)
  std::vector<int> way(n + 1, 0);
  for (int i = 1; i <= t; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, INF);
    std::vector<char> used(n + 1, false);
    do {
      used[j0] = true;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = -score[(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int i = 0; i < t; ++i) out_cols[i] = -1;
  for (int j = 1; j <= n; ++j)
    if (p[j] > 0) out_cols[p[j] - 1] = j - 1;
}

// COCO column-major RLE encode of a (h, w) {0,1} uint8 mask.
// Writes counts into out (caller-allocated, capacity h*w+1); returns count.
int rle_encode(const uint8_t* mask, int h, int w, uint32_t* out) {
  int n = 0;
  uint8_t cur = 0;
  uint32_t run = 0;
  for (int j = 0; j < w; ++j) {
    for (int i = 0; i < h; ++i) {
      uint8_t v = mask[i * w + j] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        out[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  out[n++] = run;
  return n;
}

// Decode counts back into a (h, w) mask.
void rle_decode(const uint32_t* counts, int n_counts, int h, int w, uint8_t* out) {
  long long pos = 0;
  uint8_t val = 0;
  for (int k = 0; k < n_counts; ++k) {
    for (uint32_t r = 0; r < counts[k]; ++r) {
      long long j = pos / h, i = pos % h;
      if (i < h && j < w) out[i * w + j] = val;
      ++pos;
    }
    val ^= 1;
  }
}

// pycocotools-compatible compressed RLE string codec (the COCO
// interchange format the reference serializes proposal dumps with via
// mask_utils.encode — segment_anything/utils/amg.py uses the uncompressed
// dict, but pycocotools consumers exchange the LEB128-style string).
//
// Format (COCO mask API spec): each count is difference-coded against the
// count two places earlier (from the 4th element on), then written as a
// little-endian base-32 signed varint — 5 payload bits per character,
// bit 0x20 = continuation, sign taken from bit 0x10 of the final chunk,
// each character offset by 48 into printable ASCII.
//
// Writes the NUL-terminated string into out (caller capacity >= 7*n + 1);
// returns the string length.
int rle_to_string(const uint32_t* counts, int n, char* out) {
  int p = 0;
  for (int i = 0; i < n; ++i) {
    long long x = static_cast<long long>(counts[i]);
    if (i > 2) x -= static_cast<long long>(counts[i - 2]);
    bool more = true;
    while (more) {
      char c = static_cast<char>(x & 0x1f);
      x >>= 5;  // arithmetic shift: sign propagates for negative deltas
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      out[p++] = static_cast<char>(c + 48);
    }
  }
  out[p] = '\0';
  return p;
}

// Parse a compressed RLE string of length len back into counts (caller
// capacity >= len); returns the number of counts.
int rle_from_string(const char* s, int len, uint32_t* out) {
  int n = 0, p = 0;
  while (p < len) {
    long long x = 0;
    int k = 0;
    bool more = true;
    char c = 0;
    while (more && p < len) {
      c = static_cast<char>(s[p] - 48);
      x |= static_cast<long long>(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
    }
    if (!more && (c & 0x10)) x |= -1LL << (5 * k);  // sign-extend
    if (n > 2) x += static_cast<long long>(out[n - 2]);
    out[n++] = static_cast<uint32_t>(x);
  }
  return n;
}

}  // extern "C"
