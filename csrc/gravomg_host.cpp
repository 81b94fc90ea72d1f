// Native host-side runtime for gravomg_tpu.
//
// Provides C-ABI implementations of the sequential reference-semantics
// algorithms (greedy disc sampling, multi-source Dijkstra) over the
// library's padded ELL graph layout, plus a fast OBJ loader.  Used as
//   * a fast golden oracle for large-scale compat verification (the
//     NumPy oracle in tests/oracle.py is exact but slow),
//   * the CPU baseline timing target for benchmarks (the reference repo
//     is a CPU C++ library of the same algorithms; see SURVEY.md §6),
//   * host-side IO for meshes too large for the Python path.
//
// Layout contract (matches gravomg_tpu.types.Graph):
//   neighbors: (V, K) int32 row-major, ascending per row, padding =
//              INT32_MAX; no self loops.
//   distances: (V, K) float64, +inf padding.
//
// Loaded via ctypes (gravomg_tpu/io/native.py); no pybind11 dependency.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

namespace {

constexpr int32_t kInvalid = INT32_MAX;

inline double dist3(const double* a, const double* b) {
    const double dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
    return std::sqrt(dx * dx + dy * dy + dz * dz);
}

}  // namespace

extern "C" {

// Greedy Poisson-disc sampling, reference C4 semantics
// (`/root/reference/src/sampling.cpp:7-53`): index-order scan, 1-hop
// rejection within radius, 2-hop rejection by summed hop distance.
// Returns the number of selected vertices (written to out_sel).
int64_t gmg_disc_sample(int64_t v, int32_t k, const int32_t* nbr,
                        const double* dist, double radius,
                        int32_t* out_sel) {
    std::vector<uint8_t> visited(v, 0);
    int64_t count = 0;
    for (int64_t i = 0; i < v; ++i) {
        if (visited[i]) continue;
        out_sel[count++] = static_cast<int32_t>(i);
        const int32_t* row = nbr + i * k;
        const double* drow = dist + i * k;
        for (int32_t a = 0; a < k; ++a) {
            const int32_t n1 = row[a];
            if (n1 == kInvalid) continue;
            const double d1 = drow[a];
            if (d1 < radius) {
                visited[n1] = 1;
                const int32_t* row2 = nbr + static_cast<int64_t>(n1) * k;
                const double* drow2 = dist + static_cast<int64_t>(n1) * k;
                for (int32_t b = 0; b < k; ++b) {
                    const int32_t n2 = row2[b];
                    if (n2 == kInvalid) continue;
                    if (d1 + drow2[b] < radius) visited[n2] = 1;
                }
            }
        }
    }
    return count;
}

// Multi-source Dijkstra, reference C6 semantics
// (`/root/reference/src/multigrid.cpp:77-125`): seeds at distance 0 with
// coarse-side parent ids, Euclidean relaxation from positions.  Uses the
// standard stale-entry skip (same fixpoint as the reference's
// skip-free loop; see SURVEY.md §2.1-C6).
void gmg_assign_parents(int64_t v, int32_t k, const int32_t* nbr,
                        const double* points, const int32_t* samples,
                        int64_t n_samples, int32_t* out_parent,
                        double* out_dist) {
    using Entry = std::pair<double, int64_t>;
    std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
    for (int64_t i = 0; i < v; ++i) {
        out_parent[i] = 0;
        out_dist[i] = std::numeric_limits<double>::infinity();
    }
    for (int64_t c = 0; c < n_samples; ++c) {
        const int64_t s = samples[c];
        out_parent[s] = static_cast<int32_t>(c);
        out_dist[s] = 0.0;
        heap.emplace(0.0, s);
    }
    while (!heap.empty()) {
        const auto [d, i] = heap.top();
        heap.pop();
        if (d > out_dist[i]) continue;
        const int32_t* row = nbr + i * k;
        const double* pi = points + i * 3;
        for (int32_t a = 0; a < k; ++a) {
            const int32_t n = row[a];
            if (n == kInvalid) continue;
            const double nd = d + dist3(pi, points + static_cast<int64_t>(n) * 3);
            if (nd < out_dist[n]) {
                out_parent[n] = out_parent[i];
                out_dist[n] = nd;
                heap.emplace(nd, n);
            }
        }
    }
}

// Mean edge length over valid ELL entries (reference C5 semantics,
// `/root/reference/src/multigrid.cpp:127-133`).
double gmg_average_edge_length(int64_t v, int32_t k, const int32_t* nbr,
                               const double* dist) {
    double total = 0.0;
    int64_t n = 0;
    for (int64_t i = 0; i < v * k; ++i) {
        if (nbr[i] != kInvalid) {
            total += dist[i];
            ++n;
        }
    }
    return n ? total / static_cast<double>(n) : 0.0;
}

// ELL SpMV (CPU baseline kernel): y = diag*x + sum_k off*x[nbr].
void gmg_ell_spmv(int64_t v, int32_t k, const int32_t* nbr,
                  const double* off, const double* diag, const double* x,
                  double* y) {
    for (int64_t i = 0; i < v; ++i) {
        double acc = diag[i] * x[i];
        const int32_t* row = nbr + i * k;
        const double* orow = off + i * k;
        for (int32_t a = 0; a < k; ++a) {
            const int32_t n = row[a];
            if (n != kInvalid) acc += orow[a] * x[n];
        }
        y[i] = acc;
    }
    }

// Minimal OBJ loader: vertices and triangle faces only.  Two-pass:
// first call with null outputs to get counts, then with buffers.
int64_t gmg_read_obj(const char* path, double* out_verts,
                     int32_t* out_faces, int64_t* out_nv, int64_t* out_nf) {
    FILE* fp = std::fopen(path, "r");
    if (!fp) return -1;
    char line[1024];
    int64_t nv = 0, nf = 0;
    while (std::fgets(line, sizeof line, fp)) {
        if (line[0] == 'v' && line[1] == ' ') {
            double x, y, z;
            if (std::sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
                if (out_verts) {
                    out_verts[nv * 3 + 0] = x;
                    out_verts[nv * 3 + 1] = y;
                    out_verts[nv * 3 + 2] = z;
                }
                ++nv;
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            long a, b, c;
            // accept "f a b c" and "f a/.. b/.. c/.."
            if (std::sscanf(line + 2, "%ld%*[^ ] %ld%*[^ ] %ld", &a, &b,
                            &c) == 3 ||
                std::sscanf(line + 2, "%ld %ld %ld", &a, &b, &c) == 3) {
                if (out_faces) {
                    out_faces[nf * 3 + 0] = static_cast<int32_t>(a - 1);
                    out_faces[nf * 3 + 1] = static_cast<int32_t>(b - 1);
                    out_faces[nf * 3 + 2] = static_cast<int32_t>(c - 1);
                }
                ++nf;
            }
        }
    }
    std::fclose(fp);
    *out_nv = nv;
    *out_nf = nf;
    return 0;
}

}  // extern "C"
