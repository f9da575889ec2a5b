// Native host-side graph runtime for dgl_tpu.
//
// TPU-native equivalent of the C++ layer the reference suite exercises
// inside DGL (SURVEY §2.3): neighbor sampling (dgl.sampling.sample_neighbors),
// node-induced subgraph extraction with id compaction (dgl.node_subgraph),
// and graph partitioning (the METIS role). The Python layer
// (dgl_tpu/csrc/native.py) binds these via ctypes and falls back to NumPy
// when the shared object is unavailable.
//
// All functions are thread-parallel with OpenMP and operate on int64 CSR
// arrays owned by the caller (NumPy buffers).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// xorshift128+ per-thread RNG — fast, reproducible per (seed, thread chunk).
static inline uint64_t splitmix64(uint64_t &x) {
  uint64_t z = (x += 0x9e3779b97f4a7c15ull);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    uint64_t x = seed;
    s0 = splitmix64(x);
    s1 = splitmix64(x);
  }
  inline uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // unbiased-enough bounded draw (rejection-free multiply-shift)
  inline uint64_t bounded(uint64_t n) {
    return (uint64_t)(((__uint128_t)next() * n) >> 64);
  }
};

// Sample `fanout` in-neighbors (with replacement) for each seed.
// out: (n_seeds * fanout) neighbor ids; zero-degree seeds yield themselves.
void sample_neighbors(const int64_t *indptr, const int64_t *indices,
                      const int64_t *seeds, int64_t n_seeds, int64_t fanout,
                      uint64_t seed, int64_t *out) {
#pragma omp parallel
  {
#ifdef _OPENMP
    int tid = omp_get_thread_num();
#else
    int tid = 0;
#endif
    Rng rng(seed * 0x9e3779b97f4a7c15ull + (uint64_t)tid + 1);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n_seeds; ++i) {
      int64_t v = seeds[i];
      int64_t lo = indptr[v], hi = indptr[v + 1];
      int64_t deg = hi - lo;
      int64_t *dst = out + i * fanout;
      if (deg <= 0) {
        for (int64_t j = 0; j < fanout; ++j) dst[j] = v;
      } else {
        for (int64_t j = 0; j < fanout; ++j)
          dst[j] = indices[lo + (int64_t)rng.bounded((uint64_t)deg)];
      }
    }
  }
}

// Node-induced subgraph: edges (by-src CSR) with both endpoints in `nodes`,
// relabelled to positions in `nodes`. Returns edge count written.
// mapping: caller-provided scratch of size num_nodes (int64).
// out_src/out_dst must have room for the total out-degree of `nodes`.
// Deterministic: edges are emitted grouped by sub-node index (CSR order
// within each node) via a count → exclusive-scan → write scheme, so the
// output is bit-identical across runs and thread counts (seeded cluster
// batches stay reproducible).
int64_t node_subgraph(const int64_t *indptr, const int64_t *indices,
                      int64_t num_nodes, const int64_t *nodes,
                      int64_t n_sub, int64_t *mapping, uint8_t *present,
                      int64_t *out_src, int64_t *out_dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_sub; ++i) {
    present[nodes[i]] = 1;
    mapping[nodes[i]] = i;
  }
  // pass 1: kept-edge count per sub node
  int64_t *offs = new int64_t[n_sub + 1];
  offs[0] = 0;
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < n_sub; ++i) {
    int64_t u = nodes[i];
    int64_t c = 0;
    for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p)
      c += present[indices[p]];
    offs[i + 1] = c;
  }
  for (int64_t i = 0; i < n_sub; ++i) offs[i + 1] += offs[i];
  // pass 2: write at deterministic offsets
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < n_sub; ++i) {
    int64_t u = nodes[i];
    int64_t pos = offs[i];
    for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
      int64_t w = indices[p];
      if (present[w]) {
        out_src[pos] = i;
        out_dst[pos] = mapping[w];
        ++pos;
      }
    }
  }
  int64_t total = offs[n_sub];
  delete[] offs;
  // reset scratch for reuse
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_sub; ++i) present[nodes[i]] = 0;
  return total;
}

// Label-propagation partitioner (the METIS role): k seeds, iterative
// adoption over the edge list, then orphan round-robin. part: -1-initialized.
void partition_lp(const int64_t *src, const int64_t *dst, int64_t n_edges,
                  int64_t num_nodes, int64_t k, int64_t rounds, uint64_t seed,
                  int64_t *part) {
  Rng rng(seed + 1);
  for (int64_t i = 0; i < num_nodes; ++i) part[i] = -1;
  for (int64_t p = 0; p < k; ++p) {
    int64_t v = (int64_t)rng.bounded((uint64_t)num_nodes);
    if (part[v] < 0) part[v] = p;
  }
  for (int64_t r = 0; r < rounds; ++r) {
    std::atomic<int64_t> changed(0);
#pragma omp parallel for schedule(static)
    for (int64_t e = 0; e < n_edges; ++e) {
      int64_t s = src[e], d = dst[e];
      if (part[d] < 0 && part[s] >= 0) {
        part[d] = part[s];
        changed.fetch_add(1, std::memory_order_relaxed);
      } else if (part[s] < 0 && part[d] >= 0) {
        part[s] = part[d];
        changed.fetch_add(1, std::memory_order_relaxed);
      }
    }
    if (changed.load() == 0) break;
  }
  for (int64_t v = 0; v < num_nodes; ++v)
    if (part[v] < 0) part[v] = (int64_t)rng.bounded((uint64_t)k);
}

// Build CSR (indptr + permuted column array) from an edge list, sorted by
// `key` (counting sort — O(E), parallel histogram).
void build_csr(const int64_t *key, const int64_t *val, int64_t n_edges,
               int64_t num_nodes, int64_t *indptr, int64_t *out_val,
               int64_t *out_eid) {
  for (int64_t i = 0; i <= num_nodes; ++i) indptr[i] = 0;
  for (int64_t e = 0; e < n_edges; ++e) indptr[key[e] + 1]++;
  for (int64_t i = 0; i < num_nodes; ++i) indptr[i + 1] += indptr[i];
  // stable fill using a cursor copy
  int64_t *cursor = new int64_t[num_nodes];
  std::memcpy(cursor, indptr, num_nodes * sizeof(int64_t));
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t pos = cursor[key[e]]++;
    out_val[pos] = val[e];
    out_eid[pos] = e;
  }
  delete[] cursor;
}

}  // extern "C"
