// Measured single-core CPU baseline for BASELINE.md.
//
// The reference engine (jacketsj/expANN) cannot be compiled in-image (its
// Eigen/pybind11 submodules are empty and Conan has no network), so the
// baseline denominator is MEASURED here instead: a from-scratch, single-core
// re-implementation of the reference's serving loop — greedy upper-layer
// descent (reference: src/antitopo_engine.h:854-903) followed by the
// bottom-layer best-first beam search with an ef-capped result heap
// (src/antitopo_engine.h:497-688) and the plain L2^2 distance kernel
// (src/distance.h:86-111, autovectorized here with -O3 -march=native) —
// run over the exact graph exported by tools/export_baseline.py.
//
// Build:  make baseline   (native/Makefile)
// Run:    ./baseline_search /tmp/baseline_56k.bin 22,45,90,180 [passes]
//         (arg 2 = comma-separated ef values; prints one JSON line per ef)

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <string>
#include <vector>

namespace {

struct Layer {
  int rows, ru;
  std::vector<int32_t> slot;  // (n+1) global id -> row
  std::vector<int32_t> adj;   // rows * ru, global ids, sentinel n
};

struct Blob {
  int n, d, r0, num_layers, sv, m, k;
  std::vector<float> vectors;      // (n+1) * d
  std::vector<int32_t> adj_bottom; // (n+1) * r0
  std::vector<Layer> layers;       // topmost first
  std::vector<float> queries;      // m * d
  std::vector<int32_t> gt;         // m * k
};

bool read_exact(FILE* f, void* dst, size_t bytes) {
  return fread(dst, 1, bytes, f) == bytes;
}

Blob load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  int32_t hdr[8];
  if (!read_exact(f, hdr, sizeof hdr) || hdr[0] != 0x45584142) {
    fprintf(stderr, "bad blob header\n"); exit(1);
  }
  Blob b;
  b.n = hdr[1]; b.d = hdr[2]; b.r0 = hdr[3]; b.num_layers = hdr[4];
  b.sv = hdr[5]; b.m = hdr[6]; b.k = hdr[7];
  b.vectors.resize(size_t(b.n + 1) * b.d);
  b.adj_bottom.resize(size_t(b.n + 1) * b.r0);
  if (!read_exact(f, b.vectors.data(), b.vectors.size() * 4) ||
      !read_exact(f, b.adj_bottom.data(), b.adj_bottom.size() * 4)) {
    fprintf(stderr, "truncated blob (graph)\n"); exit(1);
  }
  for (int i = 0; i < b.num_layers; ++i) {
    int32_t lh[2];
    if (!read_exact(f, lh, sizeof lh)) { fprintf(stderr, "bad layer\n"); exit(1); }
    Layer L;
    L.rows = lh[0]; L.ru = lh[1];
    L.slot.resize(b.n + 1);
    L.adj.resize(size_t(L.rows) * L.ru);
    if (!read_exact(f, L.slot.data(), L.slot.size() * 4) ||
        !read_exact(f, L.adj.data(), L.adj.size() * 4)) {
      fprintf(stderr, "truncated blob (layer)\n"); exit(1);
    }
    b.layers.push_back(std::move(L));
  }
  b.queries.resize(size_t(b.m) * b.d);
  b.gt.resize(size_t(b.m) * b.k);
  if (!read_exact(f, b.queries.data(), b.queries.size() * 4) ||
      !read_exact(f, b.gt.data(), b.gt.size() * 4)) {
    fprintf(stderr, "truncated blob (queries)\n"); exit(1);
  }
  fclose(f);
  return b;
}

// L2^2 over d floats; d is 128 on every exported blob, which the compiler
// sees via the specialized call below and fully vectorizes.
template <int D>
float l2sq_fixed(const float* __restrict a, const float* __restrict b) {
  float acc = 0.f;
  for (int i = 0; i < D; ++i) { float t = a[i] - b[i]; acc += t * t; }
  return acc;
}

float l2sq_var(const float* __restrict a, const float* __restrict b, int d) {
  float acc = 0.f;
  for (int i = 0; i < d; ++i) { float t = a[i] - b[i]; acc += t * t; }
  return acc;
}

struct Searcher {
  const Blob& b;
  std::vector<uint32_t> stamp;  // visited marks, epoch-tagged (no clears)
  uint32_t epoch = 0;
  int64_t distcomps = 0;

  explicit Searcher(const Blob& blob) : b(blob), stamp(blob.n + 1, 0) {}

  inline const float* vec(int id) const {
    return b.vectors.data() + size_t(id) * b.d;
  }
  inline float dist(const float* q, int id) {
    ++distcomps;
    return b.d == 128 ? l2sq_fixed<128>(q, vec(id))
                      : l2sq_var(q, vec(id), b.d);
  }

  // Greedy hill-climb over the upper layers, topmost first
  // (reference: src/antitopo_engine.h:878-893).
  int descend(const float* q) {
    int ep = b.sv;
    float ep_d = dist(q, ep);
    for (const Layer& L : b.layers) {
      bool changed = true;
      while (changed) {
        changed = false;
        int row = L.slot[ep];
        const int32_t* nbrs = L.adj.data() + size_t(row) * L.ru;
        for (int j = 0; j < L.ru; ++j) {
          int nb = nbrs[j];
          if (nb == b.n) continue;  // sentinel padding
          float nd = dist(q, nb);
          if (nd < ep_d) { ep = nb; ep_d = nd; changed = true; }
        }
      }
    }
    return ep;
  }

  // Bottom-layer best-first beam search, ef-capped result heap
  // (reference: src/antitopo_engine.h:497-688). Writes the k nearest ids
  // (ascending distance) into out.
  void search(const float* q, int ef, int k, int32_t* out) {
    using P = std::pair<float, int>;
    ++epoch;
    int ep = descend(q);
    float ep_d = dist(q, ep);
    stamp[ep] = epoch;

    std::priority_queue<P, std::vector<P>, std::greater<P>> cand;  // min-heap
    std::priority_queue<P> nearest;                                // max-heap
    cand.emplace(ep_d, ep);
    nearest.emplace(ep_d, ep);

    std::vector<int> fresh;
    fresh.reserve(b.r0);
    while (!cand.empty()) {
      P cur = cand.top();
      cand.pop();
      if ((int)nearest.size() == ef && cur.first > nearest.top().first) break;
      const int32_t* nbrs = b.adj_bottom.data() + size_t(cur.second) * b.r0;
      fresh.clear();
      for (int j = 0; j < b.r0; ++j) {
        int nb = nbrs[j];
        if (nb == b.n || stamp[nb] == epoch) continue;
        stamp[nb] = epoch;
        __builtin_prefetch(vec(nb));
        fresh.push_back(nb);
      }
      for (int nb : fresh) {
        float nd = dist(q, nb);
        if ((int)nearest.size() < ef || nd < nearest.top().first) {
          cand.emplace(nd, nb);
          nearest.emplace(nd, nb);
          if ((int)nearest.size() > ef) nearest.pop();
        }
      }
    }
    std::vector<P> res(nearest.size());
    for (int i = (int)res.size() - 1; i >= 0; --i) {
      res[i] = nearest.top();
      nearest.pop();
    }
    for (int i = 0; i < k; ++i) out[i] = i < (int)res.size() ? res[i].second : -1;
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s blob ef1,ef2,... [passes]\n", argv[0]);
    return 1;
  }
  Blob b = load(argv[1]);
  std::vector<int> efs;
  for (char* tok = strtok(argv[2], ","); tok; tok = strtok(nullptr, ","))
    efs.push_back(atoi(tok));
  int passes = argc > 3 ? atoi(argv[3]) : 5;

  fprintf(stderr, "n=%d d=%d r0=%d layers=%d m=%d k=%d\n",
          b.n, b.d, b.r0, b.num_layers, b.m, b.k);
  Searcher s(b);
  std::vector<int32_t> out(size_t(b.m) * b.k);
  for (int ef : efs) {
    // warmup + correctness pass
    for (int qi = 0; qi < b.m; ++qi)
      s.search(&b.queries[size_t(qi) * b.d], ef, b.k, &out[size_t(qi) * b.k]);
    int hits = 0;
    for (int qi = 0; qi < b.m; ++qi)
      for (int i = 0; i < b.k; ++i)
        for (int j = 0; j < b.k; ++j)
          if (out[size_t(qi) * b.k + i] == b.gt[size_t(qi) * b.k + j]) {
            ++hits;
            break;
          }
    double recall = double(hits) / (double(b.m) * b.k);

    double best_s = 1e30;
    int64_t dc = 0;
    for (int p = 0; p < passes; ++p) {
      s.distcomps = 0;
      auto t0 = std::chrono::steady_clock::now();
      for (int qi = 0; qi < b.m; ++qi)
        s.search(&b.queries[size_t(qi) * b.d], ef, b.k, &out[size_t(qi) * b.k]);
      auto t1 = std::chrono::steady_clock::now();
      double el = std::chrono::duration<double>(t1 - t0).count();
      if (el < best_s) { best_s = el; dc = s.distcomps; }
    }
    printf("{\"ef\": %d, \"recall\": %.4f, \"qps\": %.1f, "
           "\"us_per_query\": %.2f, \"distcomps_per_query\": %.1f}\n",
           ef, recall, b.m / best_s, best_s / b.m * 1e6,
           double(dc) / b.m);
    fflush(stdout);
  }
  return 0;
}
