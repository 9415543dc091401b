// Measured single-core CPU *build* baseline for BASELINE.md.
//
// The round-4 baseline (baseline_search.cpp) measured only serving; the
// reference times store+build as a first-class metric
// (reference: src/basic_bench.h:62-71, bench_data.time_to_build_ns).  This
// program is the build-side denominator: a from-scratch single-core
// re-implementation of the reference's insert-at-a-time construction
// (src/antitopo_engine.h:310-465 _store_vector) —
//   * geometric layer draw floor(-ln U / ln M)            (:323)
//   * greedy descent through layers above the new node's  (:356-380)
//   * per-layer best-first beam search, ef_construction   (:385-423,497-688)
//   * anti-topo prune of the candidate list               (:262-308)
//   * reverse edges with the edge_exists check and lazy
//     re-prune on overflow                                (:441-455)
// with ortho_count = 1 (the canonical config).  The prune accumulates each
// candidate's penalty incrementally instead of rescanning the selected list
// per min_element call — identical selections, strictly faster, i.e. a
// conservative (stronger) baseline.
//
// Input: the blob written by tools/export_baseline.py (same format as
// baseline_search; the stored adjacency is ignored — only the raw vectors,
// queries and ground truth are used).  After building it re-uses the same
// serving loop to report recall/QPS over the freshly built graph, so the
// build quality is verifiable.
//
// Build:  make baseline_build   (native/Makefile)
// Run:    ./baseline_build blob M efc prune_overflow [n_limit] [ef_serve]
//         prints one JSON line.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Blob {
  int n, d, m, k;
  std::vector<float> vectors;  // (n+1) * d (sentinel row unused here)
  std::vector<float> queries;  // m * d
  std::vector<int32_t> gt;     // m * k
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
  b.n = hdr[1]; b.d = hdr[2]; b.m = hdr[6]; b.k = hdr[7];
  int r0 = hdr[3], num_layers = hdr[4];
  b.vectors.resize(size_t(b.n + 1) * b.d);
  if (!read_exact(f, b.vectors.data(), b.vectors.size() * 4)) {
    fprintf(stderr, "truncated blob (vectors)\n"); exit(1);
  }
  // skip the stored graph: bottom adjacency + layers
  fseek(f, (long)(size_t(b.n + 1) * r0 * 4), SEEK_CUR);
  for (int i = 0; i < num_layers; ++i) {
    int32_t lh[2];
    if (!read_exact(f, lh, sizeof lh)) { fprintf(stderr, "bad layer\n"); exit(1); }
    fseek(f, (long)((size_t(b.n + 1) + size_t(lh[0]) * lh[1]) * 4), SEEK_CUR);
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

using P = std::pair<float, int>;

struct Builder {
  const float* base;
  int d;
  int M, M0, efc, prune_overflow;
  float ortho_factor, ortho_bias;

  // per node, per layer, edge list with lengths (reference
  // hadj_flat_with_lengths); layer 0 caps at M0, others at M
  std::vector<std::vector<std::vector<P>>> edges;
  int max_layer = 0;
  int starting_vertex = 0;
  int n_stored = 0;

  std::vector<uint32_t> stamp;
  uint32_t epoch = 0;
  int64_t distcomps = 0;

  Builder(const float* base_, int d_, int cap_hint, int M_, int efc_,
          int po_, float of_, float ob_)
      : base(base_), d(d_), M(M_), M0(2 * M_), efc(efc_),
        prune_overflow(po_), ortho_factor(of_), ortho_bias(ob_) {
    edges.reserve(cap_hint);
    stamp.assign(cap_hint, 0);
  }

  inline const float* vec(int id) const { return base + size_t(id) * d; }
  inline float dist(int a, int b) {
    ++distcomps;
    return d == 128 ? l2sq_fixed<128>(vec(a), vec(b))
                    : l2sq_var(vec(a), vec(b), d);
  }

  // Anti-topo prune of node `from`'s layer edge list
  // (reference src/antitopo_engine.h:262-308).  Penalties accumulate
  // incrementally as edges are selected — same greedy selections.
  void prune(int layer, int from, bool lazy) {
    auto& to = edges[from][layer];
    size_t cap = layer == 0 ? (size_t)M0 : (size_t)M;
    if (lazy && to.size() <= cap) return;

    std::sort(to.begin(), to.end());
    size_t c = to.size();
    std::vector<float> score(c);
    std::vector<int> hits(c, 0);
    std::vector<char> used(c, 0);
    for (size_t i = 0; i < c; ++i) score[i] = to[i].first;

    std::vector<P> ret;
    ret.reserve(cap);
    while (ret.size() < cap) {
      int best = -1;
      float best_s = std::numeric_limits<float>::max();
      for (size_t i = 0; i < c; ++i) {
        if (used[i] || hits[i] > prune_overflow) continue;
        if (score[i] < best_s) { best_s = score[i]; best = (int)i; }
      }
      if (best < 0) break;
      used[best] = 1;
      ret.emplace_back(to[best]);
      int pid = to[best].second;
      for (size_t i = 0; i < c; ++i) {
        if (used[i] || hits[i] > prune_overflow) continue;
        float basic = to[i].first;
        float co = dist(pid, to[i].second);
        if (co < basic) {
          score[i] += ortho_factor * (basic - co) + ortho_bias;
          ++hits[i];
        }
      }
    }
    to = std::move(ret);
  }

  // Best-first beam search at one layer (reference :497-688), ef-capped.
  // Results ascending by (d, id).
  std::vector<P> search_layer(const float* q, int layer,
                              const std::vector<int>& seeds, int ef) {
    ++epoch;
    std::priority_queue<P, std::vector<P>, std::greater<P>> cand;
    std::priority_queue<P> nearest;
    for (int s : seeds) {
      if (stamp[s] == epoch) continue;
      stamp[s] = epoch;
      float ds = d == 128 ? l2sq_fixed<128>(q, vec(s)) : l2sq_var(q, vec(s), d);
      ++distcomps;
      cand.emplace(ds, s);
      nearest.emplace(ds, s);
    }
    while ((int)nearest.size() > ef) nearest.pop();
    while (!cand.empty()) {
      P cur = cand.top();
      cand.pop();
      if ((int)nearest.size() == ef && cur.first > nearest.top().first) break;
      if (layer >= (int)edges[cur.second].size()) continue;
      for (const P& e : edges[cur.second][layer]) {
        int nb = e.second;
        if (stamp[nb] == epoch) continue;
        stamp[nb] = epoch;
        __builtin_prefetch(vec(nb));
        float nd =
            d == 128 ? l2sq_fixed<128>(q, vec(nb)) : l2sq_var(q, vec(nb), d);
        ++distcomps;
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
    return res;
  }

  void insert(int v, int new_level) {
    edges.emplace_back();
    edges[v].resize(new_level + 1);
    int prev = n_stored;
    ++n_stored;
    if (prev == 0) {
      while (new_level >= max_layer) { ++max_layer; starting_vertex = v; }
      return;
    }
    const float* q = vec(v);

    // greedy descent through layers above the new node's top layer
    // (reference :356-380; ortho_count=1 -> plain distance scoring)
    int ep = starting_vertex;
    float ep_d =
        d == 128 ? l2sq_fixed<128>(q, vec(ep)) : l2sq_var(q, vec(ep), d);
    ++distcomps;
    for (int layer = max_layer - 1; layer > new_level; --layer) {
      bool changed = true;
      while (changed) {
        changed = false;
        if (layer >= (int)edges[ep].size()) break;
        for (const P& e : edges[ep][layer]) {
          float nd = d == 128 ? l2sq_fixed<128>(q, vec(e.second))
                              : l2sq_var(q, vec(e.second), d);
          ++distcomps;
          if (nd < ep_d) { ep = e.second; ep_d = nd; changed = true; }
        }
      }
    }

    // per-layer candidate search + prune + reverse edges (:385-455)
    std::vector<int> cur = {ep};
    int top = std::min(new_level, max_layer - 1);
    std::vector<std::vector<P>> knn_per_layer(top + 1);
    for (int layer = top; layer >= 0; --layer) {
      std::vector<P> res = search_layer(q, layer, cur, efc);
      knn_per_layer[layer] = res;
      if (!res.empty()) cur = {res[0].second};
    }
    for (int layer = 0; layer <= top; ++layer) {
      edges[v][layer] = knn_per_layer[layer];
      prune(layer, v, false);
      for (const P& e : edges[v][layer]) {
        int dst = e.second;
        bool exists = false;
        for (const P& back : edges[dst][layer])
          if (back.second == v) { exists = true; break; }
        if (!exists) {
          edges[dst][layer].emplace_back(e.first, v);
          prune(layer, dst, true);
        }
      }
    }
    while (new_level >= max_layer) { ++max_layer; starting_vertex = v; }
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr,
            "usage: %s blob M efc prune_overflow [n_limit] [ef_serve]\n",
            argv[0]);
    return 1;
  }
  Blob b = load(argv[1]);
  int M = atoi(argv[2]);
  int efc = atoi(argv[3]);
  int po = atoi(argv[4]);
  int n_limit = argc > 5 ? atoi(argv[5]) : b.n;
  int ef_serve = argc > 6 ? atoi(argv[6]) : 100;
  if (n_limit <= 0 || n_limit > b.n) n_limit = b.n;

  // layer draws: same law as the reference (floor(-ln U / ln M), :323)
  std::mt19937_64 gen(0);
  std::uniform_real_distribution<double> uni(1e-300, 1.0);
  std::vector<int> levels(n_limit);
  for (int i = 0; i < n_limit; ++i)
    levels[i] = (int)std::floor(-std::log(uni(gen)) / std::log((double)M));

  Builder bl(b.vectors.data(), b.d, n_limit, M, efc, po, 0.5f, 0.0f);
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < n_limit; ++i) bl.insert(i, levels[i]);
  auto t1 = std::chrono::steady_clock::now();
  double build_s = std::chrono::duration<double>(t1 - t0).count();
  int64_t build_distcomps = bl.distcomps;

  // serve the freshly built graph with the same loop the serving baseline
  // uses (descent + bottom beam), full-build runs only
  double qps = 0.0, recall = 0.0;
  if (n_limit == b.n) {
    std::vector<int32_t> out(size_t(b.m) * b.k);
    auto serve = [&](int qi) {
      const float* q = &b.queries[size_t(qi) * b.d];
      // descent
      int ep = bl.starting_vertex;
      float ep_d = b.d == 128 ? l2sq_fixed<128>(q, bl.vec(ep))
                              : l2sq_var(q, bl.vec(ep), b.d);
      for (int layer = bl.max_layer - 1; layer > 0; --layer) {
        bool changed = true;
        while (changed) {
          changed = false;
          if (layer >= (int)bl.edges[ep].size()) break;
          for (const P& e : bl.edges[ep][layer]) {
            float nd = b.d == 128 ? l2sq_fixed<128>(q, bl.vec(e.second))
                                  : l2sq_var(q, bl.vec(e.second), b.d);
            if (nd < ep_d) { ep = e.second; ep_d = nd; changed = true; }
          }
        }
      }
      std::vector<int> seeds = {ep};
      std::vector<P> res = bl.search_layer(q, 0, seeds, ef_serve);
      for (int i = 0; i < b.k; ++i)
        out[size_t(qi) * b.k + i] = i < (int)res.size() ? res[i].second : -1;
    };
    for (int qi = 0; qi < b.m; ++qi) serve(qi);  // warmup + answers
    int hits = 0;
    for (int qi = 0; qi < b.m; ++qi)
      for (int i = 0; i < b.k; ++i)
        for (int j = 0; j < b.k; ++j)
          if (out[size_t(qi) * b.k + i] == b.gt[size_t(qi) * b.k + j]) {
            ++hits;
            break;
          }
    recall = double(hits) / (double(b.m) * b.k);
    double best_s = 1e30;
    for (int p = 0; p < 3; ++p) {
      auto s0 = std::chrono::steady_clock::now();
      for (int qi = 0; qi < b.m; ++qi) serve(qi);
      auto s1 = std::chrono::steady_clock::now();
      best_s = std::min(best_s, std::chrono::duration<double>(s1 - s0).count());
    }
    qps = b.m / best_s;
  }

  printf(
      "{\"n_built\": %d, \"build_s\": %.1f, \"build_distcomps\": %lld, "
      "\"inserts_per_s\": %.1f, \"M\": %d, \"efc\": %d, "
      "\"prune_overflow\": %d, \"ef_serve\": %d, \"recall\": %.4f, "
      "\"qps\": %.1f}\n",
      n_limit, build_s, (long long)build_distcomps, n_limit / build_s, M, efc,
      po, ef_serve, recall, qps);
  return 0;
}
