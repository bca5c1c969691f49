// HNSW approximate maximum-inner-product index (host-side serving path).
//
// Native replacement for the reference's FAISS IndexHNSWFlat usage
// (scripts/eval/eval_mhop_retrieval.py:96-119).  The reference squeezes IP
// search into FAISS's L2 HNSW via an auxiliary dimension sqrt(phi - |x|^2)
// and negates distances afterwards (:44-47,187-188); since this is our own
// implementation we order neighbors by inner product directly — same result,
// no aux dimension, no phi pass over the corpus.
//
// Thread model (mirrors what FAISS gives the reference for free):
//  - search: read-only on the graph; every worker thread carries its OWN
//    generation-stamped VisitedTable, so hnsw_search_batch is safe under
//    OpenMP and bit-identical to serial per-query search.
//  - build: hnsw_add_batch inserts level-bucket by level-bucket (highest
//    first, as FAISS hnsw_add_vertices does); within a bucket insertions run
//    in parallel with striped std::mutexes guarding adjacency writes.
//    Readers traverse adjacency without locks; every adjacency slot is
//    accessed through RELAXED ATOMIC loads/stores (slot_ld/slot_st below) —
//    plain movs on x86, so this costs nothing, but unlike FAISS's benign-
//    race version it is formally data-race-free C++ and ThreadSanitizer-
//    clean (native/hnsw_tsan_driver.cpp drives concurrent inserts and
//    concurrent searches under -fsanitize=thread in CI).  A racing reader
//    sees each slot as either -1 or a valid id (slots only transition
//    -1 -> id, and re-selections rewrite ids in place).  Vectors and levels
//    for the whole batch are materialized before the parallel region, so
//    every id a reader can encounter has valid data.
//  - add vs search on ONE handle must NOT overlap: prepare_batch reallocates
//    data/levels/neighbors with no reader exclusion, so a search concurrent
//    with an add can dereference freed buffers.  The Python binding
//    (index/hnsw.py::HNSWIndex) enforces this with a shared/exclusive lock
//    (searches shared, adds exclusive); direct C-API users must do the same.
//
// Exposed as a C API for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -shared -fPIC -o libhnsw.so hnsw.cpp [-fopenmp]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#if defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#endif

namespace {

// Adjacency slots are written by locked inserters while traversed lock-free
// by concurrent inserters/readers: relaxed atomics make that formally
// race-free at zero cost (plain aligned movs on x86).  vector<atomic<int>>
// would break resize/IO, so plain int storage + __atomic builtins.
inline int slot_ld(const int* p) {
  return __atomic_load_n(p, __ATOMIC_RELAXED);
}
inline void slot_st(int* p, int v) {
  __atomic_store_n(p, v, __ATOMIC_RELAXED);
}

// Generation-stamped visited set (FAISS VisitedTable): one reusable buffer
// instead of an O(n) zero-fill per search_layer call — the per-call vector
// made index CONSTRUCTION O(n^2) in memset traffic.  One instance PER
// THREAD; instances are never shared (sharing was a confirmed silent-recall
// race: concurrent begin() calls collide on gen and threads see each
// other's visited marks, pruning exploration).
struct VisitedTable {
  std::vector<uint32_t> stamp;
  uint32_t gen = 0;

  void begin(size_t n) {
    if (stamp.size() < n) stamp.resize(n, 0);
    if (++gen == 0) {                 // u32 wrap: reset stamps once per 4B
      std::fill(stamp.begin(), stamp.end(), 0);
      gen = 1;
    }
  }
  bool seen(int i) const { return stamp[i] == gen; }
  void mark(int i) { stamp[i] = gen; }
};

struct HNSW {
  int dim;
  int M;               // max neighbors per node per layer (2M at layer 0)
  int ef_construction;
  int max_level = -1;
  int entry = -1;
  std::vector<float> data;                    // n * dim
  std::vector<int> levels;                    // level of each node
  // neighbors[l][i] = fixed-capacity adjacency (M or 2M), -1 padded
  std::vector<std::vector<int>> neighbors;    // per level, n * cap
  std::mt19937 rng;
  double level_mult;
  std::mutex entry_mutex;                     // guards entry/max_level
  // striped adjacency locks: one mutex per node was allocated PER
  // add_batch call (~40 B x n transient construction each add — ~200 MB
  // at 5M docs); only one lock is ever held at a time (see connect), so
  // striping cannot deadlock and collisions merely serialize two writers
  static constexpr int kLockStripes = 4096;
  std::unique_ptr<std::mutex[]> locks_ =
      std::make_unique<std::mutex[]>(kLockStripes);
  std::mutex& lock_for(int node) { return locks_[node & (kLockStripes - 1)]; }

  HNSW(int d, int m, int efc, uint64_t seed)
      : dim(d), M(m), ef_construction(efc), rng(seed),
        level_mult(1.0 / std::log(std::max(2, m))) {}

  int n() const { return (int)levels.size(); }
  int cap(int level) const { return level == 0 ? 2 * M : M; }
  const float* vec(int i) const { return data.data() + (size_t)i * dim; }

  // Inner product, the build/search hot op (~10^5 calls per insert once
  // reverse-link re-selection kicks in).  A single-accumulator reduction is
  // a serial FP dependency chain the compiler may NOT reassociate without
  // -ffast-math, so the naive loop runs scalar at ~1 FLOP per 4 cycles.
  // Four independent accumulators break the chain explicitly (a fixed,
  // deterministic summation order — just a different one than the serial
  // loop); with AVX2+FMA that is 32 FLOPs/cycle peak.  Measured: 10k x 768
  // M=32 efc=200 build 542 s -> 33 s on this host (PERF.md).
  float ip(const float* a, const float* b) const {
    int i = 0;
#if defined(__AVX2__) && defined(__FMA__)
    __m256 acc0 = _mm256_setzero_ps(), acc1 = _mm256_setzero_ps();
    __m256 acc2 = _mm256_setzero_ps(), acc3 = _mm256_setzero_ps();
    for (; i + 32 <= dim; i += 32) {
      acc0 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i),
                             _mm256_loadu_ps(b + i), acc0);
      acc1 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i + 8),
                             _mm256_loadu_ps(b + i + 8), acc1);
      acc2 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i + 16),
                             _mm256_loadu_ps(b + i + 16), acc2);
      acc3 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i + 24),
                             _mm256_loadu_ps(b + i + 24), acc3);
    }
    for (; i + 8 <= dim; i += 8)
      acc0 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i),
                             _mm256_loadu_ps(b + i), acc0);
    __m256 acc = _mm256_add_ps(_mm256_add_ps(acc0, acc1),
                               _mm256_add_ps(acc2, acc3));
    __m128 h = _mm_add_ps(_mm256_castps256_ps128(acc),
                          _mm256_extractf128_ps(acc, 1));
    h = _mm_add_ps(h, _mm_movehl_ps(h, h));
    h = _mm_add_ss(h, _mm_shuffle_ps(h, h, 1));
    float s = _mm_cvtss_f32(h);
#else
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    for (; i + 4 <= dim; i += 4) {
      s0 += a[i] * b[i];
      s1 += a[i + 1] * b[i + 1];
      s2 += a[i + 2] * b[i + 2];
      s3 += a[i + 3] * b[i + 3];
    }
    float s = (s0 + s1) + (s2 + s3);
#endif
    for (; i < dim; ++i) s += a[i] * b[i];
    return s;
  }

  // first 256 B of a vector row: enough to cover the FMA loop's startup
  // latency; the hardware prefetcher streams the rest of the row
  static void prefetch_row(const float* p) {
    for (int o = 0; o < 64; o += 16) __builtin_prefetch(p + o, 0, 3);
  }

  int* nbrs(int level, int node) {
    return neighbors[level].data() + (size_t)node * cap(level);
  }

  int random_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng);
    int lvl = (int)(-std::log(std::max(r, 1e-12)) * level_mult);
    return std::min(lvl, 24);
  }

  // greedy ascent at one layer: move to the best-scoring neighbor until stuck
  int greedy(const float* q, int start, int level) const {
    int cur = start;
    float best = ip(q, vec(cur));
    bool improved = true;
    while (improved) {
      improved = false;
      const int* nb = neighbors[level].data() + (size_t)cur * cap(level);
      for (int j = 0; j < cap(level); ++j) {
        int cand = slot_ld(nb + j);
        if (cand < 0) break;
        float s = ip(q, vec(cand));
        if (s > best) { best = s; cur = cand; improved = true; }
      }
    }
    return cur;
  }

  // beam search at one layer; returns up to ef (score, id), best first
  void search_layer(const float* q, int start, int level, int ef,
                    VisitedTable& vt,
                    std::vector<std::pair<float, int>>& out) const {
    // min-heap of results (worst on top), max-heap of candidates
    std::priority_queue<std::pair<float, int>,
                        std::vector<std::pair<float, int>>,
                        std::greater<>> results;
    std::priority_queue<std::pair<float, int>> candidates;
    vt.begin(n());

    float s0 = ip(q, vec(start));
    results.push({s0, start});
    candidates.push({s0, start});
    vt.mark(start);

    std::vector<int> fresh;            // unseen neighbors of the popped node
    fresh.reserve(cap(level));
    while (!candidates.empty()) {
      auto [cs, cid] = candidates.top();
      candidates.pop();
      if ((int)results.size() >= ef && cs < results.top().first) break;
      const int* nb = neighbors[level].data() + (size_t)cid * cap(level);
      // pass 1: filter the adjacency through the visited table (cheap,
      // cache-resident) and kick off prefetches for the rows pass 2 will
      // score — the row fetches then overlap the FMA loops instead of
      // serializing one DRAM round-trip per neighbor
      fresh.clear();
      for (int j = 0; j < cap(level); ++j) {
        int cand = slot_ld(nb + j);
        if (cand < 0) break;
        if (vt.seen(cand)) continue;
        vt.mark(cand);
        prefetch_row(vec(cand));
        fresh.push_back(cand);
      }
      for (int cand : fresh) {
        float s = ip(q, vec(cand));
        if ((int)results.size() < ef || s > results.top().first) {
          results.push({s, cand});
          candidates.push({s, cand});
          if ((int)results.size() > ef) results.pop();
        }
      }
    }
    out.clear();
    out.reserve(results.size());
    while (!results.empty()) { out.push_back(results.top()); results.pop(); }
    std::reverse(out.begin(), out.end());  // best first
  }

  // FAISS-style neighbor diversification (select_neighbors_heuristic
  // adapted to IP similarity): keep a candidate only if no already-kept
  // neighbor is MORE similar to it than `base` is — links spread across
  // directions so greedy routing can escape dense clusters.  Remaining
  // slots are backfilled with the best pruned candidates (FAISS's
  // keep_pruned_connections) to preserve graph connectivity.
  void select_diverse(const float* base,
                      const std::vector<std::pair<float, int>>& cands,
                      int c, int self_id, std::vector<int>& out) const {
    std::vector<int> pruned;
    for (auto& [s, id] : cands) {
      if (id == self_id) continue;
      if ((int)out.size() == c) break;
      bool keep = true;
      for (int kept : out) {
        if (ip(vec(kept), vec(id)) > s) { keep = false; break; }
      }
      if (keep) out.push_back(id);
      else pruned.push_back(id);
    }
    for (int id : pruned) {
      if ((int)out.size() == c) break;
      out.push_back(id);
    }
  }

  // connect `node` to up to cap diversified neighbors; reverse links run
  // the same heuristic over the existing adjacency when full.  `locks` (one
  // per node, sized for the final batch) serialize adjacency WRITES; only
  // one lock is ever held at a time (node's is released before reverse
  // links), so no deadlock is possible.
  void connect(int node, int level,
               const std::vector<std::pair<float, int>>& cands) {
    int c = cap(level);
    std::vector<int> sel;
    select_diverse(vec(node), cands, c, node, sel);
    int count = (int)sel.size();
    {
      std::lock_guard<std::mutex> g(lock_for(node));
      int* nb = nbrs(level, node);
      for (int j = 0; j < count; ++j) slot_st(nb + j, sel[j]);
      for (int j = count; j < c; ++j) slot_st(nb + j, -1);
    }
    // reverse links
    std::vector<std::pair<float, int>> oc;
    std::vector<int> osel;
    for (int j = 0; j < count; ++j) {
      int other = sel[j];
      std::lock_guard<std::mutex> g(lock_for(other));
      int* onb = nbrs(level, other);
      int k = 0;
      while (k < c && slot_ld(onb + k) >= 0) ++k;
      if (k < c) {
        slot_st(onb + k, node);
        continue;
      }
      // full: re-select a diverse adjacency from existing neighbors + node
      oc.clear();
      osel.clear();
      oc.push_back({ip(vec(other), vec(node)), node});
      for (int t = 0; t < c; ++t) {
        int id = slot_ld(onb + t);
        oc.push_back({ip(vec(other), vec(id)), id});
      }
      std::sort(oc.begin(), oc.end(),
                [](const auto& a, const auto& b) { return a.first > b.first; });
      select_diverse(vec(other), oc, c, other, osel);
      for (int t = 0; t < (int)osel.size(); ++t) slot_st(onb + t, osel[t]);
      for (int t = (int)osel.size(); t < c; ++t) slot_st(onb + t, -1);
    }
  }

  // wire node `id` into the graph; data/levels/adjacency storage must
  // already be materialized for the whole batch (see add_batch)
  void insert_node(int id, VisitedTable& vt) {
    int lvl = levels[id];
    int cur, top;
    {
      std::lock_guard<std::mutex> g(entry_mutex);
      cur = entry;
      top = max_level;
    }
    const float* v = vec(id);
    for (int l = top; l > lvl; --l) cur = greedy(v, cur, l);
    std::vector<std::pair<float, int>> cands;
    for (int l = std::min(lvl, top); l >= 0; --l) {
      search_layer(v, cur, l, ef_construction, vt, cands);
      connect(id, l, cands);
      cur = cands.empty() ? cur : cands[0].second;
    }
    if (lvl > top) {
      std::lock_guard<std::mutex> g(entry_mutex);
      if (lvl > max_level) { max_level = lvl; entry = id; }
    }
  }

  // materialize vectors + levels + adjacency for `count` new rows and
  // bucket the new ids by level (descending insert order, FAISS
  // hnsw_add_vertices) — split out from add_batch so the TSAN harness can
  // drive the same insertion path with std::threads instead of OpenMP
  std::vector<std::vector<int>> prepare_batch(int64_t count,
                                              const float* vecs) {
    int first = n();
    int64_t total = first + count;
    // geometric growth: exact-size resizes made every incremental add
    // reallocate + copy the full vectors/adjacency (O(n) per one-doc add
    // in live serving)
    if (data.capacity() < (size_t)total * dim)
      data.reserve(std::max((size_t)total * dim, data.capacity() * 2));
    data.insert(data.end(), vecs, vecs + count * (int64_t)dim);
    if (levels.capacity() < (size_t)total)
      levels.reserve(std::max((size_t)total, levels.capacity() * 2));
    int batch_max = -1;
    for (int64_t i = 0; i < count; ++i) {
      int lvl = random_level();
      levels.push_back(lvl);
      batch_max = std::max(batch_max, lvl);
    }
    while ((int)neighbors.size() <= std::max(batch_max, max_level))
      neighbors.emplace_back();
    for (int l = 0; l < (int)neighbors.size(); ++l) {
      size_t need = (size_t)total * cap(l);
      if (neighbors[l].capacity() < need)
        neighbors[l].reserve(std::max(need, neighbors[l].capacity() * 2));
      neighbors[l].resize(need, -1);
    }

    std::vector<std::vector<int>> buckets(batch_max + 1);
    for (int64_t i = 0; i < count; ++i)
      buckets[levels[first + i]].push_back((int)(first + i));
    return buckets;
  }

  // all nodes in a bucket have level <= the current max, so entry/max_level
  // only move when the top bucket seeds the graph, and buckets parallelize
  // cleanly
  void add_batch(int64_t count, const float* vecs) {
    if (count <= 0) return;
    auto buckets = prepare_batch(count, vecs);
    for (int lvl = (int)buckets.size() - 1; lvl >= 0; --lvl) {
      auto& bucket = buckets[lvl];
      if (bucket.empty()) continue;
      size_t start = 0;
      if (entry < 0) {               // seed the graph with the first node
        entry = bucket[0];
        max_level = lvl;
        start = 1;
      }
#ifdef _OPENMP
#pragma omp parallel
      {
        VisitedTable vt;
#pragma omp for schedule(dynamic, 64)
        for (int64_t j = (int64_t)start; j < (int64_t)bucket.size(); ++j)
          insert_node(bucket[j], vt);
      }
#else
      VisitedTable vt;
      for (size_t j = start; j < bucket.size(); ++j)
        insert_node(bucket[j], vt);
#endif
    }
  }

  void search(const float* q, int k, int ef, VisitedTable& vt,
              int64_t* out_ids, float* out_scores) const {
    if (entry < 0) {
      for (int i = 0; i < k; ++i) { out_ids[i] = -1; out_scores[i] = -1e30f; }
      return;
    }
    int cur = entry;
    for (int l = max_level; l > 0; --l) cur = greedy(q, cur, l);
    std::vector<std::pair<float, int>> cands;
    search_layer(q, cur, 0, std::max(ef, k), vt, cands);
    for (int i = 0; i < k; ++i) {
      if (i < (int)cands.size()) {
        out_ids[i] = cands[i].second;
        out_scores[i] = cands[i].first;
      } else {
        out_ids[i] = -1;
        out_scores[i] = -1e30f;
      }
    }
  }
};

}  // namespace

extern "C" {

void* hnsw_new(int dim, int M, int ef_construction, uint64_t seed) {
  return new HNSW(dim, M, ef_construction, seed);
}

void hnsw_free(void* h) { delete (HNSW*)h; }

void hnsw_add_batch(void* h, int64_t count, const float* vecs) {
  ((HNSW*)h)->add_batch(count, vecs);
}

int64_t hnsw_size(void* h) { return ((HNSW*)h)->n(); }

// 1 when compiled with OpenMP (build + batched search run multi-threaded)
int hnsw_has_openmp(void) {
#ifdef _OPENMP
  return 1;
#else
  return 0;
#endif
}

int hnsw_max_threads(void) {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

void hnsw_search_batch(void* h, int64_t nq, const float* qs, int k, int ef,
                       int64_t* out_ids, float* out_scores) {
  HNSW* idx = (HNSW*)h;
#ifdef _OPENMP
#pragma omp parallel
  {
    VisitedTable vt;                 // per-thread: searches never share one
#pragma omp for schedule(dynamic)
    for (int64_t i = 0; i < nq; ++i) {
      idx->search(qs + i * idx->dim, k, ef, vt, out_ids + i * k,
                  out_scores + i * k);
    }
  }
#else
  VisitedTable vt;
  for (int64_t i = 0; i < nq; ++i) {
    idx->search(qs + i * idx->dim, k, ef, vt, out_ids + i * k,
                out_scores + i * k);
  }
#endif
}

// every write/read checked: a short fwrite (full disk) must fail the save,
// and a truncated/corrupt file must fail the load cleanly (python raises
// IOError) instead of resizing to garbage counts or reading junk adjacency
#define WR(ptr, sz, cnt) \
  do { if (fwrite((ptr), (sz), (cnt), f) != (size_t)(cnt)) { \
         fclose(f); return -1; } } while (0)
#define RD(ptr, sz, cnt) \
  do { if (fread((ptr), (sz), (cnt), f) != (size_t)(cnt)) { \
         fclose(f); delete idx; return nullptr; } } while (0)

int hnsw_save(void* h, const char* path) {
  HNSW* idx = (HNSW*)h;
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int32_t header[4] = {idx->dim, idx->M, idx->ef_construction, idx->max_level};
  WR(header, sizeof(int32_t), 4);
  int64_t n = idx->n(), entry = idx->entry;
  WR(&n, sizeof(int64_t), 1);
  WR(&entry, sizeof(int64_t), 1);
  WR(idx->data.data(), sizeof(float), idx->data.size());
  WR(idx->levels.data(), sizeof(int), idx->levels.size());
  int32_t nlev = (int32_t)idx->neighbors.size();
  WR(&nlev, sizeof(int32_t), 1);
  for (auto& adj : idx->neighbors) {
    int64_t sz = (int64_t)adj.size();
    WR(&sz, sizeof(int64_t), 1);
    WR(adj.data(), sizeof(int), adj.size());
  }
  if (fclose(f) != 0) return -1;
  return 0;
}

void* hnsw_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  int32_t header[4];
  HNSW* idx = nullptr;
  RD(header, sizeof(int32_t), 4);
  // header sanity BEFORE any use: dim/M/ef positive, max_level bounded
  // below (its upper bound is checked against nlev once that is read —
  // an unchecked max_level of e.g. 1000 would walk search() off the end
  // of neighbors[])
  if (header[0] <= 0 || header[1] <= 0 || header[2] <= 0 ||
      header[3] < -1 || header[3] > 64) {
    fclose(f); return nullptr;
  }
  idx = new HNSW(header[0], header[1], header[2], 0);
  idx->max_level = header[3];
  int64_t n, entry;
  RD(&n, sizeof(int64_t), 1);
  RD(&entry, sizeof(int64_t), 1);
  if (n < 0 || entry < -1 || entry >= n) {
    fclose(f); delete idx; return nullptr;
  }
  idx->entry = (int)entry;
  idx->data.resize((size_t)n * idx->dim);
  RD(idx->data.data(), sizeof(float), idx->data.size());
  idx->levels.resize(n);
  RD(idx->levels.data(), sizeof(int), n);
  int32_t nlev;
  RD(&nlev, sizeof(int32_t), 1);
  if (nlev < 0 || nlev > 64) { fclose(f); delete idx; return nullptr; }
  // max_level indexes neighbors[] during search; levels[] index it during
  // insert — both must stay inside the nlev adjacency arrays
  if (idx->max_level >= nlev && n > 0) { fclose(f); delete idx; return nullptr; }
  // a populated graph must be internally consistent: entry set, a
  // non-negative top level, and at least the base adjacency layer.
  // (n>0 with nlev==0 and max_level==-1 passes the bound checks above but
  // search() would index neighbors[0] on an empty vector — OOB UB)
  if (n > 0 && (entry < 0 || idx->max_level < 0 || nlev < 1)) {
    fclose(f); delete idx; return nullptr;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (idx->levels[i] < 0 || idx->levels[i] >= std::max(nlev, 1)) {
      fclose(f); delete idx; return nullptr;
    }
  }
  idx->neighbors.resize(nlev);
  for (int l = 0; l < nlev; ++l) {
    auto& adj = idx->neighbors[l];
    int64_t sz;
    RD(&sz, sizeof(int64_t), 1);
    int64_t expect = n * (int64_t)idx->cap(l);
    if (sz != expect) { fclose(f); delete idx; return nullptr; }
    adj.resize(sz);
    RD(adj.data(), sizeof(int), sz);
    for (int64_t t = 0; t < sz; ++t) {
      // junk adjacency ids would feed vec()/stamp[] with OOB indexes
      if (adj[t] < -1 || adj[t] >= n) { fclose(f); delete idx; return nullptr; }
    }
  }
  fclose(f);
  return idx;
}

#undef WR
#undef RD

}  // extern "C"
