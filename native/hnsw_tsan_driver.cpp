// ThreadSanitizer harness for the native HNSW index (tests/test_hnsw.py).
//
// Drives the exact code paths hnsw.cpp parallelizes with OpenMP — bucketed
// concurrent inserts (per-node-striped locks + relaxed-atomic adjacency
// slots) and concurrent read-only searches (per-thread visited tables) —
// but with std::threads, because GCC's libgomp is not TSAN-instrumented and
// reports false positives on its own barriers.  A clean run is the formal
// data-race-freedom check behind the thread-model comment at the top of
// hnsw.cpp; the harness is verified to catch real races (degrading slot_ld/
// slot_st to plain accesses makes TSAN fire — see the in-repo test).
//
// Build: g++ -O1 -g -std=c++17 -fsanitize=thread hnsw_tsan_driver.cpp \
//            -o hnsw_tsan_driver -lpthread

#include <cstdio>
#include <thread>

#include "hnsw.cpp"

int main() {
  const int dim = 48, n1 = 1200, n2 = 1800, nthreads = 8;
  std::mt19937 rng(7);
  std::normal_distribution<float> g(0.f, 1.f);
  std::vector<float> a((size_t)(n1 + n2) * dim);
  for (auto& x : a) x = g(rng);

  HNSW h(dim, 12, 60, 0);
  h.add_batch(n1, a.data());  // serial seed batch

  // concurrently-inserted batch: the std::thread equivalent of the
  // `#pragma omp for` over each level bucket in add_batch
  auto buckets = h.prepare_batch(n2, a.data() + (size_t)n1 * dim);
  for (int lvl = (int)buckets.size() - 1; lvl >= 0; --lvl) {
    auto& bucket = buckets[lvl];
    if (bucket.empty()) continue;
    size_t start = 0;
    if (h.entry < 0) { h.entry = bucket[0]; h.max_level = lvl; start = 1; }
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; ++t)
      ts.emplace_back([&h, &bucket, start, t] {
        VisitedTable vt;
        for (size_t j = start + t; j < bucket.size(); j += nthreads)
          h.insert_node(bucket[j], vt);
      });
    for (auto& th : ts) th.join();
  }
  if (h.n() != n1 + n2) { std::fprintf(stderr, "bad size\n"); return 1; }

  // concurrent read-only searches over the freshly built graph
  const int nq = 256, k = 5;
  std::vector<float> q((size_t)nq * dim);
  for (auto& x : q) x = g(rng);
  std::vector<int64_t> ids((size_t)nq * k);
  std::vector<float> scores((size_t)nq * k);
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t)
    ts.emplace_back([&, t] {
      VisitedTable vt;
      for (int i = t; i < nq; i += nthreads)
        h.search(q.data() + (size_t)i * dim, k, 64, vt,
                 ids.data() + (size_t)i * k, scores.data() + (size_t)i * k);
    });
  for (auto& th : ts) th.join();
  for (size_t i = 0; i < (size_t)nq * k; ++i)
    if (ids[i] < -1 || ids[i] >= n1 + n2) {
      std::fprintf(stderr, "bad id\n");
      return 1;
    }
  std::printf("TSAN DRIVER OK\n");
  return 0;
}
