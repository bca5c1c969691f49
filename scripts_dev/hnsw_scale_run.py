"""HNSW reference-scale evidence run (VERDICT r3 item 4).

The reference serves HNSW over 5.2M×769 rows (eval_mhop_retrieval.py:96-119,
efSearch=128, efConstruction=200).  This host has ONE core, so the full 5.2M
single-thread build (~20h extrapolated) does not fit a round; this run
builds 1M×768 with the reference's efConstruction and records what PERF.md
needs: build wall-clock, recall@10 vs exact at ef∈{64,128,256}, and serving
q/s.  Run at `nice -n 19` so interactive work preempts it:

    nohup nice -n 19 python scripts_dev/hnsw_scale_run.py \
        > /tmp/hnsw_scale.log 2>&1 &

Progress and the final JSON land in /tmp/hnsw_scale.log and
/tmp/hnsw_scale_result.json; the built index is saved to /tmp/hnsw_1m.bin
so serving measurements can be repeated without rebuilding.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex, openmp_info

N = int(os.environ.get("HNSW_SCALE_N", 1_000_000))
D = int(os.environ.get("HNSW_SCALE_D", 768))
M = int(os.environ.get("HNSW_SCALE_M", 32))
EFC = int(os.environ.get("HNSW_SCALE_EFC", 200))  # reference efConstruction
NQ = int(os.environ.get("HNSW_SCALE_NQ", 512))
BATCH = int(os.environ.get("HNSW_SCALE_BATCH", 10_000))
OUT = os.environ.get("HNSW_SCALE_OUT", "/tmp/hnsw_scale_result.json")
# Per-milestone index files (hnsw_<n>.bin) so serving q/s can be re-measured
# from disk on an idle host AFTER the build — the in-build serving numbers
# are contended by whatever else shares this 1-core host (VERDICT r4 weak 1).
IDX_PREFIX = os.environ.get("HNSW_SCALE_IDX_PREFIX", "/tmp/hnsw")
# Milestones at which we pause the build, measure recall/qps over the rows
# built so far, and append a complete evidence record — so a wall-clock cap
# still yields a full result at the largest finished milestone.
CHECKPOINTS = tuple(
    int(x) for x in os.environ.get(
        "HNSW_SCALE_CKPTS", "250000,500000,1000000").split(",") if int(x) <= N)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"openmp={openmp_info()} n={N} d={D} M={M} efc={EFC}")
    rng = np.random.RandomState(0)
    # clustered data like wiki embeddings (anisotropic, not iid gaussian):
    # 4096 centers + within-cluster noise, same family as the recall tests
    nc = 4096
    centers = rng.randn(nc, D).astype(np.float32)
    log("generating data...")
    data = np.empty((N, D), np.float32)
    for s in range(0, N, BATCH):
        e = min(s + BATCH, N)
        asn = rng.randint(0, nc, e - s)
        data[s:e] = centers[asn] + 0.35 * rng.randn(e - s, D).astype(np.float32)
    queries = (centers[rng.randint(0, nc, NQ)]
               + 0.35 * rng.randn(NQ, D)).astype(np.float32)
    # saved so the post-build uncontended serving re-measure uses the SAME
    # query set without replaying the full data-generation RNG stream
    np.save(f"{IDX_PREFIX}_queries.npy", queries)

    def evaluate(idx, n_built, build_s):
        """Exact ground truth over the first n_built rows, then recall/qps."""
        log(f"[ckpt {n_built}] exact ground truth (blocked matmul)...")
        t0 = time.time()
        k = 10
        best_scores = np.full((NQ, k), -np.inf, np.float32)
        best_ids = np.zeros((NQ, k), np.int64)
        for s in range(0, n_built, 200_000):
            e = min(s + 200_000, n_built)
            sc = queries @ data[s:e].T
            cand = np.concatenate([best_scores, sc], axis=1)
            cid = np.concatenate(
                [best_ids, np.broadcast_to(np.arange(s, e), (NQ, e - s))],
                axis=1)
            top = np.argpartition(-cand, k - 1, axis=1)[:, :k]
            r = np.arange(NQ)[:, None]
            best_scores, best_ids = cand[r, top], cid[r, top]
        exact_sets = [set(row) for row in best_ids]
        np.save(f"{IDX_PREFIX}_gt_{n_built}.npy", best_ids)
        log(f"[ckpt {n_built}] ground truth in {time.time() - t0:.0f}s")

        res = {"n": n_built, "d": D, "M": M, "ef_construction": EFC,
               "build_s": round(build_s, 1), "threads": 1,
               "recall_at_10": {}, "serving_qps": {}}
        for ef in (64, 128, 256):
            t0 = time.time()
            _, ids = idx.search(queries, k, ef_search=ef)
            dt = time.time() - t0
            rec = float(np.mean([len(set(ids[i]) & exact_sets[i]) / k
                                 for i in range(NQ)]))
            res["recall_at_10"][str(ef)] = round(rec, 4)
            res["serving_qps"][str(ef)] = round(NQ / dt, 1)
            log(f"[ckpt {n_built}] ef={ef}: recall@10={rec:.4f}, "
                f"{NQ / dt:.1f} q/s")
        return res

    idx = HNSWIndex(D, M=M, ef_construction=EFC, seed=0)
    results = []
    build_s = 0.0          # accumulated build-only wall-clock (excl. evals)
    next_ckpt = iter(sorted(set(CHECKPOINTS) | {N}))
    ckpt = next(next_ckpt)
    t_batch0 = time.time()
    for s in range(0, N, BATCH):
        e = min(s + BATCH, N)
        t0 = time.time()
        idx.add(data[s:e])
        build_s += time.time() - t0
        log(f"built {e}/{N} rows, build-time {build_s:.0f}s "
            f"({e / build_s:.0f} rows/s, eta {(N - e) / max(e / build_s, 1):.0f}s)")
        while ckpt is not None and e >= ckpt:
            results.append(evaluate(idx, e, build_s))
            idx.save(f"{IDX_PREFIX}_{e}.bin")
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
            log(f"[ckpt {e}] saved index + results")
            ckpt = next(next_ckpt, None)
    log(f"BUILD DONE: {build_s:.1f}s (total wall {time.time() - t_batch0:.1f}s)")
    log(f"RESULT {json.dumps(results)}")


if __name__ == "__main__":
    main()
