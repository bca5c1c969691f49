"""Uncontended HNSW serving re-measure (VERDICT r4 weak 1 / r5 item 1).

The in-build serving numbers from scripts_dev/hnsw_scale_run.py share this
1-core host with whatever else the round is running, so q/s is not
comparable across milestones.  This script re-measures serving from the
SAVED per-milestone index files (hnsw_<n>.bin) using the SAME saved query
set and exact ground truth, and should run when nothing else is hogging
the core:

    python scripts_dev/hnsw_serving_remeasure.py 1000000 2000000 ...

Appends/updates the "serving_qps_uncontended" field per milestone in
HNSW_SCALE_OUT (default /tmp/hnsw_scale_r5.json) keyed by n.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex

PREFIX = os.environ.get("HNSW_SCALE_IDX_PREFIX", "/tmp/hnsw")
OUT = os.environ.get("HNSW_SCALE_OUT", "/tmp/hnsw_scale_r5.json")
REPS = int(os.environ.get("HNSW_REMEASURE_REPS", 3))


def main():
    ns = [int(x) for x in sys.argv[1:]]
    queries = np.load(f"{PREFIX}_queries.npy")
    k = 10
    results = json.load(open(OUT)) if os.path.exists(OUT) else []
    by_n = {r["n"]: r for r in results}
    for n in ns:
        path = f"{PREFIX}_{n}.bin"
        gt_path = f"{PREFIX}_gt_{n}.npy"
        if not (os.path.exists(path) and os.path.exists(gt_path)):
            print(f"[{n}] missing {path} or {gt_path}, skipping", flush=True)
            continue
        print(f"[{n}] loading index...", flush=True)
        idx = HNSWIndex.load(path)
        exact_sets = [set(row) for row in np.load(gt_path)]
        rec_row, qps_row = {}, {}
        for ef in (64, 128, 256):
            best = None
            for _ in range(REPS):        # best-of-REPS: min is the
                t0 = time.time()          # least-contended sample
                _, ids = idx.search(queries, k, ef_search=ef)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rec = float(np.mean([len(set(ids[i]) & exact_sets[i]) / k
                                 for i in range(len(queries))]))
            rec_row[str(ef)] = round(rec, 4)
            qps_row[str(ef)] = round(len(queries) / best, 1)
            print(f"[{n}] ef={ef}: recall@10={rec:.4f}, "
                  f"{len(queries) / best:.1f} q/s (best of {REPS})",
                  flush=True)
        rec_entry = by_n.get(n)
        if rec_entry is None:
            rec_entry = {"n": n}
            results.append(rec_entry)
            by_n[n] = rec_entry
        rec_entry["serving_qps_uncontended"] = qps_row
        rec_entry["recall_at_10_remeasured"] = rec_row
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        del idx
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
