"""Native HNSW index tests: build, recall vs exact, persistence, and the
forced-multithread race regression (per-thread visited tables)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex, openmp_info


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(0)
    n, d = 2000, 64
    data = rng.randn(n, d).astype(np.float32)
    idx = HNSWIndex(d, M=16, ef_construction=100, seed=0)
    idx.add(data)
    return idx, data


def test_build_and_size(built):
    idx, data = built
    assert len(idx) == 2000


def test_recall_vs_exact(built):
    idx, data = built
    rng = np.random.RandomState(1)
    q = rng.randn(50, 64).astype(np.float32)
    scores, ids = idx.search(q, k=10, ef_search=128)
    exact = q @ data.T
    exact_ids = np.argsort(-exact, axis=1)[:, :10]
    recall = np.mean([len(set(ids[i]) & set(exact_ids[i])) / 10
                      for i in range(50)])
    assert recall >= 0.85, f"HNSW recall@10 too low: {recall}"
    # scores are true inner products of the returned ids
    for i in range(5):
        for j in range(10):
            assert scores[i, j] == pytest.approx(exact[i, ids[i, j]], rel=1e-4)
    # results sorted best-first
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_self_retrieval(built):
    idx, data = built
    scores, ids = idx.search(data[:20] * 10.0, k=1, ef_search=64)
    assert (ids[:, 0] == np.arange(20)).mean() >= 0.9


def test_save_load_roundtrip(built, tmp_path):
    idx, data = built
    path = str(tmp_path / "test.hnsw")
    idx.save(path)
    idx2 = HNSWIndex.load(path)
    assert len(idx2) == len(idx)
    rng = np.random.RandomState(2)
    q = rng.randn(5, 64).astype(np.float32)
    s1, i1 = idx.search(q, k=5)
    s2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)


def _clustered(rng, n, d, nc, sigma):
    centers = rng.randn(nc, d).astype(np.float32)
    return (centers[rng.randint(0, nc, n)]
            + sigma * rng.randn(n, d)).astype(np.float32), centers


def _recall(idx, vecs, q, k, ef):
    exact = np.argsort(-(q @ vecs.T), axis=1)[:, :k]
    _, I = idx.search(q, k, ef)
    return float(np.mean([len(set(I[i]) & set(exact[i])) / k
                          for i in range(len(q))]))


def test_recall_10k_mixed_distribution():
    """Diversified-neighbor graph quality at 10k rows: overlapping clusters
    (sigma 1.0 ~ cluster separation) are the hard regime for greedy routing."""
    rng = np.random.RandomState(7)
    vecs, centers = _clustered(rng, 10_000, 96, 256, 1.0)
    q = (centers[rng.randint(0, 256, 64)]
         + 1.0 * rng.randn(64, 96)).astype(np.float32)
    idx = HNSWIndex(96, M=32, ef_construction=100)
    idx.add(vecs)
    assert _recall(idx, vecs, q, 10, 128) >= 0.95


# Race regression (round-2 VERDICT #1): hnsw_search_batch used to share one
# generation-stamped visited table across OpenMP workers; concurrent
# begin_visit() calls collided on the generation counter, threads saw each
# other's visited marks, and exploration was silently pruned — 16 threads on
# a 20k index returned wrong neighbors for ~20/512 queries in 10/10 trials.
# The fix gives every worker its OWN VisitedTable, so batched search must be
# BIT-EQUAL to serial per-query search.  OMP_NUM_THREADS is read by libgomp
# at init, so the forced-16-thread run respawns in a subprocess; thread
# oversubscription on a 1-CPU host still interleaves enough to have
# reproduced the race reliably before the fix.
_RACE_SCRIPT = r"""
import os, sys
import numpy as np
sys.path.insert(0, {repo!r})
from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex, openmp_info
has_omp, nthreads = openmp_info()
assert nthreads == 16, f"OMP_NUM_THREADS not honored: {{nthreads}}"
rng = np.random.RandomState(0)
n, d = 20000, 64
data = rng.randn(n, d).astype(np.float32)
idx = HNSWIndex(d, M=16, ef_construction=100, seed=0)
idx.add(data)                      # parallel build (per-node locks)
q = rng.randn(512, d).astype(np.float32)
serial_s = np.empty((512, 10), np.float32)
serial_i = np.empty((512, 10), np.int64)
for i in range(512):               # nq=1 calls never enter the parallel loop
    ss, ii = idx.search(q[i:i+1], 10, 128)
    serial_s[i], serial_i[i] = ss[0], ii[0]
for trial in range(3):
    s, ids = idx.search(q, 10, 128)
    assert np.array_equal(ids, serial_i), (
        f"trial {{trial}}: batched search != serial "
        f"({{(ids != serial_i).any(axis=1).sum()}}/512 queries differ)")
    assert np.array_equal(s, serial_s)
exact = np.argsort(-(q @ data.T), axis=1)[:, :10]
rec = np.mean([len(set(serial_i[i]) & set(exact[i])) / 10 for i in range(512)])
assert rec >= 0.85, f"parallel-build recall too low: {{rec}}"
print(f"OK recall={{rec:.4f}}")
"""


def test_batched_search_race_free_16_threads():
    if not openmp_info()[0]:
        pytest.skip("libhnsw.so built without OpenMP")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, OMP_NUM_THREADS="16")
    r = subprocess.run([sys.executable, "-c", _RACE_SCRIPT.format(repo=repo)],
                       env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert r.stdout.startswith("OK")


def test_parallel_build_matches_serial_build_quality():
    """Build the same data with 1 thread and 4 threads (subprocess so libgomp
    re-reads OMP_NUM_THREADS); graphs differ node-by-node (insertion order is
    nondeterministic under locks, as in FAISS) but recall must not regress."""
    if not openmp_info()[0]:
        pytest.skip("libhnsw.so built without OpenMP")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import os, sys
import numpy as np
sys.path.insert(0, {repo!r})
from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex
rng = np.random.RandomState(3)
n, d = 8000, 64
data = rng.randn(n, d).astype(np.float32)
idx = HNSWIndex(d, M=16, ef_construction=100, seed=0)
idx.add(data)
q = rng.randn(64, d).astype(np.float32)
exact = np.argsort(-(q @ data.T), axis=1)[:, :10]
_, I = idx.search(q, 10, 128)
rec = np.mean([len(set(I[i]) & set(exact[i])) / 10 for i in range(64)])
print(rec)
"""
    recs = {}
    for nt in ("1", "4"):
        env = dict(os.environ, OMP_NUM_THREADS=nt)
        r = subprocess.run([sys.executable, "-c", script.format(repo=repo)],
                           env=env, capture_output=True, text=True,
                           timeout=600)
        assert r.returncode == 0, r.stderr
        recs[nt] = float(r.stdout.strip())
    assert recs["1"] >= 0.9, recs
    assert recs["4"] >= 0.9, recs


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("MDRT_RUN_SLOW"),
                    reason="~4 min build; set MDRT_RUN_SLOW=1")
def test_recall_100k():
    """Measured 2026-08: recall@10 = 1.000, recall@20 = 0.9996 at ef=128
    (M=32, efc=100, 100k x 96 overlapping clusters) — quoted in README.
    The reference's serving regime is efSearch=128
    (scripts/eval/eval_mhop_retrieval.py:96-119)."""
    rng = np.random.RandomState(1)
    vecs, centers = _clustered(rng, 100_000, 96, 512, 1.0)
    q = (centers[rng.randint(0, 512, 256)]
         + 1.0 * rng.randn(256, 96)).astype(np.float32)
    idx = HNSWIndex(96, M=32, ef_construction=100)
    idx.add(vecs)
    assert _recall(idx, vecs, q, 10, 128) >= 0.98
    assert _recall(idx, vecs, q, 20, 128) >= 0.98


def test_load_rejects_dim_mismatch_and_corrupt_header(tmp_path):
    """A caller-supplied wrong dim and a corrupt max_level header byte must
    both fail the load cleanly (review r3 — the first silently strode
    queries by the file dim, the second walked search() off the end of
    neighbors[])."""
    import struct
    import pytest
    from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex

    rng = np.random.RandomState(0)
    idx = HNSWIndex(dim=16, M=4, ef_construction=16, seed=0)
    idx.add(rng.randn(50, 16).astype(np.float32))
    path = str(tmp_path / "a.hnsw")
    idx.save(path)

    with pytest.raises(ValueError, match="dim"):
        HNSWIndex.load(path, dim=32)
    ok = HNSWIndex.load(path, dim=16)        # matching dim still fine
    assert ok.dim == 16

    blob = bytearray(open(path, "rb").read())
    blob[12:16] = struct.pack("<i", 1000)    # header[3] = max_level
    bad = str(tmp_path / "bad.hnsw")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(IOError):
        HNSWIndex.load(bad)


def test_simd_flag_gate_matches_host_cpu():
    """_host_simd_flags returns [-mavx2 -mfma] iff /proc/cpuinfo advertises
    both (measured 1.28x search win, PERF.md); and whatever it returns, the
    library it produced actually loads and answers correctly (the `built`
    fixtures above already prove that transitively — here we pin the gate
    logic itself so a refactor can't silently drop the SIMD build)."""
    from multihop_dense_retrieval_tpu.index.hnsw import _host_simd_flags
    flags = _host_simd_flags()
    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
    except OSError:
        assert flags == []
        return
    host_has = ("avx2" in info) and ("fma" in info)
    assert flags == (["-mavx2", "-mfma"] if host_has else [])


# Memory-safety regression: the whole native lifecycle under AddressSanitizer.
# The HNSW index is the one C++ component on the serving path; its round-2
# bug (shared visited table) was invisible to the Python tests until actively
# reproduced, so the C++ gets sanitizer coverage, not just behavioral tests.
# ASAN must be loaded before libc allocates, hence LD_PRELOAD + subprocess;
# detect_leaks=0 because LeakSanitizer would scan the whole CPython heap.
_ASAN_SCRIPT = r"""
import ctypes, os, struct, sys
import numpy as np

lib = ctypes.CDLL({lib!r})
lib.hnsw_new.restype = ctypes.c_void_p
lib.hnsw_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                         ctypes.c_uint64]
lib.hnsw_free.argtypes = [ctypes.c_void_p]
lib.hnsw_add_batch.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_float)]
lib.hnsw_size.restype = ctypes.c_int64
lib.hnsw_size.argtypes = [ctypes.c_void_p]
lib.hnsw_search_batch.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_float)]
lib.hnsw_save.restype = ctypes.c_int
lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
lib.hnsw_load.restype = ctypes.c_void_p
lib.hnsw_load.argtypes = [ctypes.c_char_p]

def fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

rng = np.random.RandomState(0)
d = 32
h = lib.hnsw_new(d, 8, 48, 0)
a = rng.randn(800, d).astype(np.float32)
b = rng.randn(700, d).astype(np.float32)
lib.hnsw_add_batch(h, 800, fptr(a))       # parallel build (OMP_NUM_THREADS=4)
lib.hnsw_add_batch(h, 700, fptr(b))       # second batch: growth paths
for i in range(16):                       # one-doc incremental (serving adds)
    v = rng.randn(1, d).astype(np.float32)
    lib.hnsw_add_batch(h, 1, fptr(v))
assert lib.hnsw_size(h) == 1516
q = rng.randn(64, d).astype(np.float32)
ids = np.empty((64, 5), np.int64)
scores = np.empty((64, 5), np.float32)
lib.hnsw_search_batch(h, 64, fptr(q), 5, 64,
                      ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                      fptr(scores))
assert (ids >= 0).all() and (ids < 1516).all()

path = os.path.join({tmp!r}, "asan.hnsw")
assert lib.hnsw_save(h, path.encode()) == 0
h2 = lib.hnsw_load(path.encode())
assert h2, "load of a good file failed"
lib.hnsw_search_batch(h2, 64, fptr(q), 5, 64,
                      ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                      fptr(scores))
lib.hnsw_free(h2)

# error paths free partially-built state — prime ASAN targets
blob = open(path, "rb").read()
trunc = os.path.join({tmp!r}, "trunc.hnsw")
open(trunc, "wb").write(blob[: len(blob) // 2])
assert not lib.hnsw_load(trunc.encode()), "truncated file must fail"
bad = bytearray(blob)
bad[-8:-4] = struct.pack("<i", 10**8)     # junk adjacency id near the tail
badp = os.path.join({tmp!r}, "bad.hnsw")
open(badp, "wb").write(bytes(bad))
assert not lib.hnsw_load(badp.encode()), "junk adjacency must fail"

lib.hnsw_free(h)
print("OK")
"""


def test_asan_clean_lifecycle(tmp_path):
    """Build/search/save/load/corrupt-load/free with -fsanitize=address and
    4 OpenMP threads: any heap overflow, use-after-free, or double-free in
    native/hnsw.cpp aborts the subprocess (halt_on_error)."""
    libasan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True).stdout.strip()
    if not os.path.isabs(libasan):
        pytest.skip("libasan.so not available")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "native", "hnsw.cpp")
    so = str(tmp_path / "libhnsw_asan.so")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fno-omit-frame-pointer",
         "-fsanitize=address", "-std=c++17", "-shared", "-fPIC",
         "-fopenmp", "-o", so, src],
        capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f"asan compile unavailable: {build.stderr[:200]}")
    env = dict(
        os.environ, LD_PRELOAD=libasan, OMP_NUM_THREADS="4",
        ASAN_OPTIONS="detect_leaks=0:halt_on_error=1:abort_on_error=0")
    r = subprocess.run(
        [sys.executable, "-c",
         _ASAN_SCRIPT.format(lib=so, tmp=str(tmp_path))],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "AddressSanitizer" not in r.stderr, r.stderr
    assert r.stdout.strip().endswith("OK")


def test_tsan_concurrent_build_and_search_clean(tmp_path):
    """Formal data-race-freedom: native/hnsw_tsan_driver.cpp drives the
    bucketed concurrent-insert path and concurrent searches with std::threads
    under -fsanitize=thread (libgomp is not TSAN-instrumented, so the driver
    substitutes std::thread for the OpenMP pragmas).  The harness is
    self-proving: a second build with slot_ld/slot_st degraded to plain
    accesses must make TSAN fire."""
    libtsan = subprocess.run(
        ["g++", "-print-file-name=libtsan.so"],
        capture_output=True, text=True).stdout.strip()
    if not os.path.isabs(libtsan):
        pytest.skip("libtsan.so not available")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(repo, "native")
    drv = str(tmp_path / "tsan_driver")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-fsanitize=thread",
         os.path.join(native, "hnsw_tsan_driver.cpp"), "-o", drv,
         "-lpthread"],
        capture_output=True, text=True, cwd=native)
    if build.returncode != 0:
        pytest.skip(f"tsan compile unavailable: {build.stderr[:200]}")
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1")
    r = subprocess.run([drv], env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "ThreadSanitizer" not in r.stderr, r.stderr
    assert r.stdout.strip().endswith("TSAN DRIVER OK")

    # self-check: degrade the atomic slot accessors to plain loads/stores —
    # the harness must detect that as a data race, or it guards nothing
    with open(os.path.join(native, "hnsw.cpp")) as f:
        src = f.read()
    degraded = src.replace(
        "return __atomic_load_n(p, __ATOMIC_RELAXED);", "return *p;"
    ).replace("__atomic_store_n(p, v, __ATOMIC_RELAXED);", "*p = v;")
    assert degraded != src, "slot accessor code moved — update this test"
    (tmp_path / "hnsw.cpp").write_text(degraded)
    with open(os.path.join(native, "hnsw_tsan_driver.cpp")) as f:
        drv_src = f.read()
    (tmp_path / "driver.cpp").write_text(drv_src)
    bad = str(tmp_path / "tsan_driver_degraded")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-fsanitize=thread",
         str(tmp_path / "driver.cpp"), "-o", bad, "-lpthread"],
        capture_output=True, text=True, cwd=str(tmp_path))
    assert build.returncode == 0, build.stderr
    r = subprocess.run([bad], env=dict(os.environ),
                       capture_output=True, text=True, timeout=600)
    assert "WARNING: ThreadSanitizer: data race" in r.stderr, (
        "degraded build did not trip TSAN — the harness lost its teeth")


def test_load_survives_random_corruption(tmp_path):
    """Fuzz the load validator: random byte flips and truncations must
    either load (flip landed in vector data) or fail cleanly with NULL —
    never crash or return an index that later segfaults.  Runs in a
    subprocess so a segfault fails the test instead of killing pytest."""
    idx = HNSWIndex(16, M=8, ef_construction=40, seed=0)
    idx.add(np.random.RandomState(0).randn(300, 16).astype(np.float32))
    path = str(tmp_path / "fuzz.hnsw")
    idx.save(path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import os, sys
import numpy as np
sys.path.insert(0, {repo!r})
from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex
blob = bytearray(open({path!r}, "rb").read())
rng = np.random.RandomState(7)
q = rng.randn(4, 16).astype(np.float32)
ok = bad = 0
for trial in range(200):
    mut = bytearray(blob)
    if trial % 5 == 4:
        mut = mut[: rng.randint(0, len(mut))]          # truncation
    else:
        for _ in range(rng.randint(1, 4)):             # byte flips
            mut[rng.randint(0, len(mut))] ^= 1 << rng.randint(0, 8)
    p = {path!r} + ".mut"
    open(p, "wb").write(bytes(mut))
    try:
        idx = HNSWIndex.load(p)
    except (IOError, ValueError):
        bad += 1
        continue
    s, i = idx.search(q, 3, 32)                        # must not crash
    assert i.shape == (4, 3)
    ok += 1
print(f"OK loaded={{ok}} rejected={{bad}}")
"""
    r = subprocess.run(
        [sys.executable, "-c", script.format(repo=repo, path=path)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert r.stdout.startswith("OK")


def test_load_rejects_populated_graph_with_no_layers(tmp_path):
    """Crafted file with n>0, a valid entry, max_level=-1 and nlev==0: every
    individual bound check passes but search() would index neighbors[0] on
    an empty vector (OOB UB) — the load validator must reject the
    combination outright (advisor r3, native/hnsw.cpp:490)."""
    import struct

    path = str(tmp_path / "nolayers.hnsw")
    n, d = 4, 16
    with open(path, "wb") as f:
        f.write(struct.pack("<4i", d, 8, 40, -1))        # dim M ef max_level
        f.write(struct.pack("<2q", n, 0))                # n, entry=0
        f.write(np.zeros(n * d, np.float32).tobytes())   # vectors
        f.write(np.zeros(n, np.int32).tobytes())         # levels (all 0)
        f.write(struct.pack("<i", 0))                    # nlev == 0
    with pytest.raises(IOError):
        HNSWIndex.load(path)
    # same file with a plausible nlev but max_level still -1 must also fail
    path2 = str(tmp_path / "badlevel.hnsw")
    with open(path2, "wb") as f:
        f.write(struct.pack("<4i", d, 8, 40, -1))
        f.write(struct.pack("<2q", n, 0))
        f.write(np.zeros(n * d, np.float32).tobytes())
        f.write(np.zeros(n, np.int32).tobytes())
        f.write(struct.pack("<i", 1))                    # nlev == 1
        f.write(struct.pack("<q", n * 2 * 8))            # level-0 adjacency
        f.write(np.full(n * 2 * 8, -1, np.int32).tobytes())
    with pytest.raises(IOError):
        HNSWIndex.load(path2)


def test_concurrent_add_and_search_are_serialized():
    """add() reallocates the native buffers a concurrent search() reads
    (ctypes releases the GIL) — HNSWIndex's shared/exclusive lock must make
    overlapping Python threads safe.  Without the lock this segfaults or
    returns ids outside the index."""
    import threading

    rng = np.random.RandomState(3)
    d = 32
    idx = HNSWIndex(d, M=8, ef_construction=40, seed=0)
    idx.add(rng.randn(500, d).astype(np.float32))
    stop = threading.Event()
    errs = []

    def adder():
        try:
            for _ in range(30):
                idx.add(rng.randn(200, d).astype(np.float32))
        except Exception as e:  # surfaced in the main thread below
            errs.append(e)
        finally:
            stop.set()

    q = rng.randn(8, d).astype(np.float32)
    t = threading.Thread(target=adder)
    t.start()
    while not stop.is_set():
        s, ids = idx.search(q, 5, ef_search=64)
        n_now = len(idx)
        assert ids.shape == (8, 5)
        assert np.all(ids >= 0) and np.all(ids < n_now + 200 * 30)
    t.join()
    assert not errs, errs
    assert len(idx) == 500 + 30 * 200


def test_recall_30k_default_suite():
    """Always-on recall regression (VERDICT r3: the 100k test never ran in
    CI behind MDRT_RUN_SLOW).  Same clustered family at 30k rows — ~1 min
    build — pinning the serving regime ef=128 (reference efSearch,
    scripts/eval/eval_mhop_retrieval.py:96-119)."""
    rng = np.random.RandomState(4)
    vecs, centers = _clustered(rng, 30_000, 96, 256, 1.0)
    q = (centers[rng.randint(0, 256, 128)]
         + 1.0 * rng.randn(128, 96)).astype(np.float32)
    idx = HNSWIndex(96, M=32, ef_construction=100)
    idx.add(vecs)
    assert _recall(idx, vecs, q, 10, 128) >= 0.98
