"""ctypes binding for the native HNSW index (native/hnsw.cpp).

Host-side approximate-MIPS serving path — parity with the reference's
`--hnsw` mode (eval_mhop_retrieval.py:96-119), used when no TPU is attached
or the index must live in host RAM.  The TPU path (ops/mips.py) is exact and
usually both faster and higher-recall; this exists for CPU-only serving and
API completeness.

The shared library is compiled on first use with g++ -O3 (and -fopenmp when
available) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from contextlib import contextmanager
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "hnsw.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libhnsw.so")

_lib = None


def _host_simd_flags() -> list:
    """[-mavx2 -mfma] when the host CPU supports both, else [].

    Measured (PERF.md): 256-bit AVX2+FMA dot products are 1.28x on search
    (1361 vs 1739 ms/256q, d=768) with bit-identical results, while
    -march=native (512-bit) REGRESSES on this virtualized host — so the
    256-bit subset is the sweet spot.  Gated on /proc/cpuinfo so the
    cached .so never contains instructions the host can't execute.
    """
    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        flags = set()
        for line in info.splitlines():
            if line.startswith("flags"):
                flags.update(line.split(":", 1)[1].split())
                break
        if "avx2" in flags and "fma" in flags:
            return ["-mavx2", "-mfma"]
    except OSError:
        pass  # non-Linux: stay portable, plain -O3
    return []


def _build() -> str:
    # staleness includes THIS file: flag changes here must trigger a rebuild
    src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(__file__))
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
        return _LIB
    # compile to a per-process temp name + atomic rename: two processes
    # racing on a fresh checkout must never CDLL a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    simd = _host_simd_flags()
    variants = ([simd + ["-fopenmp"], ["-fopenmp"], simd, []]
                if simd else [["-fopenmp"], []])
    for flags in variants:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", tmp, _SRC] + flags
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, _LIB)
            return _LIB
        except FileNotFoundError as e:       # g++ itself absent
            raise RuntimeError(
                "failed to build libhnsw.so: g++ not found on PATH") from e
        except subprocess.CalledProcessError as e:
            last_err = e.stderr.decode()
    raise RuntimeError(f"failed to build libhnsw.so:\n{last_err}")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
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
    lib.hnsw_has_openmp.restype = ctypes.c_int
    lib.hnsw_has_openmp.argtypes = []
    lib.hnsw_max_threads.restype = ctypes.c_int
    lib.hnsw_max_threads.argtypes = []
    _lib = lib
    return lib


def openmp_info() -> Tuple[bool, int]:
    """(compiled_with_openmp, max_threads) — build and batched search run
    multi-threaded when True; both are race-safe (per-thread visited tables,
    per-node adjacency locks) WITHIN one call.  add vs search on one handle
    must not overlap — HNSWIndex enforces that with a shared/exclusive
    lock, because ctypes releases the GIL and the native add reallocates
    the buffers a concurrent search reads."""
    lib = _load()
    return bool(lib.hnsw_has_openmp()), int(lib.hnsw_max_threads())


class _SharedExclusiveLock:
    """Tiny readers-writer lock: searches run concurrently (shared), adds
    exclude everything.  Writer-preferring — new readers queue behind a
    waiting writer, otherwise a steady stream of searches starves add()
    forever."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    @contextmanager
    def shared(self):
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1
        try:
            yield
        finally:
            with self._cond:
                self._readers -= 1
                if not self._readers:
                    self._cond.notify_all()

    @contextmanager
    def exclusive(self):
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writer or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writer = True
        try:
            yield
        finally:
            with self._cond:
                self._writer = False
                self._cond.notify_all()


class HNSWIndex:
    """Approximate MIPS over host RAM.  add() then search() like FAISS.

    Thread-safe: concurrent search() calls run in parallel; add() takes an
    exclusive lock because the native insert reallocates the graph buffers
    a concurrent search would read (ctypes releases the GIL, so Python
    threads really do overlap in the native code)."""

    def __init__(self, dim: int, M: int = 32, ef_construction: int = 200,
                 seed: int = 0, _handle=None):
        self._lib = _load()
        self.dim = dim
        self._lock = _SharedExclusiveLock()
        self._h = _handle if _handle is not None else self._lib.hnsw_new(
            dim, M, ef_construction, seed)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hnsw_free(self._h)
            self._h = None

    def __len__(self) -> int:
        with self._lock.shared():
            return int(self._lib.hnsw_size(self._h))

    def add(self, vectors: np.ndarray):
        v = np.ascontiguousarray(vectors, np.float32)
        assert v.ndim == 2 and v.shape[1] == self.dim
        with self._lock.exclusive():
            self._lib.hnsw_add_batch(
                self._h, v.shape[0],
                v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    def search(self, queries: np.ndarray, k: int,
               ef_search: int = 128) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores (B, k) fp32 inner products, ids (B, k) int64)."""
        q = np.ascontiguousarray(queries, np.float32)
        assert q.ndim == 2 and q.shape[1] == self.dim
        nq = q.shape[0]
        ids = np.empty((nq, k), np.int64)
        scores = np.empty((nq, k), np.float32)
        with self._lock.shared():
            self._lib.hnsw_search_batch(
                self._h, nq,
                q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                k, ef_search,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return scores, ids

    def save(self, path: str):
        with self._lock.shared():  # save reads; add (the writer) excludes
            rc = self._lib.hnsw_save(self._h, path.encode())
        if rc != 0:
            raise IOError(f"hnsw_save failed: {path}")

    @classmethod
    def load(cls, path: str, dim: Optional[int] = None) -> "HNSWIndex":
        lib = _load()
        h = lib.hnsw_load(path.encode())
        if not h:
            raise IOError(f"hnsw_load failed: {path}")
        # dim is stored in the file header; re-read it cheaply
        with open(path, "rb") as f:
            import struct

            file_dim = struct.unpack("<i", f.read(4))[0]
        if dim is not None and dim != file_dim:
            lib.hnsw_free(h)
            raise ValueError(
                f"index file has dim={file_dim}, caller expected {dim} — "
                "the native handle strides queries by the FILE dim, so a "
                "mismatch silently scores the wrong memory")
        return cls(file_dim, _handle=h)
