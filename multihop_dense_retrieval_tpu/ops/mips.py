"""Exact maximum-inner-product search (MIPS) over a device-resident index.

TPU-native replacement for FAISS `IndexFlatIP.search`
(scripts/eval/eval_mhop_retrieval.py:121,155,179).  The index lives in HBM as
a (N, D) bf16 array (row-sharded over the mesh `index` axis for multi-chip);
search streams it through the MXU in row chunks and keeps a running top-k, so
the (B, N) score matrix is never materialized.

Four tiers (all measured on TPU v5e, 5.2M×768 rows, B=96 — see memory/
PARITY.md for the experiments):

  * `mips_topk_xla`         — lax.scan over chunks: matmul + lax.top_k merge.
                               Portable (CPU tests); ~244 GB/s.
  * `mips_topk_pallas`      — fused Pallas kernel: chunk scores stay in VMEM,
                               the running top-k merge runs only for chunks
                               that can beat the current k-th best.  At k=1 it
                               reaches ~95% of HBM bandwidth (10.3 ms/5.2M
                               rows) — speed-of-light for exact search.
  * `mips_topk_pallas_int8` — per-row symmetric int8: half the bytes, int8
                               MXU; 8.4 ms/5.2M at 97.4% recall@10 vs exact
                               (100% top-1 agreement).
  * `mips_topk_two_phase`   — exact large-k search: chunk-max scan at the
                               k=1 rate + scalar-prefetch rescan of each
                               query's top-k chunks (k=8: 9.6 vs 28.6 ms at
                               B=192 over 5.2M int8 rows).  Dispatched for
                               k >= 8 (at k<=4 the pipeline-context win
                               evaporates — see dispatcher comment).
  * `mips_topk_pca`         — PCA-prefiltered cascade with per-query
                               EXACTNESS CERTIFICATES (FAISS
                               IndexPreTransform+IndexRefine, TPU-native):
                               chunk-max scan over a rank-R projection
                               (R/D of the bytes+flops), Cauchy-Schwarz
                               upper bounds, full-D rescan of the top
                               chunks; a static certificate replaces
                               dynamic early termination.
  * `sharded_mips_topk`     — shard_map wrapper: per-shard top-k, global row
                               ids, all-gather of the (B, k) candidates over
                               ICI and a final cheap merge.

All scores are computed in fp32 (MXU accumulates bf16×bf16→fp32 and
int8×int8→int32).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import INDEX_AXIS

NEG_INF = -3.0e38  # python float: safe to close over inside pallas kernels

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16MB VMEM limit


def auto_chunk_rows(b: int, d: int, itemsize: int = 2,
                    max_chunk: int = 8192) -> int:
    """Largest power-of-two chunk whose double-buffered tile + score matrix
    + merge temporaries fit in VMEM for a (b, d) query block."""
    chunk = max_chunk
    while chunk > 512:
        need = 2 * chunk * d * itemsize      # double-buffered index tile
        need += 3 * b * chunk * 4            # scores + merge work vals/idx
        if need <= VMEM_BUDGET:
            return chunk
        chunk //= 2
    # the floor chunk can STILL overflow VMEM for huge query blocks — tell
    # the dispatcher to take the XLA tier instead of shipping a kernel
    # that fails Mosaic compilation (or thrashes)
    need = 2 * chunk * d * itemsize + 3 * b * chunk * 4
    return chunk if need <= VMEM_BUDGET else 0


def _merge_topk(vals_a, idx_a, vals_b, idx_b, k: int):
    """Merge two (B, ka)/(B, kb) candidate sets into top-k."""
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    idxs = jnp.concatenate([idx_a, idx_b], axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idxs, pos, axis=1)


# --------------------------------------------------------------------------
# Tier 1: XLA chunked scan
# --------------------------------------------------------------------------


def _valid_bound(n: int, n_valid: Optional[int], n_valid_dyn):
    """Resolve the row-validity bound: a traced scalar (`n_valid_dyn`) wins
    over the static `n_valid`; returns None when no masking is needed."""
    if n_valid_dyn is not None:
        return n_valid_dyn
    if n_valid is not None and n_valid < n:
        return n_valid
    return None


@functools.partial(jax.jit, static_argnames=("k", "chunk_rows", "n_valid"))
def mips_topk_xla(index: jnp.ndarray, queries: jnp.ndarray, k: int,
                  chunk_rows: int = 131072,
                  n_valid: Optional[int] = None,
                  n_valid_dyn=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner products of `queries` (B, D) against `index` (N, D).

    Returns (scores (B, k) fp32, row ids (B, k) int32).  N must be a multiple
    of `chunk_rows` or is padded virtually by clamping the chunk count; for
    simplicity we require the caller to pad the index (index/store.py pads
    with -inf-normed rows and remembers the true N).  `n_valid_dyn` is a
    traced int32 scalar alternative to the static `n_valid` (used by the
    sharded path, where the bound depends on the traced shard id).
    """
    n, d = index.shape
    b = queries.shape[0]
    bound = _valid_bound(n, n_valid, n_valid_dyn)
    chunk_rows = min(chunk_rows, n)
    num_chunks = n // chunk_rows
    rem = n - num_chunks * chunk_rows
    q = queries.astype(index.dtype)

    def scores_of(chunk):  # (C, D) -> (B, C) fp32
        return jax.lax.dot_general(
            q, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def step(carry, i):
        vals, idxs = carry
        chunk = jax.lax.dynamic_slice(index, (i * chunk_rows, 0), (chunk_rows, d))
        s = scores_of(chunk)
        if bound is not None:  # mask padding rows
            col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_rows), 1)
            s = jnp.where(col + i * chunk_rows < bound, s, NEG_INF)
        kk = min(k, chunk_rows)
        c_vals, c_idx = jax.lax.top_k(s, kk)
        c_idx = c_idx + i * chunk_rows
        vals, idxs = _merge_topk(vals, idxs, c_vals, c_idx, k)
        return (vals, idxs), None

    init = (jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.zeros((b, k), jnp.int32))
    (vals, idxs), _ = jax.lax.scan(step, init, jnp.arange(num_chunks))
    if rem:
        s = scores_of(index[num_chunks * chunk_rows:])
        if bound is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, rem), 1)
            s = jnp.where(col + num_chunks * chunk_rows < bound, s, NEG_INF)
        c_vals, c_idx = jax.lax.top_k(s, min(k, rem))
        vals, idxs = _merge_topk(vals, idxs, c_vals,
                                 c_idx + num_chunks * chunk_rows, k)
    return vals, idxs


# --------------------------------------------------------------------------
# Tier 2: Pallas fused kernel
# --------------------------------------------------------------------------


def _merge_chunk_topk(scores, step, nv_ref, vals_ref, idx_ref, k: int,
                      chunk_rows: int, mask_valid: bool, k_eff):
    """Shared tail of the fused kernels: mask padding rows, then merge this
    chunk's scores into the running (B, K) top-k refs.

    `lax.top_k` does not lower in Mosaic, so the merge is K rounds of
    max → one-hot select (ties broken toward the smallest column, matching
    lax.top_k/FAISS ordering).  The merge runs only when the chunk can beat
    some row's current k-th best — for large N almost every chunk is
    skipped, so the steady-state cost is the scoring alone.  ONE definition
    serves the bf16 and int8 tiers (a tie-break or pad fix applied to one
    copy would silently de-sync the other).
    """
    if mask_valid:  # mask padding rows (bound is an SMEM scalar: the
        # sharded path passes a per-shard value computed from the shard id)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + step * chunk_rows < nv_ref[0], scores, NEG_INF)

    k_eff = k if k_eff is None else k_eff
    chunk_best = jnp.max(scores, axis=1)          # (B,)
    # only the first k_eff columns are live results (sorted desc); running
    # merge rounds for the padded layout columns would waste VPU time
    kth_best = vals_ref[:, k_eff - 1]
    improves = jnp.any(chunk_best > kth_best)

    @pl.when(improves)
    def _merge():
        b = scores.shape[0]
        c = scores.shape[1]
        work_vals = jnp.concatenate([vals_ref[:], scores], axis=1)  # (B, K+C)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, k + c), 1)
        # global row id for each column: first K columns carry the running
        # idx_ref, the rest map to this chunk's rows
        work_idx = jnp.concatenate(
            [idx_ref[:],
             jax.lax.broadcasted_iota(jnp.int32, (b, c), 1) + step * chunk_rows],
            axis=1)
        new_vals, new_idx = [], []
        for _ in range(k_eff):
            m = jnp.max(work_vals, axis=1, keepdims=True)            # (B, 1)
            at_max = work_vals == m
            sel_col = jnp.min(jnp.where(at_max, col_ids, jnp.int32(2**30)),
                              axis=1, keepdims=True)
            onehot = col_ids == sel_col
            new_vals.append(m[:, 0])
            new_idx.append(jnp.sum(jnp.where(onehot, work_idx, 0), axis=1))
            work_vals = jnp.where(onehot, NEG_INF, work_vals)
        pad = k - k_eff
        if pad:
            new_vals += [jnp.full((b,), NEG_INF, jnp.float32)] * pad
            new_idx += [jnp.zeros((b,), jnp.int32)] * pad
        vals_ref[:] = jnp.stack(new_vals, axis=1)
        idx_ref[:] = jnp.stack(new_idx, axis=1)


def _mips_kernel(q_ref, chunk_ref, nv_ref, vals_ref, idx_ref, k: int,
                 chunk_rows: int, mask_valid: bool, k_eff: int = None):
    """One grid step: score a (C, D) chunk against (B, D) queries and merge
    into the running (B, K) top-k carried in the output refs
    (_merge_chunk_topk).  Steady state is the matmul alone (MXU/HBM bound).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    scores = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, C)
    _merge_chunk_topk(scores, step, nv_ref, vals_ref, idx_ref, k,
                      chunk_rows, mask_valid, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "chunk_rows", "interpret", "n_valid"))
def mips_topk_pallas(index: jnp.ndarray, queries: jnp.ndarray, k: int,
                     chunk_rows: int = 4096, interpret: bool = False,
                     n_valid: Optional[int] = None,
                     n_valid_dyn=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused matmul + streaming top-k.  Requires N % chunk_rows == 0
    (index/store.py pads the index); k is rounded up to a multiple of 8
    internally for layout friendliness, extra columns are dropped."""
    n, d = index.shape
    b = queries.shape[0]
    if n % chunk_rows:
        raise ValueError(f"index rows {n} not a multiple of chunk {chunk_rows}")
    if k > chunk_rows:
        raise ValueError(
            f"k={k} exceeds chunk_rows={chunk_rows}: the kernel tracks at "
            "most one chunk of candidates and would silently return "
            f"{chunk_rows} columns — raise chunk_rows or use mips_topk")
    k_pad = max(8, -(-k // 8) * 8)
    k_pad = min(k_pad, chunk_rows)
    num_chunks = n // chunk_rows
    q = queries.astype(index.dtype)
    bound = _valid_bound(n, n_valid, n_valid_dyn)
    nv = jnp.asarray([n if bound is None else bound], jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    vals, idxs = pl.pallas_call(
        functools.partial(_mips_kernel, k=k_pad, chunk_rows=chunk_rows,
                          mask_valid=bound is not None, k_eff=k),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * index.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, index, nv)
    return vals[:, :k], idxs[:, :k]


# --------------------------------------------------------------------------
# Int8-quantized tier: 2x less HBM traffic, int8 MXU at 2x bf16 rate
# --------------------------------------------------------------------------


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8 quantization: returns (int8 values, f32 scales).

    score(q, x_i) ≈ q_scale · x_scale_i · (q_int8 · x_int8_i); per-row scales
    keep the relative ranking of inner products nearly exact (recall parity
    is asserted in tests/bench).
    """
    x = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def _mips_kernel_int8(q_ref, qscale_ref, chunk_ref, dscale_ref, nv_ref,
                      vals_ref, idx_ref, k: int, chunk_rows: int,
                      mask_valid: bool, k_eff: int = None):
    """Int8 variant of _mips_kernel: int8×int8→int32 on the MXU, then
    dequantize with per-query × per-doc scales before the running merge."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    raw = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, C) int32
    scores = (raw.astype(jnp.float32)
              * qscale_ref[:]            # (B, 1)
              * dscale_ref[:].reshape(1, -1))  # (1, C)
    _merge_chunk_topk(scores, step, nv_ref, vals_ref, idx_ref, k,
                      chunk_rows, mask_valid, k_eff)


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk_rows", "interpret", "n_valid"))
def mips_topk_pallas_int8(index_int8: jnp.ndarray, doc_scales: jnp.ndarray,
                          queries: jnp.ndarray, k: int,
                          chunk_rows: int = 4096, interpret: bool = False,
                          n_valid: Optional[int] = None,
                          n_valid_dyn=None):
    """Fused int8 MIPS: `index_int8` (N, D) int8 with per-row `doc_scales`
    (N,) f32; queries fp32/bf16 are quantized in-jit."""
    n, d = index_int8.shape
    b = queries.shape[0]
    if n % chunk_rows:
        raise ValueError(f"index rows {n} not a multiple of chunk {chunk_rows}")
    if k > chunk_rows:
        raise ValueError(
            f"k={k} exceeds chunk_rows={chunk_rows}: the kernel tracks at "
            "most one chunk of candidates and would silently return "
            f"{chunk_rows} columns — raise chunk_rows or use mips_topk")
    k_pad = min(max(8, -(-k // 8) * 8), chunk_rows)
    num_chunks = n // chunk_rows
    bound = _valid_bound(n, n_valid, n_valid_dyn)
    nv = jnp.asarray([n if bound is None else bound], jnp.int32)

    q_int8, q_scales = quantize_rows(queries)
    q_scales = q_scales.reshape(b, 1)
    # scales packed (N/128, 128): a (C,1) layout would be tile-padded to 128
    # lanes and read 128x the bytes (measured 2x slower end to end)
    lanes = 128
    if n % lanes:
        raise ValueError(f"int8 index rows {n} must be a multiple of {lanes}")
    if chunk_rows < 8 * lanes and chunk_rows != n and not interpret:
        # Mosaic block sublane constraint: the packed-scales block
        # (chunk_rows/128, 128) needs >= 8 sublanes (or the full array) —
        # real-TPU lowering fails below chunk_rows=1024 (the dispatcher
        # falls back to the XLA tier instead)
        raise ValueError(f"int8 pallas kernel needs chunk_rows >= 1024 "
                         f"(got {chunk_rows}); use mips_topk_xla_int8")
    dsc = doc_scales.astype(jnp.float32).reshape(n // lanes, lanes)

    grid_spec = pl.GridSpec(
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows // lanes, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    vals, idxs = pl.pallas_call(
        functools.partial(_mips_kernel_int8, k=k_pad, chunk_rows=chunk_rows,
                          mask_valid=bound is not None, k_eff=k),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_int8, q_scales, index_int8, dsc, nv)
    return vals[:, :k], idxs[:, :k]


@functools.partial(jax.jit, static_argnames=("k", "chunk_rows", "n_valid"))
def mips_topk_xla_int8(index_int8, doc_scales, queries, k: int,
                       chunk_rows: int = 65536,
                       n_valid: Optional[int] = None,
                       n_valid_dyn=None):
    """Portable int8 path (CPU tests / non-pallas fallback)."""
    n, d = index_int8.shape
    b = queries.shape[0]
    bound = _valid_bound(n, n_valid, n_valid_dyn)
    q_int8, q_scales = quantize_rows(queries)
    chunk_rows = min(chunk_rows, n)
    num_chunks = n // chunk_rows
    rem = n - num_chunks * chunk_rows

    def scores_of(chunk, dsc):
        raw = jax.lax.dot_general(
            q_int8, chunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return raw.astype(jnp.float32) * q_scales.reshape(b, 1) * dsc[None, :]

    def step(carry, i):
        vals, idxs = carry
        chunk = jax.lax.dynamic_slice(index_int8, (i * chunk_rows, 0),
                                      (chunk_rows, d))
        dsc = jax.lax.dynamic_slice(doc_scales, (i * chunk_rows,),
                                    (chunk_rows,))
        s = scores_of(chunk, dsc)
        if bound is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_rows), 1)
            s = jnp.where(col + i * chunk_rows < bound, s, NEG_INF)
        c_vals, c_idx = jax.lax.top_k(s, min(k, chunk_rows))
        return _merge_topk(vals, idxs, c_vals, c_idx + i * chunk_rows, k), None

    init = (jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.zeros((b, k), jnp.int32))
    (vals, idxs), _ = jax.lax.scan(step, init, jnp.arange(num_chunks))
    if rem:
        s = scores_of(index_int8[num_chunks * chunk_rows:],
                      doc_scales[num_chunks * chunk_rows:])
        if bound is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, rem), 1)
            s = jnp.where(col + num_chunks * chunk_rows < bound, s, NEG_INF)
        c_vals, c_idx = jax.lax.top_k(s, min(k, rem))
        vals, idxs = _merge_topk(vals, idxs, c_vals,
                                 c_idx + num_chunks * chunk_rows, k)
    return vals, idxs


# --------------------------------------------------------------------------
# Two-phase exact top-k (k > 1): chunk-max scan + pallas sparse rescan
# --------------------------------------------------------------------------
#
# The running-merge kernels above degrade for k > 1 at large batch: with B
# independent queries SOME row improves its top-k on almost every chunk, so
# the gated merge fires constantly (measured: int8 k=8 at B=192 runs 4.4x
# slower than k=1).  Two-phase search removes the merge from the streaming
# pass entirely:
#
#   phase 1 — stream the index once computing only per-chunk row maxima:
#             pure matmul + max, runs at the k=1 rate;
#   phase 2 — rescan each query's top-k chunks BY MAX with a scalar-
#             prefetch pallas kernel whose chunk DMA is driven by the
#             selected chunk ids (XLA-level gather + batched matvec was
#             measured 0.2-0.5x the single-pass kernel — DMA-granularity
#             matters).
#
# Exactness: if value v is among a query's global top-k, its chunk's max is
# >= v >= (global k-th value); every chunk ranked above that chunk by max
# contributes its own max, itself a top-k value — so the top-k chunks by
# max cover all top-k values.  (With EXACT score ties across more than k
# chunks the covering-chunk choice may differ from the single-pass kernels;
# the returned values are still an exact top-k set.)

_MAXBLOCK = 128  # Mosaic wants >=8x128-aligned (or full) output blocks


def _chunk_max_kernel(q_ref, chunk_ref, nv_ref, out_ref, chunk_rows: int,
                      mask_valid: bool):
    step = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if mask_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + step * chunk_rows < nv_ref[0], scores,
                           NEG_INF)
    # transposed layout: each step stores its (1, B) row into a 128-row
    # block revisited by 128 consecutive steps
    out_ref[pl.ds(step % _MAXBLOCK, 1), :] = jnp.max(scores, axis=1)[None, :]


def _chunk_max_kernel_int8(q_ref, chunk_ref, dscale_ref, nv_ref, out_ref,
                           chunk_rows: int, mask_valid: bool):
    step = pl.program_id(0)
    raw = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # per-doc scales only: the per-QUERY scale is a positive per-row
    # constant (ranking-invariant), folded in during phase 2
    scores = raw.astype(jnp.float32) * dscale_ref[:].reshape(1, -1)
    if mask_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + step * chunk_rows < nv_ref[0], scores,
                           NEG_INF)
    out_ref[pl.ds(step % _MAXBLOCK, 1), :] = jnp.max(scores, axis=1)[None, :]


def _select_row(block, row):
    """(1, C) row of an (8, C) block via mask+reduce: Mosaic cannot prove
    alignment for dynamic sublane loads (int8 tiles especially)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 0)
    return jnp.sum(jnp.where(lane == row, block, 0.0), axis=0,
                   keepdims=True)


def _rescan_kernel(ids_ref, nv_ref, q_ref, chunk_ref, out_ref,
                   chunk_rows: int, k_chunks: int, mask_valid: bool):
    """Grid (B, k_chunks): score query b against its kk-th selected chunk.
    `ids_ref` is scalar-prefetched, so the chunk block DMA follows it.
    The whole 8-query block is scored (the kernel is DMA-bound; a single
    dynamic sublane load does not lower) and query b's row selected."""
    b = pl.program_id(0)
    kk = pl.program_id(1)
    scores8 = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (8, C)
    scores = _select_row(scores8, b % 8)                 # (1, C)
    if mask_valid:
        row0 = ids_ref[b, kk] * chunk_rows
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + row0 < nv_ref[0], scores, NEG_INF)
    step = b * k_chunks + kk
    out_ref[pl.ds(step % 8, 1), :] = scores


def _rescan_kernel_int8(ids_ref, nv_ref, q_ref, chunk_ref, dscale_ref,
                        out_ref, chunk_rows: int, k_chunks: int,
                        mask_valid: bool):
    b = pl.program_id(0)
    kk = pl.program_id(1)
    raw8 = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                    # (8, C) int32
    raw = _select_row(raw8.astype(jnp.float32), b % 8)
    dsc = _select_row(dscale_ref[:], ids_ref[b, kk] % 8)
    scores = raw * dsc
    if mask_valid:
        row0 = ids_ref[b, kk] * chunk_rows
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + row0 < nv_ref[0], scores, NEG_INF)
    step = b * k_chunks + kk
    out_ref[pl.ds(step % 8, 1), :] = scores


def _sparse_rescan(chunk_ids, nv, q_prepped, index, dsc_rows, *,
                   chunk_rows: int, k_chunks: int, mask_valid: bool,
                   interpret: bool):
    """Phase 2 shared by the two-phase and PCA tiers: score each query
    against its `k_chunks` selected row-chunks with the scalar-prefetch
    rescan kernels (chunk DMA driven by `chunk_ids`).  Returns RAW
    (B, k_chunks*chunk_rows) fp32 scores — int8 per-QUERY scales are a
    positive per-row factor and are folded in by the caller."""
    b = q_prepped.shape[0]
    d = index.shape[1]
    is_int8 = index.dtype == jnp.int8
    if is_int8 and dsc_rows.shape[0] % 8:
        # the (8, chunk_rows) scale block needs 8 sublanes on real Mosaic;
        # chunk ids never reach the pad rows (they index < num_chunks)
        pad = 8 - dsc_rows.shape[0] % 8
        dsc_rows = jnp.concatenate(
            [dsc_rows, jnp.zeros((pad, dsc_rows.shape[1]),
                                 dsc_rows.dtype)])
    rows_out = b * k_chunks
    rows_pad = -(-rows_out // 8) * 8
    out_spec = pl.BlockSpec(
        (8, chunk_rows),
        lambda bb, kk, *_: ((bb * k_chunks + kk) // 8, 0),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows_pad, chunk_rows), jnp.float32)
    if is_int8:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # chunk_ids, nv
            grid=(b, k_chunks),
            in_specs=[
                pl.BlockSpec((8, d), lambda bb, kk, ids, nv_: (bb // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_rows, d),
                             lambda bb, kk, ids, nv_: (ids[bb, kk], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, chunk_rows),
                             lambda bb, kk, ids, nv_: (ids[bb, kk] // 8, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec)
        scores = pl.pallas_call(
            functools.partial(_rescan_kernel_int8, chunk_rows=chunk_rows,
                              k_chunks=k_chunks, mask_valid=mask_valid),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(chunk_ids, nv, q_prepped, index, dsc_rows)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, k_chunks),
            in_specs=[
                pl.BlockSpec((8, d), lambda bb, kk, ids, nv_: (bb // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_rows, d),
                             lambda bb, kk, ids, nv_: (ids[bb, kk], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec)
        scores = pl.pallas_call(
            functools.partial(_rescan_kernel, chunk_rows=chunk_rows,
                              k_chunks=k_chunks, mask_valid=mask_valid),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(chunk_ids, nv, q_prepped, index)
    return scores[:rows_out].reshape(b, k_chunks * chunk_rows)


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk_rows", "interpret", "n_valid"))
def mips_topk_two_phase(index: jnp.ndarray, queries: jnp.ndarray, k: int,
                        chunk_rows: int = 2048, interpret: bool = False,
                        n_valid: Optional[int] = None,
                        n_valid_dyn=None,
                        doc_scales: Optional[jnp.ndarray] = None):
    """Exact top-k for k > 1 via chunk-max scan + scalar-prefetch rescan
    (see section comment).  bf16/fp32 and int8 (+doc_scales) indexes.
    Requires B % 8 == 0 (query blocks are 8-row tiles)."""
    n, d = index.shape
    b = queries.shape[0]
    if n % chunk_rows:
        raise ValueError(f"index rows {n} not a multiple of chunk {chunk_rows}")
    if b % 8:
        raise ValueError(f"two-phase search needs batch % 8 == 0, got {b}")
    num_chunks = n // chunk_rows
    k_chunks = min(k, num_chunks)
    bound = _valid_bound(n, n_valid, n_valid_dyn)
    mask_valid = bound is not None
    nv = jnp.asarray([n if bound is None else bound], jnp.int32)
    is_int8 = index.dtype == jnp.int8
    nc_pad = -(-num_chunks // _MAXBLOCK) * _MAXBLOCK
    max_out_spec = pl.BlockSpec((_MAXBLOCK, b), lambda i: (i // _MAXBLOCK, 0),
                                memory_space=pltpu.VMEM)
    max_out_shape = jax.ShapeDtypeStruct((nc_pad, b), jnp.float32)

    # ---- phase 1: per-chunk row maxima, stored (num_chunks, B) ----------
    if is_int8:
        assert doc_scales is not None, "int8 index requires doc_scales"
        q_int8, q_scales = quantize_rows(queries)
        lanes = 128
        dsc_packed = doc_scales.astype(jnp.float32).reshape(n // lanes, lanes)
        maxima_t = pl.pallas_call(
            functools.partial(_chunk_max_kernel_int8, chunk_rows=chunk_rows,
                              mask_valid=mask_valid),
            grid_spec=pl.GridSpec(
                grid=(num_chunks,),
                in_specs=[
                    pl.BlockSpec((b, d), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk_rows, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk_rows // lanes, lanes),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=max_out_spec),
            out_shape=max_out_shape,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d, bytes_accessed=n * d + b * d * 4,
                transcendentals=0),
            interpret=interpret,
        )(q_int8, index, dsc_packed, nv)
    else:
        q = queries.astype(index.dtype)
        maxima_t = pl.pallas_call(
            functools.partial(_chunk_max_kernel, chunk_rows=chunk_rows,
                              mask_valid=mask_valid),
            grid_spec=pl.GridSpec(
                grid=(num_chunks,),
                in_specs=[
                    pl.BlockSpec((b, d), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk_rows, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=max_out_spec),
            out_shape=max_out_shape,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d * index.dtype.itemsize + b * d * 4,
                transcendentals=0),
            interpret=interpret,
        )(q, index, nv)
    maxima = maxima_t[:num_chunks].T                    # (B, num_chunks)

    # ---- phase 2: rescan each query's top-k chunks ----------------------
    _, chunk_ids = jax.lax.top_k(maxima, k_chunks)      # (B, k_chunks)
    chunk_ids = chunk_ids.astype(jnp.int32)
    if is_int8:
        dsc_rows = doc_scales.astype(jnp.float32).reshape(num_chunks,
                                                          chunk_rows)
        scores = _sparse_rescan(chunk_ids, nv, q_int8, index, dsc_rows,
                                chunk_rows=chunk_rows, k_chunks=k_chunks,
                                mask_valid=mask_valid, interpret=interpret)
        scores = scores * q_scales.reshape(b, 1)
    else:
        scores = _sparse_rescan(chunk_ids, nv, q, index, None,
                                chunk_rows=chunk_rows, k_chunks=k_chunks,
                                mask_valid=mask_valid, interpret=interpret)

    row_ids = (chunk_ids[:, :, None] * chunk_rows
               + jnp.arange(chunk_rows, dtype=jnp.int32)[None, None, :]
               ).reshape(b, k_chunks * chunk_rows)
    vals, pos = jax.lax.top_k(scores, k)
    return vals, jnp.take_along_axis(row_ids, pos, axis=1)


# --------------------------------------------------------------------------
# PCA-prefiltered candidate search with per-query exactness certificates
# --------------------------------------------------------------------------
#
# FAISS pairs approximate prefilters with exact refinement
# (IndexPreTransform(PCAMatrix) + IndexRefineFlat); the reference ships only
# flat + HNSW (scripts/eval/eval_mhop_retrieval.py:96-119).  This tier is the
# TPU-native version of that cascade, replacing dynamic early termination
# (XLA-hostile) with a static per-query CERTIFICATE:
#
#   build    — learn an UNCENTERED orthogonal rotation V (D, R) from the
#              corpus spectrum; store P = X_store·V (N, R) bf16 plus four
#              per-chunk fp32 bounds (see build_pca_prefilter).
#   phase 1  — chunk-max scan over P (R/D of the flops AND bytes of a full
#              scan) at `cand_rows` granularity.
#   bound    — for every row r in chunk c, with x = X_store[r] and ideal
#              fp32 query q:
#                s(r) = q_used·x                      (q_used: bf16 / int8-deq
#                                                      query phase 2 scores)
#                     = q·x − (q − q_used)·x
#                     = q_proj·(x·V) + q_perp·x_perp − (q − q_used)·x
#              so  s(r) ≤ maxp[c]                      (kernel: P_bf16·qp_bf16)
#                       + ‖q_perp‖·resid[c]           (Cauchy-Schwarz)
#                       + ‖q_proj‖·delta[c]           (P fp32→bf16 rounding)
#                       + ‖q_proj − bf16(q_proj)‖·pnorm[c]   (query rounding,
#                                                       computed EXACTLY)
#                       + ‖q − q_used‖·xnorm[c]       (phase-2 query error,
#                                                       computed EXACTLY)
#              =: ub[c].  Only fp32 accumulation reorder is unaccounted.
#   phase 2  — exact full-D rescan of each query's top-`k_chunks` chunks by
#              ub (shared scalar-prefetch kernel), then top-k.
#   certificate — vals[b, k-1] >= best ub among UNSELECTED chunks  ⇒  the
#              result provably equals the full exact top-k (of the stored
#              index representation).  Shapes stay static; the certificate
#              reports per query whether the shortcut was lossless.
#
# Anisotropic encoder embeddings concentrate spectral mass in few
# directions, so R=128 of 768 certifies ~all queries; on isotropic random
# data the certificate honestly reports failure instead of silently
# degrading.


def train_pca_rotation(sample, r: int):
    """(D, r) fp32 rotation: top-r eigenvectors of the UNCENTERED second
    moment (centering would shift inner products).  Host-side, build-time;
    a ~100k-row sample of the corpus is plenty."""
    import numpy as np

    x = np.asarray(sample, np.float64)
    _, v = np.linalg.eigh(x.T @ x)                  # ascending eigenvalues
    return np.ascontiguousarray(v[:, ::-1][:, :r]).astype(np.float32)


def build_pca_prefilter(emb, rot, *, cand_rows: int = 512,
                        n_pad: Optional[int] = None, scales=None,
                        store_dtype: str = "bfloat16"):
    """Projection + certificate bounds for `mips_topk_pca`.

    emb: (N, D) fp32 host embeddings (pre-quantization); rot: (D, R) fp32.
    scales: per-row int8 scales when the FULL index is stored int8 — bounds
    are then computed against the DEQUANTIZED rows (the int8 tier's scoring
    semantics); None for a bf16/fp32 index, where `store_dtype` names the
    index storage so bounds cover exactly what phase 2 will score (bf16
    storage rounds the rows; bounding the raw fp32 rows instead would leave
    that term unaccounted and break certificate soundness).

    Returns (proj, bounds): proj (n_pad, R) fp32 (store as bf16 — delta
    accounts for that rounding), bounds (4, n_pad/cand_rows) fp32 rows
    [resid, delta, pnorm, xnorm]:
      resid[c] = max ‖x_store − V V^T x_store‖   (discarded-component norm)
      delta[c] = max ‖proj_fp32 − bf16(proj)‖    (stored-projection rounding)
      pnorm[c] = max ‖bf16(proj)‖
      xnorm[c] = max ‖x_store‖
    Pad rows are zero ⇒ zero projection and zero bounds."""
    import numpy as np

    n, d = emb.shape
    n_pad = n if n_pad is None else n_pad
    assert n_pad % cand_rows == 0 and n <= n_pad
    r = rot.shape[1]
    num_cand = n_pad // cand_rows
    proj = np.zeros((n_pad, r), np.float32)
    per_row = np.zeros((4, n_pad), np.float32)
    for s in range(0, n, 65536):
        e = min(s + 65536, n)
        x = np.asarray(emb[s:e], np.float64)
        if scales is not None:
            # mirror quantize_rows in float32 exactly, then bound in float64
            sc = np.asarray(scales[s:e], np.float32).reshape(-1, 1)
            qi = np.clip(np.round(emb[s:e].astype(np.float32) / sc),
                         -127, 127)
            x = qi.astype(np.float64) * sc.astype(np.float64)
        elif jnp.dtype(store_dtype) == jnp.bfloat16:
            # bound the rows AS STORED: phase 2 scores the bf16 index
            x = np.asarray(
                jnp.asarray(emb[s:e], jnp.bfloat16).astype(jnp.float32),
                np.float64)
        p = x @ np.asarray(rot, np.float64)
        proj[s:e] = p
        p_b16 = jnp.asarray(p, jnp.bfloat16)
        p_store = np.asarray(p_b16, np.float64)
        per_row[0, s:e] = np.sqrt(np.maximum(
            (x * x).sum(1) - (p * p).sum(1), 0.0))
        per_row[1, s:e] = np.linalg.norm(p - p_store, axis=1)
        per_row[2, s:e] = np.linalg.norm(p_store, axis=1)
        per_row[3, s:e] = np.linalg.norm(x, axis=1)
    bounds = per_row.reshape(4, num_cand, cand_rows).max(axis=2)
    # nudge up one fp32 ulp: the float64→float32 round of the bound itself
    # must not round DOWN past the true supremum
    bounds = np.nextafter(bounds, np.float32(np.inf)).astype(np.float32)
    return proj, bounds


def pick_pca_step_rows(n: int, cand_rows: int) -> int:
    """Largest valid phase-1 step for `mips_topk_pca`: must divide N, nest
    cand_rows, and give the out block >= 8 sublanes (or cover the whole
    index) for real-Mosaic lowering."""
    for step in (4096, 8 * cand_rows, n):
        if step <= n and n % step == 0 and step % cand_rows == 0 \
                and (step // cand_rows >= 8 or step == n):
            return step
    return cand_rows  # the op falls back to interpret mode for this shape


def _chunk_max_fine_kernel(q_ref, chunk_ref, nv_ref, out_ref,
                           step_rows: int, cand_rows: int, mask_valid: bool):
    """Per-`cand_rows`-chunk maxima of q·P^T, `step_rows` rows per grid
    step (static python loop over the step's cand sub-chunks: lane-aligned
    512-wide slices, no in-kernel reshape)."""
    step = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:], chunk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (B, step_rows)
    if mask_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col + step * step_rows < nv_ref[0], scores,
                           NEG_INF)
    outs = [jnp.max(scores[:, j * cand_rows:(j + 1) * cand_rows], axis=1)
            for j in range(step_rows // cand_rows)]
    out_ref[:] = jnp.stack(outs, axis=0)                # (n_sub, B)


@functools.partial(jax.jit,
                   static_argnames=("k", "k_chunks", "cand_rows", "step_rows",
                                    "interpret", "n_valid"))
def mips_topk_pca(index: jnp.ndarray, proj: jnp.ndarray, rot: jnp.ndarray,
                  bounds: jnp.ndarray, queries: jnp.ndarray, k: int,
                  k_chunks: int = 8, cand_rows: int = 512,
                  step_rows: int = 4096, interpret: bool = False,
                  n_valid: Optional[int] = None, n_valid_dyn=None,
                  doc_scales: Optional[jnp.ndarray] = None):
    """PCA-prefiltered top-k with per-query exactness certificates (section
    comment above).  Returns (vals (B, k), row_ids (B, k), certified (B,)
    bool).  index (N, D) bf16/fp32 or int8 (+doc_scales); proj (N, R) bf16;
    rot (D, R) fp32; bounds (4, N/cand_rows) fp32 from
    `build_pca_prefilter`.  Requires k <= k_chunks*cand_rows; the batch is
    padded to a multiple of 8 internally (rescan query blocks are 8-row
    tiles), so any B works.
    """
    n, d = index.shape
    b_orig = queries.shape[0]
    pad_b = (-b_orig) % 8
    if pad_b:
        queries = jnp.concatenate(
            [queries, jnp.repeat(queries[:1], pad_b, axis=0)])
    b = queries.shape[0]
    num_cand = n // cand_rows
    if n % step_rows or step_rows % cand_rows or cand_rows % 128:
        raise ValueError(f"rows {n} / step {step_rows} / cand {cand_rows} "
                         "must nest and cand_rows % 128 == 0")
    if not interpret and step_rows // cand_rows < 8 and step_rows != n:
        # real-Mosaic sublane constraint on the phase-1 out block (see
        # pick_pca_step_rows); tiny indexes run in interpret mode, which is
        # plenty at that scale
        interpret = True
    if num_cand <= k_chunks:
        raise ValueError("k_chunks must be < number of candidate chunks")
    bound = _valid_bound(n, n_valid, n_valid_dyn)
    mask_valid = bound is not None
    nv = jnp.asarray([n if bound is None else bound], jnp.int32)
    is_int8 = index.dtype == jnp.int8

    # ---- query-side projections and EXACT error norms -------------------
    q32 = queries.astype(jnp.float32)
    q_proj = q32 @ rot                                   # (B, R) fp32
    qp_store = q_proj.astype(proj.dtype)
    qperp = jnp.sqrt(jnp.maximum(
        jnp.sum(q32 * q32, 1) - jnp.sum(q_proj * q_proj, 1), 0.0))
    qpnorm = jnp.sqrt(jnp.sum(q_proj * q_proj, 1))
    qperr = jnp.linalg.norm(q_proj - qp_store.astype(jnp.float32), axis=1)
    if is_int8:
        assert doc_scales is not None, "int8 index requires doc_scales"
        q_used, q_scales = quantize_rows(queries)
        q_deq = q_used.astype(jnp.float32) * q_scales.reshape(-1, 1)
        qerr = jnp.linalg.norm(q32 - q_deq, axis=1)
    else:
        q_used = queries.astype(index.dtype)
        qerr = jnp.linalg.norm(
            q32 - q_used.astype(jnp.float32), axis=1)

    # ---- phase 1: fine-granularity chunk maxima over the projection -----
    n_sub = step_rows // cand_rows
    maxima_t = pl.pallas_call(
        functools.partial(_chunk_max_fine_kernel, step_rows=step_rows,
                          cand_rows=cand_rows, mask_valid=mask_valid),
        grid_spec=pl.GridSpec(
            grid=(n // step_rows,),
            in_specs=[
                pl.BlockSpec((b, proj.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((step_rows, proj.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((n_sub, b), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((num_cand, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * proj.shape[1],
            bytes_accessed=n * proj.shape[1] * proj.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(qp_store, proj, nv)
    maxp = maxima_t.T                                    # (B, num_cand)

    # ---- upper bounds + chunk selection ---------------------------------
    ub = (maxp
          + qperp[:, None] * bounds[0][None, :]
          + qpnorm[:, None] * bounds[1][None, :]
          + qperr[:, None] * bounds[2][None, :]
          + qerr[:, None] * bounds[3][None, :])
    ub_vals, ub_ids = jax.lax.top_k(ub, k_chunks + 1)
    chunk_ids = ub_ids[:, :k_chunks].astype(jnp.int32)
    ub_next = ub_vals[:, k_chunks]                       # best unselected

    # ---- phase 2: exact full-D rescan of the selected chunks ------------
    if is_int8:
        dsc_rows = doc_scales.astype(jnp.float32).reshape(num_cand,
                                                          cand_rows)
        scores = _sparse_rescan(chunk_ids, nv, q_used, index, dsc_rows,
                                chunk_rows=cand_rows, k_chunks=k_chunks,
                                mask_valid=mask_valid, interpret=interpret)
        scores = scores * q_scales.reshape(b, 1)
    else:
        scores = _sparse_rescan(chunk_ids, nv, q_used, index, None,
                                chunk_rows=cand_rows, k_chunks=k_chunks,
                                mask_valid=mask_valid, interpret=interpret)
    row_ids = (chunk_ids[:, :, None] * cand_rows
               + jnp.arange(cand_rows, dtype=jnp.int32)[None, None, :]
               ).reshape(b, k_chunks * cand_rows)
    vals, pos = jax.lax.top_k(scores, k)
    certified = vals[:, k - 1] >= ub_next
    ids = jnp.take_along_axis(row_ids, pos, axis=1)
    return vals[:b_orig], ids[:b_orig], certified[:b_orig]


def merge_multivector(vals: jnp.ndarray, rows: jnp.ndarray, k: int, m: int):
    """Collapse a (B, k*m) row-level top-k over a multi-vector index into a
    (B, k) DOC-level top-k (max over each doc's vectors).

    Rows are grouped per passage (doc = row // m, the layout
    MultiVectorCtxEncoder emits and DenseIndex.build preserves), mirroring
    the reference's idx→id map (utils/gen_index_id_map.py:6-14) done
    on-device.  Fetching k*m rows guarantees ≥ k distinct docs (each doc
    owns exactly m rows), so the doc-level result is exact.
    """
    if m <= 1:
        return vals, rows
    km = vals.shape[1]
    docs = rows // m
    # rows arrive sorted desc (ties by row asc): the FIRST occurrence of a
    # doc is its best vector; mask later duplicates and re-rank
    same = docs[:, :, None] == docs[:, None, :]          # (B, km, km)
    earlier = jnp.tril(jnp.ones((km, km), bool), -1)     # j < i
    dup = jnp.any(same & earlier[None], axis=-1)
    vals = jnp.where(dup, NEG_INF, vals)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(docs, pos, axis=1)


# --------------------------------------------------------------------------
# Dispatcher + sharded search
# --------------------------------------------------------------------------


def mips_topk(index, queries, k: int, *, use_pallas: bool = True,
              chunk_rows: int = 4096, interpret: bool = False,
              n_valid: Optional[int] = None, doc_scales=None,
              n_valid_dyn=None):
    """Single-shard exact top-k; picks the Pallas kernel on TPU.

    Pass `doc_scales` with an int8 `index` for the quantized path.
    chunk_rows is clamped so the kernel's VMEM footprint (double-buffered
    tile + score matrix + merge temps) stays under budget for this batch.
    """
    on_tpu = jax.default_backend() == "tpu"
    chunk = min(chunk_rows,
                auto_chunk_rows(queries.shape[0], index.shape[1],
                                jnp.dtype(index.dtype).itemsize))
    # chunk == 0: even the floor tile overflows VMEM for this query block;
    # k > chunk: the kernel can't track that many candidates — both route
    # to the exact XLA tier instead of a Mosaic failure / loud kernel error
    pallas_ok = use_pallas and (on_tpu or interpret) and chunk > 0 \
        and k <= chunk and index.shape[0] % chunk == 0
    if index.dtype == jnp.int8 and not interpret \
            and chunk < 1024 and chunk != index.shape[0]:
        # packed-scales block needs >= 8 sublanes on real Mosaic
        # (mips_topk_pallas_int8 guard) — the XLA tier is exact anyway
        pallas_ok = False
    # Large k: the two-phase search beats the running-merge kernel, whose
    # merge fires on almost every chunk at large batch.  Standalone kernel
    # timings overstate the win (a benign scan harness overlaps phase 2's
    # DMA latency across iterations); measured IN the full pipeline, k=4 is
    # a ~2 ms wash-to-loss while k=8 keeps a ~3x standalone margin (28.6 vs
    # 9.6 ms at B=192 / 5.2M int8), so dispatch only from k >= 8 — e.g. the
    # published FEVER configs with --beam-size-2 10..20.
    # MDRT_DISABLE_TWO_PHASE=1 forces the single-pass kernel.
    import os

    two_phase = (pallas_ok and k >= 8 and queries.shape[0] % 8 == 0
                 and not os.environ.get("MDRT_DISABLE_TWO_PHASE"))
    if index.dtype == jnp.int8:
        assert doc_scales is not None, "int8 index requires doc_scales"
        if two_phase:
            return mips_topk_two_phase(index, queries, k, chunk_rows=chunk,
                                       interpret=interpret, n_valid=n_valid,
                                       n_valid_dyn=n_valid_dyn,
                                       doc_scales=doc_scales)
        if pallas_ok:
            return mips_topk_pallas_int8(index, doc_scales, queries, k,
                                         chunk_rows=chunk, interpret=interpret,
                                         n_valid=n_valid,
                                         n_valid_dyn=n_valid_dyn)
        return mips_topk_xla_int8(index, doc_scales, queries, k,
                                  chunk_rows=max(chunk_rows, 16384),
                                  n_valid=n_valid, n_valid_dyn=n_valid_dyn)
    if two_phase:
        return mips_topk_two_phase(index, queries, k, chunk_rows=chunk,
                                   interpret=interpret, n_valid=n_valid,
                                   n_valid_dyn=n_valid_dyn)
    if pallas_ok:
        return mips_topk_pallas(index, queries, k, chunk_rows=chunk,
                                interpret=interpret, n_valid=n_valid,
                                n_valid_dyn=n_valid_dyn)
    return mips_topk_xla(index, queries, k, chunk_rows=max(chunk_rows, 16384),
                         n_valid=n_valid, n_valid_dyn=n_valid_dyn)


def sharded_mips_topk(index: jnp.ndarray, queries: jnp.ndarray, k: int,
                      mesh: Mesh, *, use_pallas: bool = True,
                      chunk_rows: int = 4096, n_valid: Optional[int] = None,
                      doc_scales: Optional[jnp.ndarray] = None,
                      n_valid_dyn=None):
    """Distributed exact MIPS: the index is row-sharded over the mesh `index`
    axis; each chip searches its shard, converts local row ids to global ids,
    and the (B, k) candidate sets are all-gathered over ICI and merged.

    This replaces the reference's single-GPU FAISS search — the commented-out
    multi-GPU sharded-FAISS sketch (eval_retrieval.py:121-126) done properly.
    """
    n_shards = mesh.shape[INDEX_AXIS]
    shard_rows = index.shape[0] // n_shards

    use_dyn = n_valid_dyn is not None

    def local_search(idx_shard, q, scales_shard, nv):
        # per-shard validity: padding is contiguous at the global tail, so
        # shard s holds clip(n_valid - s*shard_rows, 0, shard_rows) valid
        # rows.  The bound is traced (shard id is), so it flows into the
        # kernels as a dynamic scalar and masks pad rows BEFORE the local
        # top-k — zero-vector pads score 0.0 and would otherwise evict
        # genuinely valid negative-score docs from the boundary shard.
        # nv (a traced global bound — live online updates) wins over the
        # static n_valid.
        shard_id = jax.lax.axis_index(INDEX_AXIS)
        local_valid = None
        bound = nv if use_dyn else n_valid
        if bound is not None and (use_dyn or n_valid < index.shape[0]):
            local_valid = jnp.clip(bound - shard_id * shard_rows,
                                   0, shard_rows).astype(jnp.int32)
        vals, idxs = mips_topk(idx_shard, q, k, use_pallas=use_pallas,
                               chunk_rows=chunk_rows, doc_scales=scales_shard,
                               n_valid_dyn=local_valid)
        idxs = idxs + shard_id * shard_rows
        # gather all shards' candidates: (n_shards*k) per row, then merge
        all_vals = jax.lax.all_gather(vals, INDEX_AXIS, axis=1, tiled=True)
        all_idxs = jax.lax.all_gather(idxs, INDEX_AXIS, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        return top_vals, jnp.take_along_axis(all_idxs, pos, axis=1)

    use_scales = doc_scales is not None
    if not use_scales:
        # placeholder sized one element per shard (the wrapper drops it)
        doc_scales = jnp.zeros((n_shards,), jnp.float32)
    scales_spec = P(INDEX_AXIS)
    nv_arr = (jnp.asarray(n_valid_dyn, jnp.int32) if use_dyn
              else jnp.int32(0))

    def wrapper(idx_shard, q, scales_shard, nv):
        return local_search(idx_shard, q,
                            scales_shard if use_scales else None, nv)

    fn = shard_map(
        wrapper, mesh=mesh,
        in_specs=(P(INDEX_AXIS, None), P(), scales_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,  # the scan carry inside mips_topk is shard-local
    )
    return fn(index, queries, doc_scales, nv_arr)


def sharded_mips_topk_pca(index: jnp.ndarray, proj: jnp.ndarray,
                          rot: jnp.ndarray, bounds: jnp.ndarray,
                          queries: jnp.ndarray, k: int, mesh: Mesh, *,
                          k_chunks: int = 8, cand_rows: int = 512,
                          n_valid: Optional[int] = None,
                          doc_scales: Optional[jnp.ndarray] = None,
                          n_valid_dyn=None, interpret: bool = False):
    """Row-sharded PCA-prefiltered search: every shard runs `mips_topk_pca`
    over its slice of the index+projection (its own chunk-max scan, bounds,
    and rescan), local ids become global, and the (B, k) candidate sets are
    all-gathered over ICI and merged — the same collective pattern as
    `sharded_mips_topk`.

    Certificate composition: the merged top-k equals the global exact top-k
    whenever EVERY shard's local top-k was exact, so the returned mask is
    the AND over shards — per-shard honesty survives the merge."""
    n_shards = mesh.shape[INDEX_AXIS]
    shard_rows = index.shape[0] // n_shards
    if shard_rows % cand_rows:
        raise ValueError("cand_rows must divide the per-shard row count")
    num_cand_local = shard_rows // cand_rows
    if num_cand_local < 2:
        raise ValueError(
            f"each shard holds {num_cand_local} candidate chunk(s); the "
            "prefilter needs >= 2 per shard (use fewer shards, smaller "
            "cand_rows, or the plain sharded_mips_topk)")
    kc = min(k_chunks, num_cand_local - 1)
    step = pick_pca_step_rows(shard_rows, cand_rows)
    use_dyn = n_valid_dyn is not None
    use_scales = doc_scales is not None

    def local(idx_s, proj_s, bounds_s, q, scales_s, nv):
        shard_id = jax.lax.axis_index(INDEX_AXIS)
        local_valid = None
        bound = nv if use_dyn else n_valid
        if bound is not None and (use_dyn or n_valid < index.shape[0]):
            local_valid = jnp.clip(bound - shard_id * shard_rows,
                                   0, shard_rows).astype(jnp.int32)
        vals, idxs, cert = mips_topk_pca(
            idx_s, proj_s, rot, bounds_s, q, k, k_chunks=kc,
            cand_rows=cand_rows, step_rows=step, interpret=interpret,
            n_valid_dyn=local_valid,
            doc_scales=scales_s if use_scales else None)
        idxs = idxs + shard_id * shard_rows
        all_vals = jax.lax.all_gather(vals, INDEX_AXIS, axis=1, tiled=True)
        all_idxs = jax.lax.all_gather(idxs, INDEX_AXIS, axis=1, tiled=True)
        all_cert = jax.lax.all_gather(cert[:, None].astype(jnp.int32),
                                      INDEX_AXIS, axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        return (top_vals, jnp.take_along_axis(all_idxs, pos, axis=1),
                jnp.all(all_cert > 0, axis=1))

    if not use_scales:
        doc_scales = jnp.zeros((index.shape[0],), jnp.float32)
    nv_arr = (jnp.asarray(n_valid_dyn, jnp.int32) if use_dyn
              else jnp.int32(0))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(INDEX_AXIS, None), P(INDEX_AXIS, None),
                  P(None, INDEX_AXIS), P(), P(INDEX_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(index, proj, bounds, queries, doc_scales, nv_arr)
