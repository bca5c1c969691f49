"""Bulk corpus encoding → dense index.

Replaces scripts/encode_corpus.py: the reference runs HF RoBERTa under torch
DataParallel at batch 1000 fp16 and np.saves a fp32 (N, 768) array
(encode_corpus.py:85-113).  Here passage views are assembled **on device**
from the pre-tokenized corpus (same `assemble_pair_inputs` as hop-2 search —
passages are (title, text) pairs, encode_datasets.py:85-95) and encoded in
one jitted data-parallel program per batch; output feeds DenseIndex directly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..data.corpus import TokenizedCorpus
from ..data.tokenization import TokenizerSpec
from ..search.beam import assemble_pair_inputs
from .store import DenseIndex

import functools


@functools.lru_cache(maxsize=16)
def _scan_encoder(encode_fn, spec, mesh):
    """Jitted (nb, B, ·) scan encoder, cached per (encode_fn, spec, mesh)
    so repeated encode_corpus calls reuse compiled programs."""

    def encode_scan(p, ti, tl, xi, xl, width):
        def body(_, xs):
            a, b, c, d = xs
            inputs = assemble_pair_inputs(a, b, c, d, width, spec)
            if "token_type_ids" in inputs:
                out = encode_fn(p, inputs["input_ids"],
                                inputs["attention_mask"],
                                inputs["token_type_ids"])
            else:
                out = encode_fn(p, inputs["input_ids"],
                                inputs["attention_mask"])
            return None, out
        _, embs = jax.lax.scan(body, None, (ti, tl, xi, xl))
        return embs                        # (nb, B*mv, H)

    if mesh is not None:
        shard = NamedSharding(mesh, P(None, DATA_AXIS))
        return jax.jit(encode_scan, static_argnums=(5,),
                       in_shardings=(None, shard, shard, shard, shard))
    return jax.jit(encode_scan, static_argnums=(5,))


def encode_corpus(encode_fn: Callable, params, tc: TokenizedCorpus,
                  spec: TokenizerSpec, *, max_c_len: int = 300,
                  batch_size: int = 256, mesh: Optional[Mesh] = None,
                  progress: bool = False,
                  multi_vector: int = 1,
                  length_sort: bool = True,
                  scan_batches: int = 16) -> np.ndarray:
    """Returns (N * multi_vector, H) fp32 embeddings of all corpus passages
    (multi_vector > 1: encode_fn emits multiple grouped rows per passage,
    models/retriever.py::MultiVectorCtxEncoder).

    Dispatch structure (MEASURED, see PERF.md): up to `scan_batches`
    batches run inside ONE jitted lax.scan per dispatch — a per-batch
    dispatch pattern costs ~3x the device time through this environment's
    remote-TPU tunnel (host sync + executable switches), and one dispatch
    per super-batch amortizes it for any host.

    length_sort: process documents in assembled-length order so each
    super-batch is encoded at its own width (multiples of 32 — PERF.md),
    then scatter embeddings back to corpus order.  Results match the
    full-width encode: narrowing only drops trailing pad columns (same
    argument as the hop-2 serving buckets; bit-equal in fp32, bf16 CLS
    vectors agree to a few ulps because XLA tiles reductions differently
    per shape).  Wiki-like corpora average ~1/3 of the 300-token budget.
    """
    mv = max(multi_vector, 1)
    n_special = spec.num_special_pair

    fn = _scan_encoder(encode_fn, spec, mesh)

    n = tc.text_ids.shape[0]
    total = (np.minimum(tc.title_lens, max_c_len)
             + np.minimum(tc.text_lens, max_c_len) + n_special)
    order = (np.argsort(total, kind="stable") if length_sort
             else np.arange(n))

    # batches → (idx row, true count, width); supers are FIXED runs of
    # scan_batches consecutive batches, encoded at the max width within.
    # Fixed nb keeps the number of distinct compiled shapes at ~the number
    # of 32-multiple widths (each (nb, width) pair is its own program, and
    # remote compiles cost ~10-40s here — variable-length width runs were
    # measured to recompile far more than the narrowing saved).
    batches = []
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        idx = order[s:e]
        cnt = len(idx)
        if cnt < batch_size:
            idx = np.concatenate([idx, np.repeat(idx[:1], batch_size - cnt)])
        if length_sort:
            # exact iff width >= every row's full assembled length (pure
            # pad-drop) OR width == max_c_len (truncation identical to the
            # unsorted path) — both hold by construction
            w = int(total[idx].max())
            width = min(-(-w // 32) * 32, max_c_len)
        else:
            width = max_c_len
        batches.append((idx, cnt, width))

    supers = []
    for s in range(0, len(batches), scan_batches):
        grp = batches[s:s + scan_batches]
        # pad the TAIL group to scan_batches with cnt=0 repeats of its
        # first batch: a smaller nb would be one more compiled (nb, width)
        # program — the exact remote-compile cost fixed nb exists to avoid
        while len(grp) < scan_batches:
            grp.append((grp[0][0], 0, grp[0][2]))
        supers.append(([b[0] for b in grp], [b[1] for b in grp],
                       max(b[2] for b in grp)))

    chunks = None
    it = supers
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(supers, desc="encode corpus (super-batches)")
        except ImportError:
            pass
    for idx_list, cnts, width in it:
        idx_arr = np.stack(idx_list)                       # (nb, B)
        embs = np.asarray(fn(
            params,
            jnp.asarray(tc.title_ids[idx_arr]),
            jnp.asarray(tc.title_lens[idx_arr]),
            # doc tokens beyond the bucket width can never be kept; slice
            # the VIEW first so the gather copies only the kept columns
            jnp.asarray(tc.text_ids[:, :width][idx_arr]),
            jnp.asarray(tc.text_lens[idx_arr]),
            width), np.float32)                            # (nb, B*mv, H)
        if chunks is None:
            chunks = np.empty((n * mv, embs.shape[-1]), np.float32)
        for j, (idx, cnt) in enumerate(zip(idx_list, cnts)):
            rows = (idx[:cnt, None] * mv
                    + np.arange(mv)[None, :]).reshape(-1)
            chunks[rows] = embs[j, : cnt * mv]
    if chunks is None:
        return np.zeros((0, 0), np.float32)
    return chunks


def build_index(encode_fn: Callable, params, tc: TokenizedCorpus,
                spec: TokenizerSpec, *, max_c_len: int = 300,
                batch_size: int = 256, chunk_rows: int = 4096,
                n_shards: int = 1, dtype=jnp.bfloat16,
                mesh: Optional[Mesh] = None,
                progress: bool = False,
                multi_vector: int = 1,
                length_sort: bool = True,
                pca_dims: Optional[int] = None,
                pca_cand_rows: int = 512) -> DenseIndex:
    emb = encode_corpus(encode_fn, params, tc, spec, max_c_len=max_c_len,
                        batch_size=batch_size, mesh=mesh, progress=progress,
                        multi_vector=multi_vector, length_sort=length_sort)
    return DenseIndex.build(emb, chunk_rows=chunk_rows, n_shards=n_shards,
                            dtype=dtype, mesh=mesh, multi_vector=multi_vector,
                            pca_dims=pca_dims, pca_cand_rows=pca_cand_rows)
