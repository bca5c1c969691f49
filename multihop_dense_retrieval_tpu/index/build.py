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


def encode_corpus(encode_fn: Callable, params, tc: TokenizedCorpus,
                  spec: TokenizerSpec, *, max_c_len: int = 300,
                  batch_size: int = 256, mesh: Optional[Mesh] = None,
                  progress: bool = False,
                  multi_vector: int = 1) -> np.ndarray:
    """Returns (N * multi_vector, H) fp32 embeddings of all corpus passages
    (multi_vector > 1: encode_fn emits multiple grouped rows per passage,
    models/retriever.py::MultiVectorCtxEncoder)."""
    mv = max(multi_vector, 1)

    def encode_batch(p, title_ids, title_lens, text_ids, text_lens):
        inputs = assemble_pair_inputs(title_ids, title_lens,
                                      text_ids, text_lens, max_c_len, spec)
        if "token_type_ids" in inputs:
            return encode_fn(p, inputs["input_ids"], inputs["attention_mask"],
                             inputs["token_type_ids"])
        return encode_fn(p, inputs["input_ids"], inputs["attention_mask"])

    if mesh is not None:
        shard = NamedSharding(mesh, P(DATA_AXIS))
        fn = jax.jit(encode_batch,
                     in_shardings=(None, shard, shard, shard, shard))
    else:
        fn = jax.jit(encode_batch)

    n = tc.text_ids.shape[0]
    chunks = []
    it = range(0, n, batch_size)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, desc="encode corpus")
        except ImportError:
            pass
    for s in it:
        e = min(s + batch_size, n)
        # pad the tail batch to the static batch size (extra rows discarded)
        pad = batch_size - (e - s)
        sl = slice(s, e)
        def pad0(x):
            return np.concatenate([x[sl], np.repeat(x[s:s + 1], pad, axis=0)]) \
                if pad else x[sl]
        emb = fn(params,
                 jnp.asarray(pad0(tc.title_ids)), jnp.asarray(pad0(tc.title_lens)),
                 jnp.asarray(pad0(tc.text_ids)), jnp.asarray(pad0(tc.text_lens)))
        chunks.append(np.asarray(emb[: (e - s) * mv], np.float32))
    return np.concatenate(chunks, axis=0)


def build_index(encode_fn: Callable, params, tc: TokenizedCorpus,
                spec: TokenizerSpec, *, max_c_len: int = 300,
                batch_size: int = 256, chunk_rows: int = 4096,
                n_shards: int = 1, dtype=jnp.bfloat16,
                mesh: Optional[Mesh] = None,
                progress: bool = False,
                multi_vector: int = 1) -> DenseIndex:
    emb = encode_corpus(encode_fn, params, tc, spec, max_c_len=max_c_len,
                        batch_size=batch_size, mesh=mesh, progress=progress,
                        multi_vector=multi_vector)
    return DenseIndex.build(emb, chunk_rows=chunk_rows, n_shards=n_shards,
                            dtype=dtype, mesh=mesh, multi_vector=multi_vector)
