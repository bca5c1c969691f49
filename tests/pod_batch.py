"""Deterministic 8-row mhop train batch + params shared between the
multi-process pod workers and the single-process reference computation
(tests/test_pod_multiprocess.py) — both sides must build EXACTLY the same
inputs for the bit-equality assertion to mean anything.

Uses an in-memory tmp-free path: dataset rows are synthesized to a temp file
under /tmp keyed by content (the workers run in separate processes and
cannot share a pytest tmp_path fixture)."""

import os
import tempfile

import numpy as np

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.data import (HashTokenizer, MhopDataset,
                                               BatchLoader)
from tests import synth


def make_batch():
    """8-row mhop batch, identical across processes (fixed seeds)."""
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 64)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    with tempfile.NamedTemporaryFile("w", suffix=".jsonl",
                                     delete=False) as f:
        path = f.name
    try:
        synth.write_jsonl(path, rows)
        tok = HashTokenizer(vocab_size=512)
        ds = MhopDataset(tok, path, train=True, max_q_len=16,
                         max_q_sp_len=48, max_c_len=32)
        loader = BatchLoader(ds, 8, shuffle=True, seed=1, num_workers=1)
        batch = next(iter(loader))
    finally:
        os.unlink(path)
    batch.pop("valid", None)
    return {k: np.asarray(v) for k, v in batch.items()}


def init_params(model):
    import jax
    import jax.numpy as jnp

    ids = jnp.ones((1, 8), jnp.int32)
    return model.init(jax.random.PRNGKey(0), ids, ids,
                      method=model.encode_seq)
