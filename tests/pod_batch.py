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


def make_search_fixture():
    """Deterministic tiny retrieval fixture shared by the 2-process sharded
    search worker and its single-process reference (fixed seeds on both
    sides): tokenizer, encoder+params, corpus embeddings, token store."""
    import jax
    import jax.numpy as jnp

    from multihop_dense_retrieval_tpu.data import Corpus, TokenizedCorpus
    from multihop_dense_retrieval_tpu.models import MhopRetriever

    rng = np.random.RandomState(5)
    corpus = Corpus(synth.make_corpus(rng, 40))
    tok = HashTokenizer(vocab_size=512)
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=48)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=96)
    model = MhopRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)
    enc = tok.encode_batch_pair(
        [(corpus[i]["title"], corpus.encode_text(i))
         for i in range(len(corpus))], 64)
    emb = np.asarray(model.apply(params, jnp.asarray(enc["input_ids"]),
                                 jnp.asarray(enc["attention_mask"]),
                                 method=model.encode_seq), np.float32)
    return tok, model, params, emb, tc, len(corpus)


def make_search_queries(tok, n=4):
    """Deterministic tokenized questions for the sharded-search parity
    test; returns (q_inputs, raw_ids, raw_lens)."""
    qs = [f"pod sharded search query number {i}" for i in range(n)]
    q_inputs = tok.encode_batch_one(qs, 20)
    raw = [tok.raw_ids_padded(q, 18) for q in qs]
    return (q_inputs, np.stack([r[0] for r in raw]),
            np.array([r[1] for r in raw]))


def search_store(tok, tc, n_docs, n_pad):
    """Padded token store arrays for the search fixture (host numpy)."""
    text_ids = np.full((n_pad, 48), tok.spec.pad_id, np.int32)
    text_ids[:n_docs] = tc.text_ids
    text_lens = np.zeros(n_pad, np.int32)
    text_lens[:n_docs] = tc.text_lens
    empty = np.zeros(n_pad, bool)
    empty[:n_docs] = tc.empty
    return text_ids, text_lens, empty


SEARCH_CFG = dict(beam_size_1=4, beam_size_2=4, topk=4, max_q_len=20,
                  max_q_sp_len=80, chunk_rows=8, use_pallas=False,
                  hop2_buckets=(32, 48, 64, 80))
