"""Online DenseIndex updates (index/store.py append/replace/delete_swap):
the FAISS `index.add` / `remove_ids` serving story
(eval_mhop_retrieval.py:121-122), TPU-native via donated slice updates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import (EncoderConfig,
                                                      SearchConfig)
from multihop_dense_retrieval_tpu.data import (HashTokenizer, Corpus,
                                               TokenizedCorpus)
from multihop_dense_retrieval_tpu.index.store import DenseIndex
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.ops.mips import mips_topk
from multihop_dense_retrieval_tpu.search import BeamSearcher
from tests import synth

D = 16


def _vecs(rng, n):
    x = rng.randn(n, D).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _top1(idx, queries):
    _, ids = mips_topk(idx.vectors, jnp.asarray(queries), 1,
                       use_pallas=False, n_valid=idx.n_docs,
                       doc_scales=idx.scales)
    return np.asarray(ids)[:, 0]


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_append_within_padding_and_growth(dtype):
    rng = np.random.RandomState(0)
    base = _vecs(rng, 20)
    idx = DenseIndex.build(base, chunk_rows=16,
                           dtype=jnp.dtype(dtype))  # pad 32
    assert idx.vectors.shape[0] == 32

    extra = _vecs(rng, 8)
    idx = idx.append(extra, chunk_rows=16)
    assert idx.n_docs == 28
    assert idx.vectors.shape[0] == 32          # landed in existing padding
    # every appended doc retrieves itself
    np.testing.assert_array_equal(_top1(idx, extra), np.arange(20, 28))
    # the original docs are untouched
    np.testing.assert_array_equal(_top1(idx, base[:5]), np.arange(5))

    more = _vecs(rng, 10)                      # 28 + 10 > 32: must grow
    idx = idx.append(more, chunk_rows=16)
    assert idx.n_docs == 38
    assert idx.vectors.shape[0] == 48
    np.testing.assert_array_equal(_top1(idx, more), np.arange(28, 38))
    if dtype == "int8":
        assert idx.scales.shape[0] == 48


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_replace_and_delete_swap(dtype):
    rng = np.random.RandomState(1)
    base = _vecs(rng, 12)
    idx = DenseIndex.build(base, chunk_rows=16, dtype=jnp.dtype(dtype))

    new3 = _vecs(rng, 1)
    idx = idx.replace(3, new3)
    assert _top1(idx, new3)[0] == 3
    assert _top1(idx, base[3:4])[0] != 3 or np.allclose(base[3], new3)

    # delete doc 2: the last doc (11) moves into slot 2
    idx, moved = idx.delete_swap(2)
    assert moved == 11
    assert idx.n_docs == 11
    assert _top1(idx, base[11:12])[0] == 2     # swapped doc at its new id
    # deleted doc's vector is unreachable (slot now holds doc 11)
    assert _top1(idx, base[2:3])[0] != 2 or np.allclose(base[2], base[11])

    # deleting the (new) last doc moves nothing
    idx, moved = idx.delete_swap(idx.n_passages - 1)
    assert moved is None
    assert idx.n_docs == 10


def test_multivector_group_updates():
    rng = np.random.RandomState(2)
    base = _vecs(rng, 8)                       # 4 docs x 2 vectors
    idx = DenseIndex.build(base, chunk_rows=16, multi_vector=2)
    assert idx.n_passages == 4

    extra = _vecs(rng, 2)                      # one new doc (2 rows)
    idx = idx.append(extra, chunk_rows=16)
    assert idx.n_passages == 5
    # row-level top1 of each new vector is its own row
    np.testing.assert_array_equal(_top1(idx, extra), [8, 9])

    idx, moved = idx.delete_swap(0)            # doc 4's rows move to rows 0-1
    assert moved == 4
    assert idx.n_passages == 4
    np.testing.assert_array_equal(_top1(idx, extra), [0, 1])

    with pytest.raises(AssertionError):
        idx.append(_vecs(rng, 3), chunk_rows=16)   # not whole documents


def _build_searcher(model, params, tok, corpus_rows, chunk_rows=16):
    corpus = Corpus(corpus_rows)
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=40)
    enc = tok.encode_batch_pair(
        [(corpus[i]["title"], corpus.encode_text(i))
         for i in range(len(corpus))], 48)
    emb = np.asarray(model.apply(params, jnp.asarray(enc["input_ids"]),
                                 jnp.asarray(enc["attention_mask"]),
                                 method=model.encode_seq), np.float32)
    index = DenseIndex.build(emb, chunk_rows=chunk_rows, dtype=jnp.float32)
    n_pad = index.vectors.shape[0]
    text_ids = np.full((n_pad, tc.text_ids.shape[1]), tok.spec.pad_id,
                       np.int32)
    text_ids[:len(corpus)] = tc.text_ids
    text_lens = np.zeros(n_pad, np.int32)
    text_lens[:len(corpus)] = tc.text_lens
    empty = np.zeros(n_pad, bool)
    empty[:len(corpus)] = tc.empty
    searcher = BeamSearcher(
        encode_fn=lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_seq),
        params=params, index=index,
        text_ids=jnp.asarray(text_ids), text_lens=jnp.asarray(text_lens),
        empty=jnp.asarray(empty), spec=tok.spec,
        config=SearchConfig(beam_size_1=3, beam_size_2=3, topk=3,
                            max_q_len=24, max_q_sp_len=72,
                            chunk_rows=chunk_rows, use_pallas=False),
        mesh=None)
    return searcher, emb, tc


def test_live_engine_add_and_delete_matches_rebuild():
    """add_docs/delete_doc on a LIVE BeamSearcher produce exactly the same
    2-hop results as an engine rebuilt from scratch on the updated corpus —
    the new documents are searchable in hop 1 AND readable by the hop-2
    on-device reformulation."""
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(5)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=80)
    model = MhopRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)

    rows = synth.make_corpus(rng, 30, empty_every=7)
    new_rows = synth.make_corpus(rng, 4)
    for i, r in enumerate(new_rows):
        r["title"] = f"fresh doc {i}"

    live, emb, _ = _build_searcher(model, params, tok, rows)

    # encode + tokenize the new docs the same way the builder does
    nc = Corpus(new_rows)
    ntc = TokenizedCorpus.build(nc, tok, max_text_len=40)
    enc = tok.encode_batch_pair(
        [(nc[i]["title"], nc.encode_text(i)) for i in range(len(nc))], 48)
    nemb = np.asarray(model.apply(params, jnp.asarray(enc["input_ids"]),
                                  jnp.asarray(enc["attention_mask"]),
                                  method=model.encode_seq), np.float32)
    new_ids = live.add_docs(nemb, ntc.text_ids, ntc.text_lens, ntc.empty)
    assert new_ids == [30, 31, 32, 33]

    rebuilt, _, _ = _build_searcher(model, params, tok, rows + new_rows)

    qs = [synth.rand_text(rng, 3, 8) for _ in range(4)]
    q_inputs = tok.encode_batch_one(qs, 24)
    raw = [tok.raw_ids_padded(q, 22) for q in qs]
    q_raw_ids = np.stack([r[0] for r in raw])
    q_raw_lens = np.array([r[1] for r in raw])

    got = live.search(q_inputs, q_raw_ids, q_raw_lens)
    exp = rebuilt.search(q_inputs, q_raw_ids, q_raw_lens)
    np.testing.assert_array_equal(got["hop1_ids"], exp["hop1_ids"])
    np.testing.assert_array_equal(got["hop2_ids"], exp["hop2_ids"])
    np.testing.assert_allclose(got["path_scores"], exp["path_scores"],
                               rtol=1e-5, atol=1e-5)

    # delete doc 1; rebuild with the swap applied (last doc moves to slot 1)
    moved = live.delete_doc(1)
    assert moved == 33
    swapped = list(rows + new_rows)
    swapped[1] = swapped[33]
    swapped = swapped[:33]
    rebuilt2, _, _ = _build_searcher(model, params, tok, swapped)
    got = live.search(q_inputs, q_raw_ids, q_raw_lens)
    exp = rebuilt2.search(q_inputs, q_raw_ids, q_raw_lens)
    np.testing.assert_array_equal(got["hop1_ids"], exp["hop1_ids"])
    np.testing.assert_array_equal(got["hop2_ids"], exp["hop2_ids"])


def test_live_updates_on_sharded_index():
    """add_docs/delete_doc on a mesh-sharded engine (index axis): results
    agree with an unsharded engine holding the same updated corpus — the
    traced n_valid bound flows through shard_map to every shard."""
    from multihop_dense_retrieval_tpu.core.mesh import make_mesh

    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(9)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=80)
    model = MhopRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)
    rows = synth.make_corpus(rng, 30)
    new_rows = synth.make_corpus(rng, 3)

    mesh = make_mesh()  # (1, 8)

    def build(corpus_rows, m):
        corpus = Corpus(corpus_rows)
        tc = TokenizedCorpus.build(corpus, tok, max_text_len=40)
        enc = tok.encode_batch_pair(
            [(corpus[i]["title"], corpus.encode_text(i))
             for i in range(len(corpus))], 48)
        emb = np.asarray(model.apply(params, jnp.asarray(enc["input_ids"]),
                                     jnp.asarray(enc["attention_mask"]),
                                     method=model.encode_seq), np.float32)
        index = DenseIndex.build(emb, chunk_rows=8,
                                 n_shards=8 if m is not None else 1,
                                 dtype=jnp.float32, mesh=m)
        n_pad = index.vectors.shape[0]
        text_ids = np.full((n_pad, tc.text_ids.shape[1]), tok.spec.pad_id,
                           np.int32)
        text_ids[:len(corpus)] = tc.text_ids
        text_lens = np.zeros(n_pad, np.int32)
        text_lens[:len(corpus)] = tc.text_lens
        empty = np.zeros(n_pad, bool)
        empty[:len(corpus)] = tc.empty
        return BeamSearcher(
            encode_fn=lambda p, ids, mask, tt=None: model.apply(
                p, ids, mask, tt, method=model.encode_seq),
            params=params, index=index,
            text_ids=jnp.asarray(text_ids), text_lens=jnp.asarray(text_lens),
            empty=jnp.asarray(empty), spec=tok.spec,
            config=SearchConfig(beam_size_1=3, beam_size_2=3, topk=3,
                                max_q_len=24, max_q_sp_len=72,
                                chunk_rows=8, use_pallas=False),
            mesh=m), tc

    live, _ = build(rows, mesh)
    nc = Corpus(new_rows)
    ntc = TokenizedCorpus.build(nc, tok, max_text_len=40)
    enc = tok.encode_batch_pair(
        [(nc[i]["title"], nc.encode_text(i)) for i in range(len(nc))], 48)
    nemb = np.asarray(model.apply(params, jnp.asarray(enc["input_ids"]),
                                  jnp.asarray(enc["attention_mask"]),
                                  method=model.encode_seq), np.float32)
    live.add_docs(nemb, ntc.text_ids, ntc.text_lens, ntc.empty)
    live.delete_doc(0)  # last doc (32) moves into slot 0

    swapped = list(rows + new_rows)
    swapped[0] = swapped[32]
    swapped = swapped[:32]
    ref, _ = build(swapped, None)

    qs = [synth.rand_text(rng, 3, 8) for _ in range(4)]
    q_inputs = tok.encode_batch_one(qs, 24)
    raw = [tok.raw_ids_padded(q, 22) for q in qs]
    rid = np.stack([r[0] for r in raw])
    rlen = np.array([r[1] for r in raw])
    got = live.search(q_inputs, rid, rlen)
    exp = ref.search(q_inputs, rid, rlen)
    np.testing.assert_array_equal(got["hop1_ids"], exp["hop1_ids"])
    np.testing.assert_array_equal(got["hop2_ids"], exp["hop2_ids"])
    np.testing.assert_allclose(got["path_scores"], exp["path_scores"],
                               rtol=1e-5, atol=1e-5)


def test_live_pca_engine_add_docs():
    """add_docs on a use_pca engine: the prefilter (projection + bounds)
    moves with the index through _refresh_store, the engine keeps serving,
    certificate masks stay present, and certified hop-1 results match the
    updated-index brute force."""
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(8)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=80)
    model = MhopRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)

    rows = synth.make_corpus(rng, 1000, empty_every=13)
    corpus = Corpus(rows)
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=40)
    embs = []
    for s in range(0, len(corpus), 250):
        enc = tok.encode_batch_pair(
            [(corpus[i]["title"], corpus.encode_text(i))
             for i in range(s, min(s + 250, len(corpus)))], 48)
        embs.append(np.asarray(model.apply(
            params, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
            method=model.encode_seq), np.float32))
    emb = np.concatenate(embs)
    emb = emb - emb.mean(axis=0, keepdims=True)
    index = DenseIndex.build(emb, chunk_rows=128, dtype=jnp.float32,
                             pca_dims=emb.shape[1], pca_cand_rows=128)
    n_pad = index.vectors.shape[0]
    text_ids = np.full((n_pad, 40), tok.spec.pad_id, np.int32)
    text_ids[:len(corpus)] = tc.text_ids
    text_lens = np.zeros(n_pad, np.int32)
    text_lens[:len(corpus)] = tc.text_lens
    empty = np.zeros(n_pad, bool)
    empty[:len(corpus)] = tc.empty
    live = BeamSearcher(
        encode_fn=lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_seq),
        params=params, index=index,
        text_ids=jnp.asarray(text_ids), text_lens=jnp.asarray(text_lens),
        empty=jnp.asarray(empty), spec=tok.spec,
        config=SearchConfig(beam_size_1=3, beam_size_2=3, topk=3,
                            max_q_len=24, max_q_sp_len=72, chunk_rows=128,
                            use_pallas=False, use_pca=True, pca_k_chunks=7),
        mesh=None)

    new_rows = synth.make_corpus(rng, 4)
    nc = Corpus(new_rows)
    ntc = TokenizedCorpus.build(nc, tok, max_text_len=40)
    enc = tok.encode_batch_pair(
        [(nc[i]["title"], nc.encode_text(i)) for i in range(len(nc))], 48)
    nemb = np.asarray(model.apply(params, jnp.asarray(enc["input_ids"]),
                                  jnp.asarray(enc["attention_mask"]),
                                  method=model.encode_seq), np.float32)
    new_ids = live.add_docs(nemb, ntc.text_ids, ntc.text_lens, ntc.empty)
    assert new_ids == [1000, 1001, 1002, 1003]
    assert live.index.pca_proj is not None

    qs = [f"question about {corpus[i * 7]['title']}" for i in range(8)]
    q_inputs = tok.encode_batch_one(qs, 24)
    raw = [tok.raw_ids_padded(q, 22) for q in qs]
    q_raw_ids = np.stack([r[0] for r in raw])
    q_raw_lens = np.array([r[1] for r in raw])
    got = live.search(q_inputs, q_raw_ids, q_raw_lens)
    assert "pca_cert1" in got

    # certified hop-1 rows equal brute force over the UPDATED index
    q_vec = np.asarray(model.apply(
        params, jnp.asarray(q_inputs["input_ids"]),
        jnp.asarray(q_inputs["attention_mask"]),
        method=model.encode_seq), np.float32)
    host = np.concatenate([emb, nemb])
    scores = q_vec @ host.T
    # empty-text docs are masked by the engine before ranking hop-1 SLOTS,
    # but hop1_cand_ids come straight from MIPS — compare against raw brute
    bi = np.argsort(-scores, axis=1, kind="stable")[:, :3]
    for r in np.nonzero(np.asarray(got["pca_cert1"]))[0]:
        np.testing.assert_array_equal(np.asarray(got["hop1_cand_ids"])[r],
                                      bi[r])


def test_index_remembers_layout_chunk(tmp_path):
    """DenseIndex carries its LAYOUT granularity: append without an
    explicit chunk_rows grows by the build chunk, and save/load keeps it
    (review r3 — the live engine grew by SearchConfig.chunk_rows, the
    131072-row scan tile, adding ~1M zero rows on a one-doc append)."""
    rng = np.random.RandomState(0)
    base = _vecs(rng, 30)
    idx = DenseIndex.build(base, chunk_rows=16, dtype=jnp.float32)
    assert idx.chunk_rows == 16 and idx.vectors.shape[0] == 32

    idx = idx.append(_vecs(rng, 5))           # no chunk_rows argument
    assert idx.n_docs == 35
    assert idx.vectors.shape[0] == 48         # grew by 16, not a default

    path = str(tmp_path / "idx.npz")
    idx.save(path)
    idx2 = DenseIndex.load(path)
    assert idx2.chunk_rows == 16
