"""Multi-vector index end-to-end: MultiVectorCtxEncoder rows are searchable
(doc = row // m layout, the reference's gen_index_id_map done on-device) and
search collapses rows to documents by max-over-vectors, exactly."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.data import Corpus, HashTokenizer, TokenizedCorpus
from multihop_dense_retrieval_tpu.index import DenseIndex
from multihop_dense_retrieval_tpu.index.build import build_index
from multihop_dense_retrieval_tpu.models.retriever import MultiVectorCtxEncoder
from multihop_dense_retrieval_tpu.ops.mips import (merge_multivector,
                                                   mips_topk)
from tests import synth


def _brute_doc_topk(emb, queries, k, m):
    """Host reference: doc score = max over the doc's m vectors."""
    scores = queries @ emb.T                       # (B, N*m)
    doc_scores = scores.reshape(queries.shape[0], -1, m).max(axis=2)
    idx = np.argsort(-doc_scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(doc_scores, idx, axis=1), idx


def test_merge_multivector_matches_bruteforce():
    rng = np.random.RandomState(0)
    n_docs, m, d, b, k = 50, 3, 16, 7, 5
    emb = rng.randn(n_docs * m, d).astype(np.float32)
    q = rng.randn(b, d).astype(np.float32)
    vals, rows = mips_topk(jnp.asarray(emb), jnp.asarray(q), k * m,
                           use_pallas=False, chunk_rows=32)
    dv, di = merge_multivector(vals, rows, k, m)
    bv, bi = _brute_doc_topk(emb, q, k, m)
    np.testing.assert_array_equal(np.asarray(di), bi)
    np.testing.assert_allclose(np.asarray(dv), bv, rtol=1e-5)


def test_merge_multivector_m1_passthrough():
    vals = jnp.asarray([[3.0, 2.0, 1.0]])
    rows = jnp.asarray([[5, 1, 9]])
    v, r = merge_multivector(vals, rows, 3, 1)
    np.testing.assert_array_equal(np.asarray(r), [[5, 1, 9]])


def test_mv_encoder_build_index_roundtrip(tmp_path):
    """encode (multi_vector=3, tokenwise) -> DenseIndex -> save/load ->
    search returns DOC ids, and a query equal to one of a doc's token
    vectors retrieves that doc first."""
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(5)
    corpus = Corpus(synth.make_corpus(rng, 20))
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=32)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64)
    m = 3
    model = MultiVectorCtxEncoder(cfg, multi_vector=m, scheme="tokenwise")
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))

    def encode_fn(p, ids, mask, *tt):
        return model.apply(p, ids, mask, *tt)

    index = build_index(encode_fn, params, tc, tok.spec, max_c_len=48,
                        batch_size=8, chunk_rows=16, dtype=jnp.float32,
                        multi_vector=m)
    assert index.multi_vector == m
    assert index.n_docs == 20 * m          # rows
    assert index.n_passages == 20          # documents

    p = str(tmp_path / "mv.npz")
    index.save(p)
    loaded = DenseIndex.load(p)
    assert loaded.multi_vector == m and loaded.n_passages == 20

    # query with doc 7's SECOND vector: only max-over-vectors finds it
    emb = np.asarray(index.vectors, np.float32)[: index.n_docs]
    q = emb[7 * m + 1: 7 * m + 2] * 5.0
    vals, rows = mips_topk(loaded.vectors, jnp.asarray(q), 4 * m,
                           use_pallas=False, chunk_rows=16,
                           n_valid=loaded.n_docs)
    dv, di = merge_multivector(vals, rows, 4, m)
    assert int(np.asarray(di)[0, 0]) == 7
    bv, bi = _brute_doc_topk(emb, q, 4, m)
    np.testing.assert_array_equal(np.asarray(di), bi)


def test_mv_cli_encode_then_search(tmp_path, capsys):
    """Full published workflow with --multi-vector 3: encode_corpus CLI ->
    eval CLI search returns doc ids (< n docs) and valid chains."""
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_mhop_retrieval

    rng = np.random.RandomState(9)
    docs = synth.make_corpus(rng, 24)
    corpus_path = tmp_path / "corpus.jsonl"
    synth.write_jsonl(corpus_path, [{"title": d["title"], "text": d["text"]}
                                    for d in docs])
    rows = synth.make_mhop_rows(rng, docs, n_rows=6)
    qas_path = tmp_path / "qas.jsonl"
    synth.write_jsonl(qas_path, rows)

    out_dir = str(tmp_path / "index_mv")
    encode_corpus.main([str(corpus_path), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "32",
                        "--max-c-len", "48", "--multi-vector", "3"])
    idx = DenseIndex.load(f"{out_dir}/index.npz")
    assert idx.multi_vector == 3 and idx.n_passages == 24

    chains_path = str(tmp_path / "chains.jsonl")
    agg, outputs = eval_mhop_retrieval.main(
        [str(qas_path), out_dir,
         "--tokenizer", "hash", "--model-name", "tiny",
         "--beam-size", "3", "--topk", "3", "--batch-size", "6",
         "--chunk-rows", "32", "--max-q-len", "24", "--max-q-sp-len", "96",
         "--save-path", chains_path])
    assert len(outputs) == 6
    titles = {d["title"] for d in docs}
    for o in outputs:
        for chain in o["candidate_chains"]:
            for hop in chain:
                assert hop["title"] in titles  # doc ids resolved, not rows


def test_mv_encoder_projected_space_matches_query_encoder():
    """With project=True (default), a multi_vector=1 corpus vector is
    IDENTICAL to MhopRetriever.encode_seq under the same weights — corpus
    rows and query vectors share one embedding space (the round-2 advisor
    found the unprojected variant silently mismatched spaces)."""
    from multihop_dense_retrieval_tpu.models import MhopRetriever

    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64)
    retriever = MhopRetriever(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 500, (4, 12)),
                      jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)
    params = retriever.init(jax.random.PRNGKey(0), ids, mask,
                            method=retriever.encode_seq)
    q_vec = retriever.apply(params, ids, mask, method=retriever.encode_seq)

    mv = MultiVectorCtxEncoder(cfg, multi_vector=1)
    c_vec = mv.apply(params, ids, mask)   # same param tree: encoder+project
    np.testing.assert_allclose(np.asarray(q_vec), np.asarray(c_vec),
                               rtol=1e-6)
    # tokenwise m=3: row 0 of each passage group == the projected CLS
    mv3 = MultiVectorCtxEncoder(cfg, multi_vector=3)
    c3 = np.asarray(mv3.apply(params, ids, mask))
    np.testing.assert_allclose(c3[::3], np.asarray(q_vec), rtol=1e-6)


def test_multivector_pca_certified_doc_topk():
    """PCA prefilter over a multi-vector index: certified ROW results merge
    to exact DOC results (the layout doc = row // m survives the tier)."""
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_pca, train_pca_rotation, build_pca_prefilter)

    rng = np.random.RandomState(9)
    n_docs, m, d, b, k = 1024, 2, 64, 8, 3
    basis = np.linalg.qr(rng.randn(d, d))[0]
    z = rng.randn(n_docs * m, 12) * np.linspace(3.0, 0.8, 12)
    emb = (z @ basis[:, :12].T + 0.02 * rng.randn(n_docs * m, d)) \
        .astype(np.float32)
    rot = train_pca_rotation(emb[:1024], 32)
    proj, bounds = build_pca_prefilter(emb, rot, cand_rows=128,
                                       store_dtype="float32")
    # planted queries: noisy copies of existing rows
    qrows = rng.choice(n_docs * m, b, replace=False)
    q = jnp.asarray(emb[qrows] + 0.05 * rng.randn(b, d).astype(np.float32))
    vals, rows, cert = mips_topk_pca(
        jnp.asarray(emb), jnp.asarray(proj, jnp.bfloat16), jnp.asarray(rot),
        jnp.asarray(bounds), q, k * m, k_chunks=7, cand_rows=128,
        step_rows=512, interpret=True)
    dv, di = merge_multivector(vals, rows, k, m)
    bv, bi = _brute_doc_topk(emb, np.asarray(q), k, m)
    cert = np.asarray(cert)
    assert cert.mean() >= 0.5, f"certification rate too low: {cert.mean()}"
    for r in np.nonzero(cert)[0]:
        np.testing.assert_array_equal(np.asarray(di)[r], bi[r])
