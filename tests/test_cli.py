"""End-to-end CLI smoke tests on synthetic data: encode corpus → search eval
→ (tiny) retriever training.  These are the framework's equivalent of the
reference's README workflows."""

import json

import numpy as np
import pytest

from tests import synth


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 48, empty_every=9)
    rows = synth.make_mhop_rows(rng, docs, n_rows=12)
    corpus_path = tmp / "corpus.jsonl"
    synth.write_jsonl(corpus_path, [{"title": d["title"], "text": d["text"]}
                                    for d in docs])
    qas_path = tmp / "qas.jsonl"
    synth.write_jsonl(qas_path, rows)
    train_path = tmp / "train.jsonl"
    synth.write_jsonl(train_path, rows)
    return tmp, corpus_path, qas_path, train_path


def test_encode_then_eval(artifacts, capsys):
    tmp, corpus_path, qas_path, _ = artifacts
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_mhop_retrieval

    out_dir = str(tmp / "index")
    encode_corpus.main([str(corpus_path), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "16", "--chunk-rows", "64",
                        "--max-c-len", "64"])
    import os
    assert os.path.exists(f"{out_dir}/index.npz")
    assert os.path.exists(f"{out_dir}/tokens.npz")
    assert os.path.exists(f"{out_dir}/id2doc.json")

    chains_path = str(tmp / "chains.jsonl")
    eval_mhop_retrieval.main([str(qas_path), out_dir,
                              "--tokenizer", "hash", "--model-name", "tiny",
                              "--beam-size", "3", "--topk", "3",
                              "--batch-size", "6", "--chunk-rows", "64",
                              "--max-q-len", "24", "--max-q-sp-len", "96",
                              "--save-path", chains_path])
    out = capsys.readouterr().out
    agg = json.loads(out.strip().splitlines()[-1])
    assert set(agg) >= {"avg_pr", "avg_p_em", "avg_1_recall", "path_recall"}
    with open(chains_path) as f:
        chains = [json.loads(l) for l in f]
    assert len(chains) == 12
    assert len(chains[0]["candidate_chains"]) == 3
    assert {"title", "text"} <= set(chains[0]["candidate_chains"][0][0])


def test_eval_hop2_tiling_flag_parity(artifacts, tmp_path, capsys):
    """--hop2-buckets (now wired through the serving CLIs) must not change
    results: an auto-tiled run (batch 48 x beam 3 = 144 rows -> the 5-tile
    preset clipped to max-q-sp-len 200) emits the same chains as
    --hop2-buckets off."""
    tmp, corpus_path, qas_path, _ = artifacts
    from multihop_dense_retrieval_tpu.cli import (encode_corpus,
                                                  eval_mhop_retrieval)

    out_dir = str(tmp / "index_tiling")
    encode_corpus.main([str(corpus_path), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "16", "--chunk-rows", "64",
                        "--max-c-len", "64"])

    def run(flags, name):
        path = str(tmp_path / name)
        eval_mhop_retrieval.main([str(qas_path), out_dir,
                                  "--tokenizer", "hash",
                                  "--model-name", "tiny",
                                  "--beam-size", "3", "--topk", "3",
                                  "--batch-size", "48", "--chunk-rows", "64",
                                  "--max-q-len", "24",
                                  "--max-q-sp-len", "200",
                                  "--save-path", path] + flags)
        capsys.readouterr()
        with open(path) as f:
            return [json.loads(l) for l in f]

    off = run(["--hop2-buckets", "off"], "off.jsonl")
    auto = run([], "auto.jsonl")          # default --hop2-buckets auto
    assert auto == off


def test_eval_mhop_fever(artifacts, tmp_path):
    """FEVER claims path: asymmetric beams + the reference dump schema —
    rows keyed id/claim with candidate_chains as (title, text) PAIRS
    (eval_mhop_fever.py:160-170), not {title, text} dicts."""
    tmp, corpus_path, qas_path, _ = artifacts
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_mhop_fever

    out_dir = str(tmp / "index_fever")
    encode_corpus.main([str(corpus_path), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "16", "--chunk-rows", "64",
                        "--max-c-len", "64"])
    claims_path = tmp_path / "claims.jsonl"
    claims = [{"id": 1000 + i, "claim": f"claim number {i} about topic"}
              for i in range(5)]
    synth.write_jsonl(claims_path, claims)

    dump_path = str(tmp_path / "fever_chains.jsonl")
    eval_mhop_fever.main([str(claims_path), out_dir,
                          "--tokenizer", "hash", "--model-name", "tiny",
                          "--beam-size-1", "2", "--beam-size-2", "4",
                          "--topk", "4", "--batch-size", "5",
                          "--chunk-rows", "64",
                          "--max-q-len", "24", "--max-q-sp-len", "96",
                          "--save-path", dump_path])
    with open(dump_path) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 5
    r = rows[0]
    assert set(r) == {"id", "claim", "candidate_chains"}
    assert r["id"] == 1000 and r["claim"].startswith("claim number 0")
    assert len(r["candidate_chains"]) == 4
    chain = r["candidate_chains"][0]
    assert len(chain) == 2           # (hop1, hop2)
    for hop in chain:                # (title, text) pair, JSON -> list
        assert isinstance(hop, list) and len(hop) == 2
        assert all(isinstance(x, str) for x in hop)


def test_train_cli(artifacts):
    tmp, _, qas_path, train_path = artifacts
    from multihop_dense_retrieval_tpu.cli import train_retriever

    result = train_retriever.main([
        "--train-file", str(train_path), "--predict-file", str(qas_path),
        "--output-dir", str(tmp / "train_out"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--max-q-len", "16", "--max-q-sp-len", "48", "--max-c-len", "32",
        "--data-parallel", "2"])
    assert result["best_mrr"] > 0


def test_train_momentum_cli(artifacts):
    tmp, _, qas_path, train_path = artifacts
    from multihop_dense_retrieval_tpu.cli import train_momentum

    result = train_momentum.main([
        "--train-file", str(train_path), "--predict-file", str(qas_path),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--max-q-len", "16", "--max-q-sp-len", "48", "--max-c-len", "32",
        "--queue-size", "64", "--data-parallel", "2"])
    assert np.isfinite(result["final_loss"])


def test_encode_corpus_bert_style_and_int8(tmp_path):
    """BERT-style tokenizer path (token_type_ids through passage assembly)
    and the int8 index option, end to end."""
    from multihop_dense_retrieval_tpu.data import HashTokenizer, Corpus, TokenizedCorpus
    from multihop_dense_retrieval_tpu.index.build import build_index
    from multihop_dense_retrieval_tpu.models import MhopRetriever
    from multihop_dense_retrieval_tpu.core.config import EncoderConfig
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 24)
    corpus = Corpus(docs)
    tok = HashTokenizer(vocab_size=512, roberta_style=False)
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=32)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64,
                             type_vocab_size=2, pad_token_id=0,
                             roberta_positions=False)
    model = MhopRetriever(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids,
                        method=model.encode_seq)

    def encode_fn(p, i, m, *t):
        return model.apply(p, i, m, *t, method=model.encode_seq)

    idx = build_index(encode_fn, params, tc, tok.spec, max_c_len=48,
                      batch_size=8, chunk_rows=16, dtype=jnp.int8)
    assert idx.vectors.dtype == jnp.int8
    assert idx.scales is not None and idx.n_docs == 24


def test_length_sorted_corpus_encode_is_exact(tmp_path):
    """length_sort=True (the fast path: sorted docs, per-batch bucketed
    widths) must produce the SAME embeddings in the SAME order as the
    plain full-width encode — narrowing only drops masked pad columns."""
    from multihop_dense_retrieval_tpu.data import (HashTokenizer, Corpus,
                                                   TokenizedCorpus)
    from multihop_dense_retrieval_tpu.index.build import encode_corpus
    from multihop_dense_retrieval_tpu.models import (MhopRetriever,
                                                     MultiVectorCtxEncoder)
    from multihop_dense_retrieval_tpu.core.config import EncoderConfig
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    docs = synth.make_corpus(rng, 30, empty_every=9)
    # strongly varied text lengths so batches land in different buckets
    for i, d in enumerate(docs):
        d["text"] = " ".join(d["text"].split()[: 2 + (i * 7) % 40])
    corpus = Corpus(docs)
    tok = HashTokenizer(vocab_size=512)
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=48)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=96)
    model = MhopRetriever(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids,
                        method=model.encode_seq)

    def encode_fn(p, i, m, *t):
        return model.apply(p, i, m, *t, method=model.encode_seq)

    plain = encode_corpus(encode_fn, params, tc, tok.spec, max_c_len=64,
                          batch_size=8, length_sort=False)
    fast = encode_corpus(encode_fn, params, tc, tok.spec, max_c_len=64,
                         batch_size=8, length_sort=True)
    np.testing.assert_allclose(fast, plain, rtol=1e-6, atol=1e-6)

    # multi-vector rows keep the grouped-per-doc order under the scatter
    mv_model = MultiVectorCtxEncoder(cfg, multi_vector=2)
    mv_params = mv_model.init(jax.random.PRNGKey(1), ids, ids)

    def mv_fn(p, i, m, *t):
        return mv_model.apply(p, i, m, *t)

    plain = encode_corpus(mv_fn, mv_params, tc, tok.spec, max_c_len=64,
                          batch_size=8, multi_vector=2, length_sort=False)
    fast = encode_corpus(mv_fn, mv_params, tc, tok.spec, max_c_len=64,
                         batch_size=8, multi_vector=2, length_sort=True)
    assert plain.shape[0] == 60
    np.testing.assert_allclose(fast, plain, rtol=1e-6, atol=1e-6)


def test_unified_variable_hop_eval(artifacts, tmp_path, capsys):
    """--unified serving: the stop head can emit single-passage chains; the
    chain dump carries stop_probs and 1- or 2-passage candidate chains."""
    tmp, corpus_path, qas_path, _ = artifacts
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_mhop_retrieval

    out_dir = str(tmp_path / "index_unified")
    encode_corpus.main([str(corpus_path), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--unified",
                        "--batch-size", "16", "--chunk-rows", "64",
                        "--max-c-len", "64"])
    chains_path = str(tmp_path / "chains_u.jsonl")
    # threshold 0 forces every top chain to stop -> all single-passage;
    # threshold 1 forbids stopping -> all pairs
    for thr, want_len in (("1.1", 2), ("-0.1", 1)):
        eval_mhop_retrieval.main([str(qas_path), out_dir,
                                  "--tokenizer", "hash", "--model-name",
                                  "tiny", "--unified",
                                  "--stop-threshold", thr,
                                  "--beam-size", "3", "--topk", "3",
                                  "--batch-size", "6", "--chunk-rows", "64",
                                  "--max-q-len", "24", "--max-q-sp-len", "96",
                                  "--save-path", chains_path])
        with open(chains_path) as f:
            rows = [json.loads(l) for l in f]
        assert len(rows) == 12
        for r in rows:
            assert len(r["stop_probs"]) == 3
            assert all(0.0 <= p <= 1.0 for p in r["stop_probs"])
            for chain in r["candidate_chains"]:
                assert len(chain) == want_len

    # device-side early stop (--stop-skip): a sub-minimum threshold stops
    # EVERY question after pass 1, so every emitted top chain is the
    # single passage the host layer produces; pipeline must stay healthy
    eval_mhop_retrieval.main([str(qas_path), out_dir,
                              "--tokenizer", "hash", "--model-name",
                              "tiny", "--unified",
                              "--stop-threshold", "-0.1",
                              "--stop-skip", "1e-9",
                              "--beam-size", "3", "--topk", "3",
                              "--batch-size", "6", "--chunk-rows", "64",
                              "--max-q-len", "24", "--max-q-sp-len", "96",
                              "--hop2-buckets", "48,96",
                              "--save-path", chains_path])
    with open(chains_path) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 12
    for r in rows:
        assert len(r["candidate_chains"][0]) == 1

    # --stop-skip without --unified is a usage error, not a silent no-op
    import pytest
    with pytest.raises(SystemExit):
        eval_mhop_retrieval.main([str(qas_path), out_dir,
                                  "--tokenizer", "hash", "--model-name",
                                  "tiny", "--stop-skip", "0.5",
                                  "--beam-size", "3", "--topk", "3",
                                  "--batch-size", "6",
                                  "--chunk-rows", "64"])


def test_encode_eval_with_pca_prefilter(tmp_path, capsys):
    """encode --pca-dims builds the certificate prefilter into index.npz;
    eval --pca searches through it and reports the certified fraction."""
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_mhop_retrieval
    from multihop_dense_retrieval_tpu.index import DenseIndex
    import os

    rng = np.random.RandomState(4)
    docs = synth.make_corpus(rng, 600, empty_every=13)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    corpus_path = tmp_path / "corpus.jsonl"
    synth.write_jsonl(corpus_path, [{"title": d["title"], "text": d["text"]}
                                    for d in docs])
    qas_path = tmp_path / "qas.jsonl"
    synth.write_jsonl(qas_path, rows)
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(corpus_path), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "64", "--chunk-rows", "128",
                        "--max-c-len", "64",
                        "--pca-dims", "32", "--pca-cand-rows", "128"])
    idx = DenseIndex.load(os.path.join(out_dir, "index.npz"))
    assert idx.pca_proj is not None and idx.pca_proj.shape[1] == 32
    assert idx.pca_bounds.shape == (4, idx.vectors.shape[0] // 128)

    chains_path = str(tmp_path / "chains.jsonl")
    eval_mhop_retrieval.main([str(qas_path), out_dir,
                              "--tokenizer", "hash", "--model-name", "tiny",
                              "--pca", "--pca-k-chunks", "3",
                              "--beam-size", "3", "--topk", "3",
                              "--batch-size", "6", "--chunk-rows", "128",
                              "--max-q-len", "24", "--max-q-sp-len", "96",
                              "--save-path", chains_path])
    out = capsys.readouterr().out
    agg = json.loads(out.strip().splitlines()[-1])
    assert set(agg) >= {"avg_pr", "avg_p_em", "avg_1_recall", "path_recall"}
    with open(chains_path) as f:
        assert len([json.loads(l) for l in f]) == 8


def test_encode_corpus_export_npy(tmp_path):
    """--export-npy writes the reference's raw fp32 matrix (np.load + FAISS
    add) alongside our index, and the built index matches it."""
    import jax.numpy as jnp

    from multihop_dense_retrieval_tpu.cli import encode_corpus
    from tests import synth

    rng = np.random.RandomState(5)
    docs = synth.make_corpus(rng, 24)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    out = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32", "--export-npy"])
    import os

    emb = np.load(os.path.join(out, "wiki_index.npy"))
    assert emb.dtype == np.float32 and emb.shape[0] == 24
    assert np.isfinite(emb).all()
    from multihop_dense_retrieval_tpu.index.store import DenseIndex
    index = DenseIndex.load(os.path.join(out, "index.npz"))
    stored = np.asarray(index.vectors[:24].astype(jnp.float32))
    np.testing.assert_allclose(stored, emb, rtol=0.02, atol=0.02)

    # shards / merge / multi-vector cannot express the reference's
    # one-row-per-doc global matrix — all fail loudly
    for extra in (["--num-shards", "2"], ["--merge-only"],
                  ["--multi-vector", "2"]):
        with pytest.raises(SystemExit):
            encode_corpus.main([str(tmp_path / "corpus.jsonl"), out,
                                "--tokenizer", "hash", "--model-name",
                                "tiny", "--export-npy"] + extra)
