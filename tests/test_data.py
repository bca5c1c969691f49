"""Data layer tests: tokenization layouts, dataset semantics, loader shapes."""

import numpy as np
import pytest

from multihop_dense_retrieval_tpu.data import (
    HashTokenizer, MhopDataset, mhop_collate, Corpus, TokenizedCorpus,
    BatchLoader,
)
from tests import synth


@pytest.fixture
def tok():
    return HashTokenizer(vocab_size=512)


def test_encode_one_layout(tok):
    out = tok.encode_one("hello world", 8)
    ids, mask = out["input_ids"], out["attention_mask"]
    s = tok.spec
    assert ids[0] == s.cls_id and ids[3] == s.sep_id
    assert list(mask) == [1, 1, 1, 1, 0, 0, 0, 0]
    assert all(ids[4:] == s.pad_id)


def test_encode_pair_roberta_layout(tok):
    out = tok.encode_pair("a b", "c d e", 12)
    ids = out["input_ids"]
    s = tok.spec
    # <s> a b </s> </s> c d e </s>
    assert ids[0] == s.cls_id
    assert ids[3] == s.sep_id and ids[4] == s.sep_id
    assert ids[8] == s.sep_id
    assert out["attention_mask"].sum() == 9
    assert "token_type_ids" not in out


def test_encode_pair_bert_layout():
    tok = HashTokenizer(vocab_size=512, roberta_style=False)
    out = tok.encode_pair("a b", "c d e", 12)
    ids, types = out["input_ids"], out["token_type_ids"]
    s = tok.spec
    # [CLS] a b [SEP] c d e [SEP]
    assert ids[0] == s.cls_id and ids[3] == s.sep_id and ids[7] == s.sep_id
    assert list(types[:8]) == [0, 0, 0, 0, 1, 1, 1, 1]


def test_encode_pair_longest_first_truncation(tok):
    long_b = " ".join(f"x{i}" for i in range(50))
    out = tok.encode_pair("a b c", long_b, 20)
    assert out["attention_mask"].sum() == 20
    ids = out["input_ids"]
    # question survives intact (it's the shorter side)
    assert ids[1] == tok.tokenize_ids("a")[0]
    assert ids[3] == tok.tokenize_ids("c")[0]


def test_mhop_dataset_semantics(tmp_path, tok):
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 32)
    rows = synth.make_mhop_rows(rng, docs, n_rows=6)
    path = tmp_path / "train.jsonl"
    synth.write_jsonl(path, rows)

    ds = MhopDataset(tok, str(path), max_q_len=24, max_q_sp_len=64,
                     max_c_len=48, train=True)
    item = ds[0]
    assert item["q_input_ids"].shape == (24,)
    assert item["q_sp_input_ids"].shape == (64,)
    assert item["c1_input_ids"].shape == (48,)
    # bridge question: c2 must be the bridge-titled para
    bridge_title = rows[0]["bridge"]
    expect = tok.encode_pair(bridge_title, rows[0]["pos_paras"][1]["text"], 48)
    np.testing.assert_array_equal(item["c2_input_ids"], expect["input_ids"])
    # question mark stripped: q tokens end before '?' hash would appear
    q_no_mark = rows[0]["question"][:-1]
    expect_q = tok.encode_one(q_no_mark, 24)
    np.testing.assert_array_equal(item["q_input_ids"], expect_q["input_ids"])

    batch = mhop_collate([ds[i] for i in range(4)])
    assert batch["q_input_ids"].shape == (4, 24)
    assert batch["neg2_mask"].shape == (4, 48)


def test_dataset_drops_rows_with_few_negs(tmp_path, tok):
    rng = np.random.RandomState(1)
    docs = synth.make_corpus(rng, 16)
    rows = synth.make_mhop_rows(rng, docs, n_rows=4)
    rows[2]["neg_paras"] = rows[2]["neg_paras"][:1]
    path = tmp_path / "t.jsonl"
    synth.write_jsonl(path, rows)
    assert len(MhopDataset(tok, str(path), train=True)) == 3
    assert len(MhopDataset(tok, str(path), train=False)) == 4


def test_corpus_empty_text_substitution(tok):
    docs = [{"title": "T0", "text": ""}, {"title": "T1", "text": "some body"}]
    corpus = Corpus(docs)
    assert corpus.is_empty(0) and not corpus.is_empty(1)
    assert corpus.encode_text(0) == "T0"
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=16, max_title_len=8)
    assert tc.empty[0] and not tc.empty[1]
    # empty doc's text ids are its title's ids
    tids, tlen = tok.raw_ids_padded("T0", 16)
    np.testing.assert_array_equal(tc.text_ids[0], tids)


def test_tokenized_corpus_roundtrip(tmp_path, tok):
    rng = np.random.RandomState(2)
    corpus = Corpus(synth.make_corpus(rng, 8, empty_every=4))
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=32)
    p = str(tmp_path / "tc.npz")
    tc.save(p)
    tc2 = TokenizedCorpus.load(p)
    np.testing.assert_array_equal(tc.text_ids, tc2.text_ids)
    np.testing.assert_array_equal(tc.empty, tc2.empty)


def test_tokenized_corpus_save_rejects_wide_vocab(tmp_path, tok):
    """Token ids are stored uint16 on disk; a >=65536 id must fail loudly
    instead of wrapping silently (round-2 VERDICT weak #5)."""
    rng = np.random.RandomState(2)
    corpus = Corpus(synth.make_corpus(rng, 4))
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=16)
    tc.text_ids[0, 0] = 70_000
    with pytest.raises(ValueError, match="uint16"):
        tc.save(str(tmp_path / "bad.npz"))


def test_batch_loader_static_shapes(tmp_path, tok):
    rng = np.random.RandomState(3)
    docs = synth.make_corpus(rng, 32)
    rows = synth.make_mhop_rows(rng, docs, n_rows=10)
    path = tmp_path / "t.jsonl"
    synth.write_jsonl(path, rows)
    ds = MhopDataset(tok, str(path), max_q_len=16, max_q_sp_len=32, max_c_len=24)
    # train: drop last
    train_batches = list(BatchLoader(ds, 4, shuffle=True, num_workers=2))
    assert len(train_batches) == 2
    assert all(b["q_input_ids"].shape == (4, 16) for b in train_batches)
    # eval: pad + valid mask
    ev = list(BatchLoader(ds, 4, shuffle=False, num_workers=1))
    assert len(ev) == 3
    assert ev[-1]["valid"].sum() == 2
    assert ev[-1]["q_input_ids"].shape == (4, 16)


def test_corpus_from_id2doc_both_formats(tmp_path):
    import json
    # reference id2doc can be dict-of-lists or dict-of-dicts
    # (eval_mhop_retrieval.py:131-133)
    as_list = {"0": ["Title A", "text a"], "1": ["Title B", "text b"]}
    as_dict = {"0": {"title": "Title A", "text": "text a"},
               "1": {"title": "Title B", "text": "text b"}}
    for i, table in enumerate((as_list, as_dict)):
        p = tmp_path / f"id2doc{i}.json"
        p.write_text(json.dumps(table))
        c = Corpus.from_id2doc(str(p))
        assert len(c) == 2
        assert c[1]["title"] == "Title B" and c[1]["text"] == "text b"


def test_dense_index_from_reference_npy(tmp_path):
    import jax.numpy as jnp
    from multihop_dense_retrieval_tpu.index.store import DenseIndex

    rng = np.random.RandomState(0)
    emb = rng.randn(100, 16).astype(np.float32)
    p = str(tmp_path / "wiki_index.npy")
    np.save(p, emb)
    idx = DenseIndex.from_reference_npy(p, chunk_rows=64, dtype=jnp.float32)
    assert idx.n_docs == 100
    assert idx.vectors.shape[0] % 64 == 0
    np.testing.assert_allclose(np.asarray(idx.vectors[:100]), emb, rtol=1e-6)


def test_batch_loader_deterministic_across_workers(tmp_path, tok):
    """Per-sample RNG streams: batch CONTENT must be identical for any
    worker count and across same-seed runs (review r3 finding — pool
    workers raced the dataset's shared RandomState, so seeded runs were
    not reproducible and resume replay silently diverged)."""
    rng = np.random.RandomState(3)
    docs = synth.make_corpus(rng, 40)
    rows = synth.make_mhop_rows(rng, docs, n_rows=13)
    for r in rows:       # many shuffleable negs make races visible
        r["neg_paras"] = r["neg_paras"] * 4
    path = tmp_path / "train.jsonl"
    synth.write_jsonl(path, rows)
    kw = dict(max_q_len=16, max_q_sp_len=48, max_c_len=32, train=True)

    def run(workers, seed=11):
        ds = MhopDataset(tok, str(path), **kw)
        return list(BatchLoader(ds, 4, shuffle=True, seed=seed,
                                num_workers=workers))

    a, b, c = run(1), run(4), run(4)
    assert len(a) == len(b) == 3      # 13 rows, drop_last
    for ba, bb, bc in zip(a, b, c):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
            np.testing.assert_array_equal(bb[k], bc[k])
    # a different seed changes content (the negatives really shuffle)
    d = run(4, seed=12)
    assert any(not np.array_equal(a[i]["neg1_input_ids"],
                                  d[i]["neg1_input_ids"])
               for i in range(3))


def test_fever_sampler_len_matches_epoch():
    from multihop_dense_retrieval_tpu.data.unified_dataset import FeverSampler

    s = FeverSampler(single_ids=[0], multi_ids=[1, 2, 3], ratio=2, seed=0)
    assert len(s) == len(s.epoch_indices()) == 4
    s2 = FeverSampler(single_ids=list(range(10)), multi_ids=[1, 2, 3],
                      ratio=2, seed=0)
    assert len(s2) == len(s2.epoch_indices()) == 9


def test_chain_metrics_rejects_empty_sp():
    from multihop_dense_retrieval_tpu.eval.retrieval_metrics import chain_metrics

    import pytest
    with pytest.raises(ValueError, match="bad gold SP"):
        chain_metrics([], "bridge", [["A", "B"]], ["A"])
    with pytest.raises(ValueError, match="bad gold SP"):
        chain_metrics(["A"], "comparison", [["A", "B"]], ["A"])
    # single-hop rows (unified serving) may carry one title
    m = chain_metrics(["A"], "single", [["A", "B"]], ["A"])
    assert m["p_em"] == 1 and m["p_recall"] == 1
