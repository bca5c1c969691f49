"""Golden-parity harness tests (cli/parity).

The real run needs the reference's released checkpoints/index (unavailable
here: zero egress), so these tests pin the harness mechanics: the expected-
numbers table lives in code and matches the reference README block, missing
artifacts are reported cleanly (exit 2), ingestion assembles a searchable
index dir from reference-format artifacts, and the comparator flags
mismatches."""

import json
import os

import numpy as np
import pytest

from multihop_dense_retrieval_tpu.cli import parity


def test_expected_table_matches_reference_readme():
    # spot-pin values transcribed from /root/reference/README.md:74-92
    ov = parity.EXPECTED_RETRIEVAL["overall"]
    assert ov["n"] == 7405
    assert abs(ov["avg_pr"] - 0.8428089128966915) < 1e-12
    assert abs(ov["avg_p_em"] - 0.6592842673869007) < 1e-12
    br = parity.EXPECTED_RETRIEVAL["bridge"]
    assert br["n"] == 5918 and abs(br["avg_1_recall"] - 0.7470429199053734) < 1e-12
    cp = parity.EXPECTED_RETRIEVAL["comparison"]
    assert cp["n"] == 1487
    qa = parity.EXPECTED_QA
    assert abs(qa["joint_f1"] - 0.6631669237532106) < 1e-12


def test_missing_artifacts_exit_2(tmp_path, capsys):
    with pytest.raises(SystemExit) as e:
        parity.main(["--data-dir", str(tmp_path)])
    assert e.value.code == 2
    out = capsys.readouterr().out
    for name in ["checkpoint", "wiki_index", "id2doc", "qas_val"]:
        assert name in out
    assert "download_hotpot" in out


def test_compare_block_tolerance():
    got = {"n": 7405, "avg_pr": 0.8432, "avg_p_em": 0.70}
    exp = {"n": 7405, "avg_pr": 0.8428089128966915,
           "avg_p_em": 0.6592842673869007}
    rows = parity.compare_block(got, exp, tol=0.01, label="overall")
    by_name = {r[0]: r for r in rows}
    assert by_name["overall.n"][3] is True
    assert by_name["overall.avg_pr"][3]          # within tol
    assert not by_name["overall.avg_p_em"][3]    # 0.04 off -> FAIL
    # missing metric -> FAIL, not crash
    rows = parity.compare_block({}, exp, tol=0.01, label="x")
    assert all(not r[3] for r in rows if r[0] != "x.n")


def test_prepare_index_dir_from_reference_artifacts(tmp_path):
    """reference-format wiki_id2doc.json + wiki_index.npy -> searchable
    index dir (same layout as cli/encode_corpus)."""
    from multihop_dense_retrieval_tpu.data.corpus import (Corpus,
                                                          TokenizedCorpus)
    from multihop_dense_retrieval_tpu.data.tokenization import HashTokenizer
    from multihop_dense_retrieval_tpu.index.store import DenseIndex

    rng = np.random.RandomState(3)
    # reference id2doc format: {"0": [title, text, intro_flag], ...}
    id2doc = {str(i): [f"Title {i}", f"text of document {i} body", True]
              for i in range(37)}
    id2doc_path = tmp_path / "wiki_id2doc.json"
    id2doc_path.write_text(json.dumps(id2doc))
    npy_path = tmp_path / "wiki_index.npy"
    np.save(npy_path, rng.randn(37, 16).astype(np.float32))

    cache = str(tmp_path / "cache")
    paths = {"id2doc": str(id2doc_path), "wiki_index": str(npy_path)}
    import logging
    parity.prepare_index_dir(paths, cache, HashTokenizer(vocab_size=512),
                             max_c_len=32, logger=logging.getLogger("t"))
    assert os.path.exists(os.path.join(cache, "index.npz"))
    assert os.path.exists(os.path.join(cache, "tokens.npz"))
    assert os.path.exists(os.path.join(cache, "id2doc.json"))
    idx = DenseIndex.load(os.path.join(cache, "index.npz"))
    assert idx.n_docs == 37
    corpus = Corpus.from_id2doc(os.path.join(cache, "id2doc.json"))
    assert corpus[0]["title"] == "Title 0"
    tc = TokenizedCorpus.load(os.path.join(cache, "tokens.npz"))
    assert tc.text_ids.shape[0] == 37
    # idempotent: a second call reuses the cache (no rebuild crash)
    parity.prepare_index_dir(paths, cache, HashTokenizer(vocab_size=512),
                             max_c_len=32, logger=logging.getLogger("t"))


def test_parity_qa_block_runs(tmp_path):
    """The optional QA parity block scores a retrieved-chains predict file
    with a (tiny) reader and returns exactly the EXPECTED_QA metric keys."""
    import logging
    from types import SimpleNamespace

    rows = []
    for i in range(2):
        sp = [{"title": f"G{i}a", "sents": ["the answer is paris ."],
               "sp_sent_ids": [0]},
              {"title": f"G{i}b", "sents": ["another sentence here ."],
               "sp_sent_ids": []}]
        neg = [{"title": f"N{i}a", "sents": ["noise text one ."]},
               {"title": f"N{i}b", "sents": ["noise text two ."]}]
        rows.append({"question": f"where is it {i}?", "_id": f"q{i}",
                     "answer": ["paris"], "type": "bridge", "sp": sp,
                     "candidate_chains": [sp, neg]})
    pred_file = tmp_path / "retrieved_sp.json"
    pred_file.write_text(json.dumps(rows))

    args = SimpleNamespace(tokenizer="hash", qa_checkpoint="",
                           qa_predict_file=str(pred_file), qa_model="tiny")
    m = parity.run_qa_block(args, logging.getLogger("t"))
    assert set(m) == set(parity.EXPECTED_QA)
    assert all(np.isfinite(v) and 0.0 <= v <= 1.0 for v in m.values())
