"""--hnsw serving mode: exact and approximate engines agree on synthetic data."""

import json

import numpy as np

from tests import synth


def test_eval_hnsw_matches_exact(tmp_path, capsys):
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_mhop_retrieval

    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 64)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    synth.write_jsonl(tmp_path / "qas.jsonl", rows)
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "16", "--chunk-rows", "32",
                        "--max-c-len", "48"])
    base = [str(tmp_path / "qas.jsonl"), out_dir,
            "--tokenizer", "hash", "--model-name", "tiny",
            "--beam-size", "3", "--topk", "3", "--batch-size", "8",
            "--max-q-len", "16", "--max-q-sp-len", "72", "--chunk-rows", "32"]
    eval_mhop_retrieval.main(base)
    exact = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    eval_mhop_retrieval.main(base + ["--hnsw", "--ef-search", "64"])
    approx = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # tiny corpus + ef 64: HNSW should reproduce the exact metrics
    for k in ("avg_pr", "avg_p_em", "avg_1_recall", "path_recall"):
        assert abs(exact[k] - approx[k]) <= 0.25, (k, exact[k], approx[k])
    import os
    assert os.path.exists(f"{out_dir}/index.hnsw")
