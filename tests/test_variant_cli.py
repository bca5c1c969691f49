"""CLI tests for the unified and FEVER training variants."""

import json

import numpy as np

from tests import synth


def test_train_unified_cli(tmp_path):
    from multihop_dense_retrieval_tpu.cli import train_retriever

    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 24)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    rows[1]["type"] = "single"
    rows[1]["pos_paras"] = rows[1]["pos_paras"][:1]
    synth.write_jsonl(tmp_path / "t.jsonl", rows)
    res = train_retriever.main([
        "--train-file", str(tmp_path / "t.jsonl"),
        "--predict-file", str(tmp_path / "t.jsonl"),
        "--tokenizer", "hash", "--model-name", "tiny", "--unified",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--max-q-len", "12", "--max-q-sp-len", "32", "--max-c-len", "24",
        "--data-parallel", "2"])
    assert res["best_mrr"] > 0


def test_train_momentum_fever_cli(tmp_path):
    from multihop_dense_retrieval_tpu.cli import train_momentum

    rows = []
    for i in range(8):
        rows.append({
            "claim": f"claim number {i} about things",
            "evidence": [[{"title": f"A{i}", "text": f"evi text {i}"},
                          {"title": f"B{i}", "text": f"second text {i}"}]],
            "tfidf_neg": [{"title": f"N{i}", "text": "neg text"}],
            "linked_neg": [{"title": f"L{i}", "text": "neg two"}]})
    synth.write_jsonl(tmp_path / "fever_train.jsonl", rows)
    res = train_momentum.main([
        "--train-file", str(tmp_path / "fever_train.jsonl"),
        "--predict-file", str(tmp_path / "fever_train.jsonl"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--max-q-len", "12", "--max-q-sp-len", "32", "--max-c-len", "24",
        "--queue-size", "32", "--data-parallel", "2"])
    assert np.isfinite(res["final_loss"])
