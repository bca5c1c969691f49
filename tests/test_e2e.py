"""Full-stack smoke: encode corpus → 2-hop retrieval → reader answers via the
end2end CLI, plus the QA training CLI, on synthetic data."""

import json

import numpy as np
import pytest

from tests import synth


def _qa_rows(n=3):
    rows = []
    for i in range(n):
        sp = [{"title": f"G{i}a", "sents": ["the answer is paris ."],
               "sp_sent_ids": [0]},
              {"title": f"G{i}b", "sents": ["another sentence here ."],
               "sp_sent_ids": []}]
        negs = [[{"title": f"N{i}{j}a", "sents": ["noise text one ."]},
                 {"title": f"N{i}{j}b", "sents": ["noise text two ."]}]
                for j in range(3)]
        rows.append({"question": f"where is it {i}?", "_id": f"q{i}",
                     "answer": ["paris"], "type": "bridge", "sp": sp,
                     "candidate_chains": [sp] + negs})
    return rows


def test_train_qa_cli(tmp_path):
    from multihop_dense_retrieval_tpu.cli import train_qa

    rows = _qa_rows()
    synth.write_jsonl(tmp_path / "qa.jsonl", rows)
    res = train_qa.main([
        "--train-file", str(tmp_path / "qa.jsonl"),
        "--predict-file", str(tmp_path / "qa.jsonl"),
        "--output-dir", str(tmp_path / "out"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "2", "--learning-rate", "1e-3",
        "--max-seq-len", "96", "--max-q-len", "12",
        "--num-answer-slots", "4", "--max-sents", "8", "--neg-num", "3",
        "--max-ans-len", "8", "--warmup-ratio", "0.0"])
    assert res is not None and res["n_questions"] == 3
    # reload best ckpt and predict
    res2 = train_qa.main([
        "--do-predict", "--predict-file", str(tmp_path / "qa.jsonl"),
        "--checkpoint", str(tmp_path / "out" / "checkpoint_best"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--predict-batch-size", "4", "--max-seq-len", "96",
        "--max-q-len", "12", "--num-answer-slots", "4", "--max-sents", "8",
        "--max-ans-len", "8"])
    assert res2["n_questions"] == 3


def test_end2end_cli(tmp_path, capsys):
    from multihop_dense_retrieval_tpu.cli import encode_corpus, end2end

    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 32)
    rows = synth.make_mhop_rows(rng, docs, n_rows=6)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    synth.write_jsonl(tmp_path / "qas.jsonl", rows)
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "16", "--chunk-rows", "32",
                        "--max-c-len", "64"])
    res = end2end.main([str(tmp_path / "qas.jsonl"), out_dir,
                        "--tokenizer", "hash",
                        "--retriever-model", "tiny", "--reader-model", "tiny",
                        "--beam-size", "2", "--topk", "2",
                        "--batch-size", "6", "--max-q-len", "24",
                        "--max-q-sp-len", "96", "--max-seq-len", "128",
                        "--chunk-rows", "32", "--max-ans-len", "8"])
    assert res["n"] == 6
    assert res["answer_em"] is not None  # computed (random weights → low)
    # opt-in bf16 reader attention scores thread through the whole CLI
    res_bf16 = end2end.main([str(tmp_path / "qas.jsonl"), out_dir,
                             "--tokenizer", "hash",
                             "--retriever-model", "tiny",
                             "--reader-model", "tiny",
                             "--reader-bf16-scores",
                             "--beam-size", "2", "--topk", "2",
                             "--batch-size", "6", "--max-q-len", "24",
                             "--max-q-sp-len", "96", "--max-seq-len", "128",
                             "--chunk-rows", "32", "--max-ans-len", "8"])
    assert res_bf16["n"] == 6
    # two-stage read flags thread through the CLI (top-1 of 4 chains read
    # fully; answers stay computable)
    res_2s = end2end.main([str(tmp_path / "qas.jsonl"), out_dir,
                           "--tokenizer", "hash",
                           "--retriever-model", "tiny",
                           "--reader-model", "tiny",
                           "--rank-topm", "1", "--rank-width", "64",
                           "--beam-size", "2", "--topk", "2",
                           "--batch-size", "6", "--max-q-len", "24",
                           "--max-q-sp-len", "96", "--max-seq-len", "128",
                           "--chunk-rows", "32", "--max-ans-len", "8"])
    assert res_2s["n"] == 6 and res_2s["answer_em"] is not None


def test_end2end_unified_variable_hop(tmp_path):
    """--unified on the end2end CLI: stop-fired beams are read as ONE-passage
    chains, answers stay computable."""
    from multihop_dense_retrieval_tpu.cli import encode_corpus, end2end

    rng = np.random.RandomState(4)
    docs = synth.make_corpus(rng, 20)
    rows = synth.make_mhop_rows(rng, docs, n_rows=4)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    synth.write_jsonl(tmp_path / "qas.jsonl", rows)
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32", "--unified"])
    res = end2end.main([str(tmp_path / "qas.jsonl"), out_dir,
                        "--tokenizer", "hash",
                        "--retriever-model", "tiny", "--reader-model", "tiny",
                        "--unified", "--stop-threshold", "-1",  # all 1-hop
                        "--beam-size", "2", "--topk", "2",
                        "--batch-size", "4", "--max-q-len", "16",
                        "--max-q-sp-len", "48", "--max-seq-len", "96",
                        "--chunk-rows", "16", "--max-ans-len", "6"])
    assert res["n"] == 4 and res["answer_em"] is not None
