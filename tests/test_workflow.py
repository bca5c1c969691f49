"""The reference's full published workflow as one chain (README.md:131-176):
stage-1 contrastive training → stage-2 memory-bank finetuning initialized
from the stage-1 checkpoint → corpus encoding with the trained weights →
2-hop retrieval eval with the same checkpoint."""

import json
import os

import numpy as np

from tests import synth


def test_full_training_to_eval_workflow(tmp_path, capsys):
    from multihop_dense_retrieval_tpu.cli import (
        train_retriever, train_momentum, encode_corpus, eval_mhop_retrieval)

    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 32)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    synth.write_jsonl(tmp_path / "train.jsonl", rows)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    common = ["--tokenizer", "hash", "--model-name", "tiny",
              "--max-q-len", "16", "--max-q-sp-len", "48", "--max-c-len", "32"]

    # stage 1
    out1 = str(tmp_path / "stage1")
    train_retriever.main([
        "--train-file", str(tmp_path / "train.jsonl"),
        "--predict-file", str(tmp_path / "train.jsonl"),
        "--output-dir", out1, "--train-batch-size", "4",
        "--predict-batch-size", "4", "--num-epochs", "1",
        "--learning-rate", "1e-4", "--data-parallel", "2"] + common)
    ckpt = os.path.join(out1, "checkpoint_best")
    assert os.path.isdir(ckpt)

    # stage 2: momentum finetuning from the stage-1 checkpoint
    res2 = train_momentum.main([
        "--train-file", str(tmp_path / "train.jsonl"),
        "--predict-file", str(tmp_path / "train.jsonl"),
        "--init-checkpoint", ckpt, "--queue-size", "32",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--data-parallel", "2"] + common)
    assert np.isfinite(res2["final_loss"])

    # index + eval with the trained checkpoint
    idx_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), idx_dir,
                        "--checkpoint", ckpt, "--batch-size", "8",
                        "--chunk-rows", "16", "--max-c-len", "32",
                        "--tokenizer", "hash", "--model-name", "tiny"])
    eval_mhop_retrieval.main([str(tmp_path / "train.jsonl"), idx_dir,
                              "--checkpoint", ckpt, "--beam-size", "3",
                              "--topk", "3", "--batch-size", "4",
                              "--chunk-rows", "16",
                              "--tokenizer", "hash", "--model-name", "tiny",
                              "--max-q-len", "16", "--max-q-sp-len", "48"])
    agg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # trained (1 epoch, tiny) — metrics exist and are valid probabilities
    assert 0.0 <= agg["avg_p_em"] <= 1.0
    assert agg["n"] == 8
