"""CLI smoke tests for single-hop training, single-hop eval, demo pipeline,
and the grid launcher."""

import os
import json

import numpy as np
import pytest

from tests import synth


def test_train_single_cli(tmp_path):
    from multihop_dense_retrieval_tpu.cli import train_single

    rows = [{"question": f"what is thing {i}?",
             "pos_paras": [{"title": f"P{i}", "text": f"thing {i} body text"}],
             "neg_paras": [{"title": f"N{i}", "text": "unrelated words"}]}
            for i in range(8)]
    synth.write_jsonl(tmp_path / "sp.jsonl", rows)
    res = train_single.main([
        "--train-file", str(tmp_path / "sp.jsonl"),
        "--predict-file", str(tmp_path / "sp.jsonl"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--max-q-len", "12", "--max-c-len", "24", "--data-parallel", "2"])
    assert res["best_mrr"] > 0

    # token-queue momentum variant (MomentumRetriever parity)
    res = train_single.main([
        "--train-file", str(tmp_path / "sp.jsonl"),
        "--predict-file", str(tmp_path / "sp.jsonl"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--learning-rate", "1e-4",
        "--momentum", "--queue-size", "8",
        "--max-q-len", "12", "--max-c-len", "24", "--data-parallel", "2"])
    assert res["best_mrr"] > 0


def test_eval_retrieval_cli(tmp_path, capsys):
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_retrieval

    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 24)
    docs[3]["text"] = "the secret answer is zanzibar ."
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    qas = [{"question": "where is the secret?", "answer": ["zanzibar"],
            "sp": ["Title 3"]},
           {"question": "unanswerable?", "answer": ["nowhere-word"],
            "sp": ["Title 5"]}]
    synth.write_jsonl(tmp_path / "qas.jsonl", qas)
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32"])
    res = eval_retrieval.main([str(tmp_path / "qas.jsonl"), out_dir,
                               "--tokenizer", "hash", "--model-name", "tiny",
                               "--topk", "20", "--batch-size", "2",
                               "--max-q-len", "16", "--chunk-rows", "16"])
    # top-20 of 24 docs: doc with the answer is almost surely retrieved
    assert res["answer_recall@20"] >= 0.5
    assert "sp_recall@20" in res


def test_demo_single_question(tmp_path):
    from multihop_dense_retrieval_tpu.cli import encode_corpus, demo

    rng = np.random.RandomState(1)
    docs = synth.make_corpus(rng, 16)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32"])
    out = demo.main([out_dir, "--tokenizer", "hash",
                     "--retriever-model", "tiny", "--reader-model", "tiny",
                     "--beam-size", "2", "--topk", "2",
                     "--max-q-len", "16", "--max-q-sp-len", "48",
                     "--max-seq-len", "96", "--max-ans-len", "6",
                     "--chunk-rows", "16",
                     "--question", "what links things?"])
    assert isinstance(out["answer"], str)
    assert len(out["chains"]) == 2
    assert out["retrieval_s"] > 0
    # two-stage read threads through the demo/serve pipeline
    out2 = demo.main([out_dir, "--tokenizer", "hash",
                      "--retriever-model", "tiny", "--reader-model", "tiny",
                      "--beam-size", "2", "--topk", "2",
                      "--rank-topm", "1", "--rank-width", "48",
                      "--max-q-len", "16", "--max-q-sp-len", "48",
                      "--max-seq-len", "96", "--max-ans-len", "6",
                      "--chunk-rows", "16",
                      "--question", "what links things?"])
    assert isinstance(out2["answer"], str)


def test_launch_grid(tmp_path):
    from multihop_dense_retrieval_tpu.cli import launch

    rng = np.random.RandomState(2)
    docs = synth.make_corpus(rng, 24)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    synth.write_jsonl(tmp_path / "t.jsonl", rows)
    best = launch.main([
        "--grid-lr", "1e-4,1e-3", "--grid-warmup", "0.0",
        "--train-file", str(tmp_path / "t.jsonl"),
        "--predict-file", str(tmp_path / "t.jsonl"),
        "--output-dir", str(tmp_path / "sweep"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--max-q-len", "12", "--max-q-sp-len", "32",
        "--max-c-len", "24", "--data-parallel", "2"])
    assert best["best_mrr"] > 0
    with open(tmp_path / "sweep" / "sweep_results.jsonl") as f:
        assert len(f.readlines()) == 2

    # requeue after preemption: completed grid points are reused, not
    # re-run and re-appended (review r3 finding — duplicate lines with
    # divergent best_mrr corrupted the sweep record)
    best2 = launch.main([
        "--grid-lr", "1e-4,1e-3", "--grid-warmup", "0.0",
        "--train-file", str(tmp_path / "t.jsonl"),
        "--predict-file", str(tmp_path / "t.jsonl"),
        "--output-dir", str(tmp_path / "sweep"),
        "--tokenizer", "hash", "--model-name", "tiny",
        "--train-batch-size", "4", "--predict-batch-size", "4",
        "--num-epochs", "1", "--max-q-len", "12", "--max-q-sp-len", "32",
        "--max-c-len", "24", "--data-parallel", "2"])
    assert best2["dir"] == best["dir"]
    with open(tmp_path / "sweep" / "sweep_results.jsonl") as f:
        assert len(f.readlines()) == 2


def test_eval_reranked_cli(tmp_path, capsys):
    from multihop_dense_retrieval_tpu.cli import eval_reranked

    preds = [{"_id": "q0", "pred_answer": "paris",
              "pred_sp": [["A", 0]]},
             {"_id": "q1", "pred_answer": "wrong", "pred_sp": []}]
    gold = [{"_id": "q0", "answer": ["Paris"], "type": "bridge",
             "sp_gold": [["A", 0]]},
            {"_id": "q1", "answer": ["right"], "type": "comparison",
             "sp_gold": [["B", 1]]}]
    synth.write_jsonl(tmp_path / "p.jsonl", preds)
    synth.write_jsonl(tmp_path / "g.jsonl", gold)
    out = eval_reranked.main([str(tmp_path / "p.jsonl"),
                              str(tmp_path / "g.jsonl")])
    assert out["overall"]["em"] == 0.5
    assert out["overall"]["sp_em"] == 0.5
    assert out["bridge"]["em"] == 1.0
    assert out["comparison"]["em"] == 0.0


def test_pod_runner_single_process(tmp_path):
    """cli/pod: jax.distributed.initialize + dispatch to an entry point.
    Run in a fresh subprocess (single-process rendezvous on localhost) so
    the test process's already-initialized backend is untouched."""
    import subprocess
    import sys

    code = (
        "from multihop_dense_retrieval_tpu.cli import pod\n"
        "import json, sys\n"
        "import numpy as np\n"
        "rows = [{'title': f'T{i}', 'text': f'body text {i}'} "
        "for i in range(8)]\n"
        "open(%r, 'w').write('\\n'.join(json.dumps(r) for r in rows))\n"
        "pod.main(['--coordinator', 'localhost:18476', '--num-processes',"
        " '1', '--process-id', '0', 'encode_corpus', %r, %r,"
        " '--tokenizer', 'hash', '--model-name', 'tiny',"
        " '--batch-size', '8', '--chunk-rows', '16', '--max-c-len', '32'])\n"
        "import os; assert os.path.exists(%r)\n"
        "print('POD OK')\n"
    ) % (str(tmp_path / "c.jsonl"), str(tmp_path / "c.jsonl"),
         str(tmp_path / "out"), str(tmp_path / "out/index.npz"))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    proc = subprocess.run([sys.executable, "-c",
                           "import jax; jax.config.update('jax_platforms',"
                           " 'cpu')\n" + code],
                          capture_output=True, text=True, timeout=300,
                          env=env, cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "POD OK" in proc.stdout
    assert "process 0/1" in proc.stderr


def test_prep_cli(tmp_path):
    """cli/prep: the add_sp_label.sh workflow (raw hotpot + retrieved chains
    -> reader rows with sentence-level SP supervision) and hotpot-to-mhop."""
    from multihop_dense_retrieval_tpu.cli import prep as prep_cli

    raw = [{
        "_id": "x1", "question": "who did what?", "answer": "alice",
        "type": "bridge",
        "context": [["T1", ["s one.", "s two."]], ["T2", ["s three."]],
                    ["T3", ["filler."]]],
        "supporting_facts": [["T1", 1], ["T2", 0]],
    }]
    retrieved = [{
        "_id": "x1", "question": "who did what?",
        "candidate_chains": [[{"title": "T1", "text": "s one. s two."},
                              {"title": "T3", "text": "filler."}]],
    }]
    (tmp_path / "raw.json").write_text(json.dumps(raw))
    synth.write_jsonl(tmp_path / "retr.jsonl", retrieved)

    out = tmp_path / "with_sp.jsonl"
    prep_cli.main(["add-sp-label", str(tmp_path / "raw.json"),
                   str(tmp_path / "retr.jsonl"), str(out)])
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1
    sp = {p["title"]: p for p in rows[0]["sp"]}
    assert sp["T1"]["sp_sent_ids"] == [1]
    assert sp["T1"]["sents"] == ["s one.", "s two."]
    assert sp["T2"]["sp_sent_ids"] == [0]
    assert rows[0]["answer"] == ["alice"]

    out2 = tmp_path / "mhop.jsonl"
    prep_cli.main(["hotpot-to-mhop", str(tmp_path / "raw.json"), str(out2)])
    mhop = [json.loads(l) for l in open(out2)]
    assert mhop[0]["sp"] == ["T1", "T2"]
    assert mhop[0]["pos_paras"][0]["text"] == "s one.s two."

    id2doc = tmp_path / "id2doc.json"
    id2doc.write_text(json.dumps({"abc": ["T1", "text", True],
                                  "def": ["T2", "text", True]}))
    out3 = tmp_path / "idmap.json"
    prep_cli.main(["index-id-map", str(id2doc), str(out3)])
    assert json.load(open(out3)) == {"0": "abc", "1": "def"}


def test_eval_retrieval_cli_int8_and_pca(tmp_path):
    """Bulk single-hop retrieval over an int8 index — with and without the
    PCA prefilter.  (The int8 path also pins the doc_scales/query-dtype
    handling: queries must stay fp32 for the quantizing kernel.)"""
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_retrieval

    rng = np.random.RandomState(2)
    docs = synth.make_corpus(rng, 600)
    docs[7]["text"] = "the secret answer is zanzibar ."
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    qas = [{"question": "where is the secret?", "answer": ["zanzibar"],
            "sp": ["Title 7"]}]
    synth.write_jsonl(tmp_path / "qas.jsonl", qas)
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "64", "--chunk-rows", "128",
                        "--max-c-len", "32", "--index-dtype", "int8",
                        "--pca-dims", "32", "--pca-cand-rows", "128"])
    base = [str(tmp_path / "qas.jsonl"), out_dir,
            "--tokenizer", "hash", "--model-name", "tiny",
            "--topk", "20", "--batch-size", "1",
            "--max-q-len", "16", "--chunk-rows", "128"]
    plain = eval_retrieval.main(base)
    pca = eval_retrieval.main(base + ["--pca", "--pca-k-chunks", "3"])
    assert "answer_recall@20" in plain and "answer_recall@20" in pca


def test_encode_corpus_sharded_matches_single(tmp_path):
    """Two-shard encode + merge produces the same artifacts as a single
    run (index/shards.py; the multi-host `cli.pod encode_corpus` story —
    each process encodes a slice on local devices, process 0 merges).
    length_sort off: the sorted encode is exact but bf16-ulp
    shape-sensitive (index/build.py), and this asserts bit-equality."""
    import json
    from multihop_dense_retrieval_tpu.cli import encode_corpus
    from multihop_dense_retrieval_tpu.index.store import DenseIndex
    from multihop_dense_retrieval_tpu.data.corpus import TokenizedCorpus

    rng = np.random.RandomState(7)
    docs = synth.make_corpus(rng, 24)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    base = ["--tokenizer", "hash", "--model-name", "tiny",
            "--batch-size", "8", "--chunk-rows", "16",
            "--max-c-len", "32", "--no-length-sort"]

    single = str(tmp_path / "single")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), single] + base)

    sharded = str(tmp_path / "sharded")
    for sid in ("0", "1"):
        encode_corpus.main([str(tmp_path / "corpus.jsonl"), sharded,
                            "--num-shards", "2", "--shard-id", sid] + base)
    import os
    assert os.path.exists(os.path.join(sharded, "emb_shard1-of-2.npy"))
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), sharded,
                        "--merge-only"] + base)
    # shard artifacts cleaned up after the merge
    assert not os.path.exists(os.path.join(sharded, "emb_shard0-of-2.npy"))

    a = DenseIndex.load(os.path.join(single, "index.npz"))
    b = DenseIndex.load(os.path.join(sharded, "index.npz"))
    assert a.n_docs == b.n_docs
    np.testing.assert_array_equal(
        np.asarray(a.vectors, np.float32), np.asarray(b.vectors, np.float32))

    ta = TokenizedCorpus.load(os.path.join(single, "tokens.npz"))
    tb = TokenizedCorpus.load(os.path.join(sharded, "tokens.npz"))
    np.testing.assert_array_equal(ta.text_ids, tb.text_ids)
    np.testing.assert_array_equal(ta.text_lens, tb.text_lens)

    with open(os.path.join(single, "id2doc.json")) as f:
        ja = json.load(f)
    with open(os.path.join(sharded, "id2doc.json")) as f:
        jb = json.load(f)
    assert ja == jb


def test_merge_shards_missing_shard_fails_loud(tmp_path):
    from multihop_dense_retrieval_tpu.index import shards as sh

    emb = np.ones((4, 8), np.float32)
    tc_arrs = (np.ones((4, 6), np.int32), np.full(4, 6, np.int32),
               np.ones((4, 3), np.int32), np.full(4, 3, np.int32),
               np.zeros(4, bool))
    from multihop_dense_retrieval_tpu.data.corpus import (Corpus,
                                                          TokenizedCorpus)
    tc = TokenizedCorpus(*tc_arrs)
    corpus = Corpus([{"title": f"t{i}", "text": f"x{i}"} for i in range(4)])
    sh.save_shard(str(tmp_path), 0, 3, emb, tc, corpus)
    with pytest.raises(FileNotFoundError, match=r"missing embedding shards"):
        sh.merge_shards(str(tmp_path))
    assert sh.shard_bounds(10, 3, 2) == (6, 10)
    with pytest.raises(ValueError):
        sh.shard_bounds(10, 3, 3)


def test_prep_cli_alignment_and_linked_abstracts(tmp_path):
    """add-sp-label fails loud on unmatched/duplicate questions and on gold
    titles missing from the sentence map; hotpot-to-mhop's
    --linked-abstracts enables the hyperlink bridge fallback (review r3 —
    it was silently dead, defaulting ambiguous bridges to titles[1])."""
    from multihop_dense_retrieval_tpu.cli import prep as prep_cli

    raw = [{
        "_id": "x1", "question": "who did what?", "answer": "mystery",
        "type": "bridge",
        "context": [["T1", ["the mystery word."]], ["T2", ["also mystery."]]],
        "supporting_facts": [["T1", 0], ["T2", 0]],
    }]
    (tmp_path / "raw.json").write_text(json.dumps(raw))

    # retrieved dump from a different split -> clear error, not KeyError
    synth.write_jsonl(tmp_path / "other.jsonl",
                      [{"question": "unrelated?", "candidate_chains": []}])
    with pytest.raises(ValueError, match="absent from ORIGINAL"):
        prep_cli.main(["add-sp-label", str(tmp_path / "raw.json"),
                       str(tmp_path / "other.jsonl"),
                       str(tmp_path / "o.jsonl")])

    # duplicate question text in ORIGINAL -> refuse to mispair
    (tmp_path / "dup.json").write_text(json.dumps(raw + raw))
    synth.write_jsonl(tmp_path / "retr.jsonl",
                      [{"question": "who did what?", "candidate_chains": []}])
    with pytest.raises(ValueError, match="duplicate question"):
        prep_cli.main(["add-sp-label", str(tmp_path / "dup.json"),
                       str(tmp_path / "retr.jsonl"),
                       str(tmp_path / "o.jsonl")])

    # gold sp title missing from the context-derived sentence map
    raw_missing = [dict(raw[0], supporting_facts=[["T1", 0], ["GONE", 0]])]
    (tmp_path / "rm.json").write_text(json.dumps(raw_missing))
    with pytest.raises(ValueError, match="not in title2sents"):
        prep_cli.main(["add-sp-label", str(tmp_path / "rm.json"),
                       str(tmp_path / "retr.jsonl"),
                       str(tmp_path / "o.jsonl")])

    # ambiguous bridge ("mystery" in both passages): without links ->
    # titles[1]; with T2 -> T1 hyperlink -> T1 is the bridge
    out_plain = tmp_path / "mhop_plain.jsonl"
    prep_cli.main(["hotpot-to-mhop", str(tmp_path / "raw.json"),
                   str(out_plain)])
    assert json.loads(open(out_plain).readline())["bridge"] == "T2"
    (tmp_path / "links.json").write_text(json.dumps({"T2": ["T1"]}))
    out_linked = tmp_path / "mhop_linked.jsonl"
    prep_cli.main(["hotpot-to-mhop", str(tmp_path / "raw.json"),
                   str(out_linked), "--linked-abstracts",
                   str(tmp_path / "links.json")])
    assert json.loads(open(out_linked).readline())["bridge"] == "T1"


def test_eval_retrieval_multivector_and_string_answers(tmp_path):
    """Bulk retrieval over a --multi-vector index must collapse ROW ids to
    DOC ids before metrics (review r3 — raw row ids indexed the corpus
    wrong / out of range), and a raw string answer field must not be
    iterated character by character."""
    from multihop_dense_retrieval_tpu.cli import encode_corpus, eval_retrieval

    rng = np.random.RandomState(4)
    docs = synth.make_corpus(rng, 24)
    docs[5]["text"] = "the secret answer is zanzibar ."
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    # string answer (raw-hotpot style), not a list
    synth.write_jsonl(tmp_path / "qas.jsonl",
                      [{"question": "where is the secret?",
                        "answer": "zanzibar", "sp": ["Title 5"]}])
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32", "--multi-vector", "2"])
    res = eval_retrieval.main([str(tmp_path / "qas.jsonl"), out_dir,
                               "--tokenizer", "hash", "--model-name", "tiny",
                               "--topk", "20", "--batch-size", "1",
                               "--max-q-len", "16", "--chunk-rows", "16"])
    # 20 of 24 docs retrieved -> the answer doc is near-surely in there;
    # with raw row ids this either crashed (row >= 24) or mis-scored
    assert res["answer_recall@20"] in (0.0, 1.0)
    assert res["answer_recall@20"] == 1.0


def test_train_single_separate_encoders_from_checkpoint(tmp_path):
    """--separate-encoders --init-checkpoint seeds BOTH towers from the
    one-tower checkpoint (review r3 — wholesale replacement left
    encoder_q/project_q missing and the first apply raised)."""
    from multihop_dense_retrieval_tpu.cli import train_single

    rows = [{"question": f"what is thing {i}?",
             "pos_paras": [{"title": f"P{i}", "text": f"thing {i} body"}],
             "neg_paras": [{"title": f"N{i}", "text": "unrelated words"}]}
            for i in range(8)]
    synth.write_jsonl(tmp_path / "sp.jsonl", rows)
    base = ["--train-file", str(tmp_path / "sp.jsonl"),
            "--predict-file", str(tmp_path / "sp.jsonl"),
            "--tokenizer", "hash", "--model-name", "tiny",
            "--train-batch-size", "4", "--predict-batch-size", "4",
            "--num-epochs", "1", "--learning-rate", "1e-4",
            "--max-q-len", "12", "--max-c-len", "24", "--data-parallel", "2"]
    out = str(tmp_path / "stage1")
    res = train_single.main(base + ["--output-dir", out])
    assert res["best_mrr"] > 0

    res2 = train_single.main(base + ["--separate-encoders",
                                     "--init-checkpoint",
                                     f"{out}/checkpoint_best"])
    assert res2["best_mrr"] > 0


def test_eval_reranked_string_answers_and_sp_scoping(tmp_path):
    """Gold string answers score whole (not their first character), rows
    without sp gold stay out of the sp/joint averages, and zero id overlap
    fails loud (review r3)."""
    from multihop_dense_retrieval_tpu.cli import eval_reranked

    preds = [{"_id": "q0", "pred_answer": "paris", "pred_sp": [["A", 0]]},
             {"_id": "q1", "pred_answer": "rome", "pred_sp": []}]
    gold = [{"_id": "q0", "answer": "Paris", "type": "bridge",
             "sp_gold": [["A", 0]]},
            {"_id": "q1", "answer": "Rome", "type": "comparison"}]  # no sp
    synth.write_jsonl(tmp_path / "p.jsonl", preds)
    synth.write_jsonl(tmp_path / "g.jsonl", gold)
    out = eval_reranked.main([str(tmp_path / "p.jsonl"),
                              str(tmp_path / "g.jsonl")])
    assert out["overall"]["em"] == 1.0           # was 0.0 vs first char
    assert out["overall"]["sp_em"] == 1.0        # only the annotated row
    assert out["overall"]["n_sp_annotated"] == 1

    synth.write_jsonl(tmp_path / "g2.jsonl",
                      [{"_id": "zzz", "answer": ["x"]}])
    with pytest.raises(ValueError, match="no gold _id"):
        eval_reranked.main([str(tmp_path / "p.jsonl"),
                            str(tmp_path / "g2.jsonl")])


def test_demo_unified_variable_hop(tmp_path):
    """--unified serves variable-hop chains through the demo/serve pipeline:
    beams whose stop head fires become ONE-passage chains and the reader
    still answers (prepare_context handles 1-passage chains)."""
    from multihop_dense_retrieval_tpu.cli import demo, encode_corpus

    rng = np.random.RandomState(3)
    docs = synth.make_corpus(rng, 16)
    synth.write_jsonl(tmp_path / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    out_dir = str(tmp_path / "index")
    encode_corpus.main([str(tmp_path / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32", "--unified"])
    common_args = [out_dir, "--tokenizer", "hash",
                   "--retriever-model", "tiny", "--reader-model", "tiny",
                   "--unified", "--beam-size", "2", "--topk", "2",
                   "--max-q-len", "16", "--max-q-sp-len", "48",
                   "--max-seq-len", "96", "--max-ans-len", "6",
                   "--chunk-rows", "16", "--question", "what links things?"]
    out = demo.main(common_args)
    assert isinstance(out["answer"], str)
    assert all(len(c) in (1, 2) for c in out["chains"])
    # threshold 0 → every beam stops → every chain is one passage;
    # threshold 1 → no beam stops → every chain is two
    out0 = demo.main(common_args + ["--stop-threshold", "-1"])
    assert all(len(c) == 1 for c in out0["chains"])
    out1 = demo.main(common_args + ["--stop-threshold", "2"])
    assert all(len(c) == 2 for c in out1["chains"])
