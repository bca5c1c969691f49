"""HTTP serving endpoint test: real socket round-trips against the pipeline."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tests import synth


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from multihop_dense_retrieval_tpu.cli import encode_corpus
    from multihop_dense_retrieval_tpu.cli.demo import DemoPipeline
    from multihop_dense_retrieval_tpu.cli.serve import make_server
    import argparse

    tmp = tmp_path_factory.mktemp("serve")
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 16)
    synth.write_jsonl(tmp / "corpus.jsonl",
                      [{"title": d["title"], "text": d["text"]} for d in docs])
    out_dir = str(tmp / "index")
    encode_corpus.main([str(tmp / "corpus.jsonl"), out_dir,
                        "--tokenizer", "hash", "--model-name", "tiny",
                        "--batch-size", "8", "--chunk-rows", "16",
                        "--max-c-len", "32"])
    args = argparse.Namespace(
        index_dir=out_dir, tokenizer="hash", retriever_model="tiny",
        retriever_checkpoint="", reader_model="tiny", reader_checkpoint="",
        beam_size=2, topk=2, max_q_len=16, max_q_sp_len=48, max_seq_len=96,
        max_ans_len=6, chunk_rows=16, lam=0.8, question="")
    pipe = DemoPipeline(args)
    srv = make_server(pipe, "127.0.0.1", 0, max_batch=4, batch_wait_ms=25)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"


def test_answer_endpoint(server):
    code, out = _post(f"{server}/answer", {"question": "what links things?"})
    assert code == 200
    assert isinstance(out["answer"], str)
    assert len(out["chains"]) == 2


def test_retrieve_endpoint_and_errors(server):
    code, out = _post(f"{server}/retrieve", {"question": "another question?"})
    assert code == 200 and "chains" in out
    assert "reading_s" not in out  # retrieval-only: the reader never ran
    assert len(out["chains"]) == 2           # server --topk
    # the documented per-request topk works: smaller slices, larger caps
    # (review r3 finding — the parameter was silently ignored)
    code, out = _post(f"{server}/retrieve",
                      {"question": "another question?", "topk": 1})
    assert code == 200 and len(out["chains"]) == 1
    code, out = _post(f"{server}/retrieve",
                      {"question": "another question?", "topk": 50})
    assert code == 200 and out["topk_capped"] == 2
    code, out = _post(f"{server}/retrieve",
                      {"question": "x?", "topk": 0})
    assert code == 400
    code, out = _post(f"{server}/answer", {})
    assert code == 400 and "question" in out["error"]
    code, out = _post(f"{server}/nope", {"question": "x"})
    assert code == 404
    # unknown path is 404 even with a missing question (path checked first)
    code, out = _post(f"{server}/nope", {})
    assert code == 404
    # malformed bodies get clean 400s, never a dropped connection
    code, out = _post(f"{server}/answer", [1, 2, 3])
    assert code == 400 and "object" in out["error"]
    code, out = _post(f"{server}/delete_doc", {"doc_id": "not-a-number"})
    assert code == 400


def test_live_document_updates(server):
    """/add_doc makes a document searchable by the running server;
    /delete_doc swap-removes it — n_docs tracks both."""
    code, out = _post(f"{server}/add_doc",
                      {"title": "brand new topic",
                       "text": "some fresh words about the new topic"})
    assert code == 200
    new_id = out["doc_id"]
    assert out["n_docs"] == new_id + 1

    # serving continues over the updated engine
    code, out = _post(f"{server}/retrieve", {"question": "brand new topic?"})
    assert code == 200 and len(out["chains"]) == 2

    code, out = _post(f"{server}/delete_doc", {"doc_id": 0})
    assert code == 200
    assert out["moved_doc_id"] == new_id
    assert out["n_docs"] == new_id
    code, out = _post(f"{server}/delete_doc", {"doc_id": 10**6})
    assert code == 400
    code, out = _post(f"{server}/add_doc", {"text": "no title"})
    assert code == 400
    # engine is still consistent after the churn
    code, out = _post(f"{server}/retrieve", {"question": "still alive?"})
    assert code == 200 and len(out["chains"]) == 2


def test_concurrent_requests_micro_batch(server):
    """Concurrent questions all succeed through the single engine thread;
    the worker groups at least some of them into one batch."""
    import urllib.request as _ur

    with _ur.urlopen(f"{server}/healthz") as r:
        before = json.loads(r.read())

    results = [None] * 6

    def fire(i):
        results[i] = _post(f"{server}/answer",
                           {"question": f"concurrent question {i}?"})

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(code == 200 and isinstance(out["answer"], str)
               for code, out in results)

    with _ur.urlopen(f"{server}/healthz") as r:
        after = json.loads(r.read())
    ran_q = after["questions_run"] - before["questions_run"]
    ran_b = after["batches_run"] - before["batches_run"]
    assert ran_q == 6
    assert ran_b <= ran_q  # batching never splits a question across runs


class _FakePipe:
    def __init__(self):
        self.batches = []
        self.adds = []
        # the worker reads searcher.index.n_docs right after each update
        self.searcher = type("S", (), {
            "index": type("I", (), {"n_docs": 101})()})()

    def answer_batch(self, qs, pad_to=None):
        self.batches.append(list(qs))
        return [{"answer": q, "chains": [], "supporting": [],
                 "retrieval_s": 0.0, "reading_s": 0.0} for q in qs]

    def retrieve_batch(self, qs, pad_to=None):
        self.batches.append(list(qs))
        return [{"chains": [], "retrieval_s": 0.0} for q in qs]

    def add_document(self, title, text):
        self.adds.append(title)
        return 100 + len(self.adds)


def test_engine_worker_batches_and_serializes_updates():
    """Pre-queued ops: questions group into one batch; an update arriving
    between questions flushes the batch first and runs in arrival order."""
    from multihop_dense_retrieval_tpu.cli.serve import EngineWorker

    pipe = _FakePipe()
    w = EngineWorker(pipe, max_batch=8, batch_wait_ms=50)
    futs = [w.submit("answer", {"question": f"q{i}"}) for i in range(5)]
    w.start()
    assert [f.result(timeout=10)["answer"] for f in futs] == \
        [f"q{i}" for i in range(5)]
    assert pipe.batches == [["q0", "q1", "q2", "q3", "q4"]]

    f1 = w.submit("answer", {"question": "a"})
    fu = w.submit("add", {"title": "t", "text": "x"})
    f2 = w.submit("answer", {"question": "b"})
    assert fu.result(timeout=10)["doc_id"] == 101
    assert f1.result(timeout=10)["answer"] == "a"
    assert f2.result(timeout=10)["answer"] == "b"
    # the update flushed ["a"] before running; "b" ran in a later batch
    assert pipe.batches[1] == ["a"]
    assert ["b"] in pipe.batches[2:]
