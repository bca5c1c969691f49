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
    from multihop_dense_retrieval_tpu.cli.serve import make_handler
    from http.server import HTTPServer
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
    srv = HTTPServer(("127.0.0.1", 0), make_handler(pipe))
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
    code, out = _post(f"{server}/answer", {})
    assert code == 400 and "question" in out["error"]
    code, out = _post(f"{server}/nope", {"question": "x"})
    assert code == 404


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
