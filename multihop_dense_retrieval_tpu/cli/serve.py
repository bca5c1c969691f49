"""CLI: HTTP serving endpoint for multi-hop QA.

Production-facing counterpart of the streamlit demo (scripts/demo.py): a
stdlib HTTP server exposing

  POST /answer     {"question": "..."}            → answer + chains + sp
  POST /retrieve   {"question": "...", "topk": k} → ranked chains only
  POST /add_doc    {"title": "...", "text": "..."} → live corpus add
  POST /delete_doc {"doc_id": i}                   → live swap-delete
  GET  /healthz                                    → liveness + model info

Single-threaded by design: the TPU executes one program at a time, so the
natural scaling unit is one server per chip with an external load balancer
(batching across requests is future work — the engine itself is batched).

Usage:
  python -m multihop_dense_retrieval_tpu.cli.serve INDEX_DIR --port 8080 \
      --tokenizer hash --retriever-model tiny --reader-model tiny
"""

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

from .demo import DemoPipeline


def make_handler(pipe: DemoPipeline):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass  # quiet

        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "n_docs": pipe.searcher.index.n_docs
                                 if hasattr(pipe.searcher, "index") else None})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._send(400, {"error": "invalid JSON body"})
                return
            if self.path == "/add_doc":
                title = req.get("title", "").strip()
                if not title:
                    self._send(400, {"error": "missing 'title'"})
                    return
                doc_id = pipe.add_document(title, req.get("text", ""))
                self._send(200, {"doc_id": doc_id,
                                 "n_docs": pipe.searcher.index.n_docs})
                return
            if self.path == "/delete_doc":
                if "doc_id" not in req:
                    self._send(400, {"error": "missing 'doc_id'"})
                    return
                try:
                    moved = pipe.delete_document(int(req["doc_id"]))
                except IndexError as e:
                    self._send(400, {"error": str(e)})
                    return
                self._send(200, {"moved_doc_id": moved,
                                 "n_docs": pipe.searcher.index.n_docs})
                return
            question = req.get("question", "").strip()
            if not question:
                self._send(400, {"error": "missing 'question'"})
                return
            if self.path == "/answer":
                self._send(200, pipe.answer(question))
            elif self.path == "/retrieve":
                out = pipe.answer(question)
                self._send(200, {"chains": out["chains"],
                                 "retrieval_s": out["retrieval_s"]})
            else:
                self._send(404, {"error": "not found"})

    return Handler


def main(argv=None):
    from .demo import main as demo_main  # reuse arg surface

    p = argparse.ArgumentParser()
    p.add_argument("index_dir")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--retriever-model", default="roberta-base")
    p.add_argument("--retriever-checkpoint", default="")
    p.add_argument("--reader-model", default="electra-large")
    p.add_argument("--reader-checkpoint", default="")
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--max-q-len", type=int, default=70)
    p.add_argument("--max-q-sp-len", type=int, default=350)
    p.add_argument("--max-seq-len", type=int, default=512)
    p.add_argument("--max-ans-len", type=int, default=30)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--lambda", dest="lam", type=float, default=0.8)
    args = p.parse_args(argv)
    args.question = ""

    pipe = DemoPipeline(args)
    server = HTTPServer((args.host, args.port), make_handler(pipe))
    print(f"serving on http://{args.host}:{args.port} "
          f"(POST /answer, POST /retrieve, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
