"""Interactive multi-hop QA demo (equivalent of scripts/demo.py).

The reference uses a streamlit UI around the same 2-hop pipeline
(demo.py:103-173, cached init at :27-68).  Here: a terminal REPL by default,
and the same `answer_question` function is exported for a streamlit wrapper
(`streamlit run -m ... -- --streamlit` if streamlit is installed).

Usage:
  python -m multihop_dense_retrieval_tpu.cli.demo INDEX_DIR \
      --tokenizer hash --retriever-model tiny --reader-model tiny
"""

import argparse
import json
import sys
import time

import numpy as np

from ..core.config import SearchConfig
from ..data.corpus import Corpus
from ..data.qa_dataset import QADataset
from ..eval.qa_eval import predict
from ..train import qa as TQA
from . import common
from .end2end import retrieve_chains
from .eval_mhop_retrieval import load_searcher
from .train_qa import init_reader


class DemoPipeline:
    def __init__(self, args):
        enc_cfg = common.resolve_encoder_config(args.retriever_model)
        self.r_tok = common.resolve_tokenizer(args.tokenizer)
        # --unified: variable-hop serving — the stop head decides per beam
        # whether the top passage stands alone (reference trained this head
        # but shipped no serving for it)
        self.unified = getattr(args, "unified", False)
        self.stop_threshold = (getattr(args, "stop_threshold", 0.5)
                               if self.unified else None)
        r_model, r_params = common.init_retriever(
            enc_cfg, unified=self.unified,
            checkpoint=args.retriever_checkpoint)
        # hop-2 rows per search = micro-batch × beam (the serve worker pads
        # to max_batch; the REPL runs single questions)
        h2b, h2f = common.resolve_hop2_tiling(
            args, getattr(args, "max_batch", 1) * args.beam_size,
            args.max_q_sp_len)
        cfg = SearchConfig(beam_size_1=args.beam_size,
                           beam_size_2=args.beam_size, topk=args.topk,
                           max_q_len=args.max_q_len,
                           max_q_sp_len=args.max_q_sp_len,
                           chunk_rows=args.chunk_rows,
                           hop2_buckets=h2b, hop2_tile_fracs=h2f,
                           hop2_prune_margin=getattr(args, 'hop2_prune_margin',
                                                     0.0),
                           use_pca=getattr(args, "pca", False),
                           pca_k_chunks=getattr(args, "pca_k_chunks", 8))
        self.searcher = load_searcher(args.index_dir, self.r_tok, r_model,
                                      r_params, cfg, unified=self.unified)
        # live adds encode one passage per call: jit ONCE here — the raw
        # encode_fn lambda would run the encoder op-by-op through the
        # remote tunnel on every /add_doc request
        import jax

        self._add_encode = jax.jit(
            lambda p_, ids, mask, tt: self.searcher.encode_fn(
                p_, ids, mask, tt))
        self.corpus = Corpus.from_id2doc(f"{args.index_dir}/id2doc.json")
        # the reader's vocabulary differs from the retriever's (electra
        # wordpiece vs roberta BPE) — --reader-tokenizer falls back to the
        # retriever flag only for the hash test tokenizer
        self.q_tok = common.resolve_tokenizer(
            getattr(args, "reader_tokenizer", "") or args.tokenizer,
            roberta_style=False)
        _, self.reader, self.reader_params = init_reader(
            args.reader_model, args.reader_checkpoint, sp_pred=True,
            scores_dtype=("bfloat16"
                          if getattr(args, "reader_bf16_scores", False)
                          else "float32"))
        self.pred_step = TQA.make_qa_predict_step(
            self.reader, max_ans_len=args.max_ans_len)
        self.rank_kw = {}
        if getattr(args, "rank_topm", 0):
            self.rank_kw = dict(
                rank_step=TQA.make_qa_rank_step(self.reader),
                rank_topm=args.rank_topm,
                rank_width=getattr(args, "rank_width", 128))
        self.max_c_len = getattr(args, "max_c_len", 300)
        self.args = args

    # ---- live corpus updates (serving) --------------------------------

    def add_document(self, title: str, text: str) -> int:
        """Add one document to the LIVE engine (index + token store + host
        doc table) — searchable by the next request.  Returns its doc id."""
        import jax.numpy as jnp
        from ..data.corpus import Corpus as _Corpus, TokenizedCorpus
        import unicodedata

        row = {"title": unicodedata.normalize("NFD", title.strip()),
               "text": text.strip()}
        nc = _Corpus([row])
        width = int(self.searcher.text_ids.shape[1])
        ntc = TokenizedCorpus.build(nc, self.r_tok, max_text_len=width)
        # passage view title ⊕ text, exactly as index/build.py encodes it
        enc = self.r_tok.encode_batch_pair(
            [(row["title"], nc.encode_text(0))], self.max_c_len)
        tt = enc.get("token_type_ids")
        vec = np.asarray(self._add_encode(
            self.searcher.params, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
            None if tt is None else jnp.asarray(tt)), np.float32)
        ids = self.searcher.add_docs(vec, ntc.text_ids, ntc.text_lens,
                                     ntc.empty)
        self.corpus.docs.append(row)
        return ids[0]

    def delete_document(self, doc_id: int):
        """Swap-delete a document from the live engine; keeps the host doc
        table in the same order as the device store."""
        if not 0 <= doc_id < len(self.corpus.docs):
            raise IndexError(f"doc_id {doc_id} out of range")
        moved = self.searcher.delete_doc(doc_id)
        if moved is not None:
            self.corpus.docs[doc_id] = self.corpus.docs[moved]
        self.corpus.docs.pop()
        return moved

    def answer_batch(self, questions, pad_to=None):
        """Answer a LIST of questions in one 2-hop search + one reader
        pass — the unit the serving micro-batcher (cli/serve.py) feeds.
        `pad_to` fixes the search batch shape (ONE compiled program for all
        micro-batch sizes up to it; retrieve_chains pads the tail).
        Returns one result dict per question."""
        t0 = time.time()
        all_chains = retrieve_chains(self.searcher, self.r_tok, self.corpus,
                                     questions, pad_to or len(questions),
                                     self.args.max_q_len,
                                     stop_threshold=self.stop_threshold)
        t1 = time.time()
        rows = [{"question": q, "_id": f"q{i}", "answer": [],
                 "candidate_chains": ch}
                for i, (q, ch) in enumerate(zip(questions, all_chains))]
        ds = QADataset(self.q_tok, rows, max_seq_len=self.args.max_seq_len,
                       train=False)
        n_chains = sum(len(c) for c in all_chains)
        res = predict(self.pred_step, self.reader_params, ds,
                      batch_size=max(min(n_chains, 32), 1),
                      lambdas=[self.args.lam], **self.rank_kw)
        t2 = time.time()
        return [{
            "answer": res["best"]["answers"].get(f"q{i}", ""),
            "supporting": res["best"]["sp"].get(f"q{i}", []),
            "chains": [[p["title"] for p in c] for c in chains],
            "retrieval_s": t1 - t0,
            "reading_s": t2 - t1,
        } for i, chains in enumerate(all_chains)]

    def retrieve_batch(self, questions, pad_to=None):
        """Retrieval only — one 2-hop search pass, NO reader (the /retrieve
        endpoint; paying the ELECTRA-large forward just to discard the
        answer would dominate the request)."""
        t0 = time.time()
        all_chains = retrieve_chains(self.searcher, self.r_tok, self.corpus,
                                     questions, pad_to or len(questions),
                                     self.args.max_q_len,
                                     stop_threshold=self.stop_threshold)
        dt = time.time() - t0
        return [{"chains": [[p["title"] for p in c] for c in chains],
                 "retrieval_s": dt}
                for chains in all_chains]

    def answer(self, question: str):
        return self.answer_batch([question])[0]


def main(argv=None):
    p = argparse.ArgumentParser()
    common.add_pipeline_args(p)
    p.add_argument("--question", default="",
                   help="answer one question and exit (non-interactive)")
    args = p.parse_args(argv)

    pipe = DemoPipeline(args)
    if args.question:
        out = pipe.answer(args.question)
        print(json.dumps(out))
        return out

    print("multi-hop QA demo — type a question (empty line to quit)")
    while True:
        try:
            q = input("Q: ").strip()
        except EOFError:
            break
        if not q:
            break
        out = pipe.answer(q)
        print(f"A: {out['answer']}")
        print(f"   chains: {out['chains'][:3]}")
        print(f"   sp: {out['supporting']}")
        print(f"   ({out['retrieval_s']:.2f}s retrieve, "
              f"{out['reading_s']:.2f}s read)")


if __name__ == "__main__":
    main()
