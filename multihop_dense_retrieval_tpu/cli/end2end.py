"""CLI: full question → answer pipeline (equivalent of scripts/end2end.py).

Retrieval (2-hop beam over the dense index) → reader (chain ranking + span
extraction + supporting facts) → answer EM/F1 when gold answers are present.
The retrieval stage reuses cli/eval_mhop_retrieval plumbing; the reader stage
the cli/train_qa plumbing with fixed λ=0.8 (end2end.py/eval_final parity).
"""

import argparse
import json
import time

import numpy as np

from ..core.config import SearchConfig
from ..core.mesh import make_mesh
from ..data.corpus import Corpus
from ..data.qa_dataset import QADataset
from ..eval.hotpot_metrics import exact_match_score, f1_score
from ..eval.qa_eval import predict
from ..train import qa as TQA
from . import common
from .eval_mhop_retrieval import load_searcher
from .train_qa import init_reader


def retrieve_chains(searcher, tok, corpus, questions, batch_size, max_q_len,
                    stop_threshold=None):
    """Run 2-hop beam search; returns per-question candidate chains with
    sentence-split passages for the reader (text split on '. ' when the
    corpus has no sentence annotations).

    stop_threshold (variable-hop serving, --unified engines only): beams
    whose stop probability exceeds it are served as ONE-passage chains —
    same semantics as cli/eval_mhop_retrieval's unified path."""
    outs = []
    for s in range(0, len(questions), batch_size):
        batch = questions[s:s + batch_size]
        pad = batch_size - len(batch)
        qs = [q[:-1] if q.endswith("?") else q for q in batch]
        qs_p = qs + [qs[-1]] * pad
        q_inputs = tok.encode_batch_one(qs_p, max_q_len)
        # hop-2 raw-question budget follows max_q_sp_len (longest-first
        # truncation happens at pair-assembly time, like the reference)
        cfg = getattr(searcher, "config", None) or searcher.cfg
        q_budget = cfg.max_q_sp_len - (4 if tok.spec.roberta_style else 3)
        raw = [tok.raw_ids_padded(q, q_budget) for q in qs_p]
        res = searcher.search(q_inputs, np.stack([r[0] for r in raw]),
                              np.array([r[1] for r in raw]))
        stops = (res["top_stop_probs"] if stop_threshold is not None
                 and "top_stop_probs" in res else None)
        for i in range(len(batch)):
            chains = []
            for j, (h1, h2) in enumerate(zip(res["hop1_ids"][i],
                                             res["hop2_ids"][i])):
                doc_ids = ((int(h1),)
                           if stops is not None
                           and float(stops[i][j]) > stop_threshold
                           else (int(h1), int(h2)))
                chain = []
                for doc_id in doc_ids:
                    d = corpus[doc_id]
                    sents = [x for x in d["text"].split(". ") if x.strip()] \
                        or [d["text"] or d["title"]]
                    chain.append({"title": d["title"], "sents": sents})
                chains.append(chain)
            outs.append(chains)
    return outs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("raw_data", help="questions JSONL (question[, answer, sp])")
    p.add_argument("index_dir")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--retriever-model", default="roberta-base")
    p.add_argument("--retriever-checkpoint", default="")
    p.add_argument("--reader-model", default="electra-large")
    p.add_argument("--reader-tokenizer", default="",
                   help="tokenizer for the reader (its vocabulary differs "
                        "from the retriever's); default: --tokenizer, "
                        "correct only for the hash test tokenizer")
    p.add_argument("--reader-checkpoint", default="")
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--max-q-len", type=int, default=70)
    p.add_argument("--max-q-sp-len", type=int, default=350)
    p.add_argument("--max-seq-len", type=int, default=512)
    p.add_argument("--max-ans-len", type=int, default=30)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--lambda", dest="lam", type=float, default=0.8)
    p.add_argument("--reader-bf16-scores", action="store_true", default=True,
                   help="bf16 reader attention scores — DEFAULT (+5-11%% "
                        "at widths 384-512; 100%% answer agreement with "
                        "fp32 under a trained reader, PERF.md fidelity row)")
    p.add_argument("--reader-fp32-scores", dest="reader_bf16_scores",
                   action="store_false",
                   help="revert reader attention scores to fp32")
    common.add_rank_args(p)
    common.add_hop2_tiling_args(p)
    p.add_argument("--save-path", default="")
    p.add_argument("--unified", action="store_true",
                   help="UnifiedRetriever checkpoint: beams whose stop head "
                        "fires are read as ONE-passage chains")
    p.add_argument("--stop-threshold", type=float, default=0.5)
    args = p.parse_args(argv)

    logger = common.setup_logging()
    # retriever
    enc_cfg = common.resolve_encoder_config(args.retriever_model)
    r_tok = common.resolve_tokenizer(args.tokenizer)
    r_model, r_params = common.init_retriever(
        enc_cfg, unified=args.unified, checkpoint=args.retriever_checkpoint)
    h2b, h2f = common.resolve_hop2_tiling(
        args, args.batch_size * args.beam_size, args.max_q_sp_len)
    cfg = SearchConfig(beam_size_1=args.beam_size, beam_size_2=args.beam_size,
                       topk=args.topk, max_q_len=args.max_q_len,
                       max_q_sp_len=args.max_q_sp_len,
                       hop2_buckets=h2b, hop2_tile_fracs=h2f,
                       hop2_prune_margin=args.hop2_prune_margin,
                       chunk_rows=args.chunk_rows)
    searcher = load_searcher(args.index_dir, r_tok, r_model, r_params, cfg,
                             unified=args.unified)
    corpus = Corpus.from_id2doc(f"{args.index_dir}/id2doc.json")

    with open(args.raw_data) as f:
        items = [json.loads(l) for l in f if l.strip()]

    t0 = time.time()
    chains = retrieve_chains(searcher, r_tok, corpus,
                             [r["question"] for r in items],
                             args.batch_size, args.max_q_len,
                             stop_threshold=(args.stop_threshold
                                             if args.unified else None))
    t_retr = time.time() - t0
    logger.info("retrieval: %d questions in %.2fs (%.1f q/s)",
                len(items), t_retr, len(items) / t_retr)

    # reader
    q_tok = common.resolve_tokenizer(args.reader_tokenizer or args.tokenizer,
                                     roberta_style=False)
    _, model, params = init_reader(args.reader_model, args.reader_checkpoint,
                                   sp_pred=True,
                                   scores_dtype=("bfloat16"
                                                 if args.reader_bf16_scores
                                                 else "float32"))
    rows = [{"question": r["question"], "_id": r.get("_id", str(i)),
             "answer": r.get("answer", []), "candidate_chains": chains[i]}
            for i, r in enumerate(items)]
    ds = QADataset(q_tok, rows, max_seq_len=args.max_seq_len, train=False)
    pred_step = TQA.make_qa_predict_step(model, max_ans_len=args.max_ans_len)
    rank_step = (TQA.make_qa_rank_step(model) if args.rank_topm else None)
    t1 = time.time()
    res = predict(pred_step, params, ds, batch_size=16, lambdas=[args.lam],
                  rank_step=rank_step, rank_topm=args.rank_topm,
                  rank_width=args.rank_width)
    t_read = time.time() - t1
    logger.info("reading: %.2fs", t_read)

    answers = res["best"]["answers"]
    ems, f1s = [], []
    for i, r in enumerate(items):
        qid = r.get("_id", str(i))
        if r.get("answer"):
            pred = answers.get(qid, "")
            ems.append(float(exact_match_score(pred, r["answer"][0])))
            f1s.append(f1_score(pred, r["answer"][0])[0])
    out = {"n": len(items),
           "retrieval_qps": len(items) / t_retr,
           "answer_em": float(np.mean(ems)) if ems else None,
           "answer_f1": float(np.mean(f1s)) if f1s else None}
    logger.info("end2end: %s", out)
    print(json.dumps(out))

    if args.save_path and common.is_primary():
        with open(args.save_path, "w") as f:
            for i, r in enumerate(items):
                qid = r.get("_id", str(i))
                f.write(json.dumps({"_id": qid, "question": r["question"],
                                    "pred_answer": answers.get(qid, ""),
                                    "pred_sp": res["best"]["sp"].get(qid, [])})
                        + "\n")
    return out


if __name__ == "__main__":
    main()
