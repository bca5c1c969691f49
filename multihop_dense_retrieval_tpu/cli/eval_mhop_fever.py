"""CLI: 2-hop retrieval over FEVER claims (scripts/eval/eval_mhop_fever.py).

Differences from cli/eval_mhop_retrieval (mirroring the reference):
  * input rows are claims: {"id", "claim"} (eval_mhop_fever.py:97,165-168);
    claims are fed verbatim (no trailing-"?" strip);
  * separate --beam-size-1/--beam-size-2 flags (argparse defaults 5/5
    exactly as the reference's, eval_mhop_fever.py:60-61; the PUBLISHED
    FEVER configs pass asymmetric values — beam1 1..2 with beam2 10..20,
    eval_mhop_fever.py:8-14);
  * fever defaults: max_q_len=45, max_q_sp_len=400 (eval_mhop_fever.py:55-57);
  * the dump schema is keyed "id"/"claim" with candidate_chains as
    [(title, text), (title, text)] pairs (eval_mhop_fever.py:160-170), one
    JSON object per line.

The reference script computes no metrics (its `metrics` list is never
filled) — when rows carry an "sp" annotation we additionally report the
standard chain metrics, which is a superset.

Usage:
  python -m multihop_dense_retrieval_tpu.cli.eval_mhop_fever \
      CLAIMS.jsonl INDEX_DIR --tokenizer hash --model-name tiny \
      --beam-size-1 1 --beam-size-2 20 --topk 20 --save-path chains.jsonl
"""

import argparse
import json
import os
import time

import numpy as np

from ..core.config import SearchConfig
from ..core.mesh import make_mesh
from ..data.corpus import Corpus
from ..eval.retrieval_metrics import aggregate_metrics, chain_metrics
from . import common
from .eval_mhop_retrieval import load_searcher


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("raw_data", help="FEVER claims JSONL: id/claim per line")
    p.add_argument("index_dir", help="output dir of cli.encode_corpus")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--model-name", default="roberta-base")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--topk", type=int, default=2)
    p.add_argument("--beam-size-1", type=int, default=5)
    p.add_argument("--beam-size-2", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--max-q-len", type=int, default=45)
    p.add_argument("--max-q-sp-len", type=int, default=400)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--index-shards", type=int, default=1)
    p.add_argument("--pca", action="store_true",
                   help="PCA-prefiltered MIPS (index built with --pca-dims); "
                        "certified fraction reported")
    p.add_argument("--pca-k-chunks", type=int, default=16,
                   help="higher default than the hotpot eval: FEVER's "
                        "asymmetric beams fetch large k per query")
    p.add_argument("--pca-hops", default="auto",
                   choices=["auto", "1", "2", "12"])
    common.add_hop2_tiling_args(p)
    p.add_argument("--save-path", default="")
    args = p.parse_args(argv)

    logger = common.setup_logging()
    enc_cfg = common.resolve_encoder_config(args.model_name)
    tok = common.resolve_tokenizer(args.tokenizer)
    model, params = common.init_retriever(enc_cfg, checkpoint=args.checkpoint)

    with open(args.raw_data) as f:
        ds_items = [json.loads(l) for l in f if l.strip()]

    h2b, h2f = common.resolve_hop2_tiling(
        args, args.batch_size * args.beam_size_1, args.max_q_sp_len)
    cfg = SearchConfig(beam_size_1=args.beam_size_1,
                       beam_size_2=args.beam_size_2,
                       topk=args.topk, max_q_len=args.max_q_len,
                       max_q_sp_len=args.max_q_sp_len,
                       chunk_rows=args.chunk_rows,
                       use_pallas=not args.no_pallas,
                       hop2_buckets=h2b, hop2_tile_fracs=h2f,
                       hop2_prune_margin=args.hop2_prune_margin,
                       use_pca=args.pca, pca_k_chunks=args.pca_k_chunks,
                       pca_hops=args.pca_hops)
    corpus = Corpus.from_id2doc(os.path.join(args.index_dir, "id2doc.json"))
    mesh = (make_mesh(index=args.index_shards)
            if args.index_shards > 1 else None)
    searcher = load_searcher(args.index_dir, tok, model, params, cfg, mesh)

    metrics, outputs = [], []
    cert_hits, cert_total = 0, 0
    bs = args.batch_size
    t0 = time.time()
    n_q = 0
    q_budget = args.max_q_sp_len - (4 if tok.spec.roberta_style else 3)
    for s in range(0, len(ds_items), bs):
        batch = ds_items[s:s + bs]
        pad = bs - len(batch)
        claims = [r["claim"] for r in batch]
        claims_p = claims + [claims[-1]] * pad
        q_inputs = tok.encode_batch_one(claims_p, args.max_q_len)
        raw = [tok.raw_ids_padded(c, q_budget) for c in claims_p]
        res = searcher.search(q_inputs, np.stack([r[0] for r in raw]),
                              np.array([r[1] for r in raw]))
        n_q += len(batch)
        for key in ("pca_cert1", "pca_cert2"):
            if key in res:
                c = np.asarray(res[key][: len(batch)])
                cert_hits += int(c.sum())
                cert_total += c.size
        for i, row in enumerate(batch):
            chains = [
                [(corpus[int(h1)]["title"], corpus[int(h1)]["text"]),
                 (corpus[int(h2)]["title"], corpus[int(h2)]["text"])]
                for h1, h2 in zip(res["hop1_ids"][i], res["hop2_ids"][i])]
            if "sp" in row:
                path_titles = [[c[0][0], c[1][0]] for c in chains]
                hop1_titles = [corpus[int(j)]["title"]
                               for j in res["hop1_cand_ids"][i]]
                metrics.append(chain_metrics(row["sp"],
                                             row.get("type", "multi"),
                                             path_titles, hop1_titles))
            outputs.append({
                "id": row.get("id"),
                "claim": row["claim"],
                "candidate_chains": chains,
            })
    dt = time.time() - t0
    logger.info("searched %d claims in %.2fs (%.1f q/s)", n_q, dt, n_q / dt)
    if cert_total:
        logger.info("pca exactness certificates: %.1f%% of MIPS queries "
                    "provably exact", 100.0 * cert_hits / cert_total)

    if metrics:
        agg = aggregate_metrics(metrics)
        for scope, vals in agg.items():
            logger.info("[%s] n=%d  Avg PR: %.4f  Avg P-EM: %.4f  "
                        "Avg 1-Recall: %.4f  Path Recall: %.4f",
                        scope, vals["n"], vals["avg_pr"], vals["avg_p_em"],
                        vals["avg_1_recall"], vals["path_recall"])
        print(json.dumps(agg["overall"]))

    if args.save_path and common.is_primary():
        with open(args.save_path, "w") as f:
            for o in outputs:
                f.write(json.dumps(o) + "\n")
        logger.info("wrote %d candidate chains to %s", len(outputs),
                    args.save_path)
    return outputs


if __name__ == "__main__":
    main()
