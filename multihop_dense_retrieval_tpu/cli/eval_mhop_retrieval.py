"""CLI: 2-hop beam-search retrieval eval on HotpotQA-format data.

Equivalent of scripts/eval/eval_mhop_retrieval.py — same metrics block
(Avg PR / P-EM / 1-Recall / Path Recall, overall + per type) and the same
candidate-chain JSONL dump for the reader, but the engine is the single-jit
TPU pipeline (search/beam.py) over artifacts from cli/encode_corpus.py.

Usage:
  python -m multihop_dense_retrieval_tpu.cli.eval_mhop_retrieval \
      QAS.jsonl INDEX_DIR --tokenizer hash --model-name tiny \
      --beam-size 4 --topk 4 [--save-path chains.jsonl]
"""

import argparse
import json
import os
import time

import numpy as np

from ..core.config import SearchConfig
from ..core.mesh import make_mesh
from ..data.corpus import Corpus, TokenizedCorpus
from ..eval.retrieval_metrics import chain_metrics, aggregate_metrics
from ..index.store import DenseIndex
from ..search.beam import BeamSearcher
from . import common


def load_searcher(index_dir, tok, model, params, cfg, mesh=None,
                  unified=False):
    import jax.numpy as jnp

    index = DenseIndex.load(os.path.join(index_dir, "index.npz"),
                            mesh=mesh if (mesh and mesh.shape.get("index", 1) > 1)
                            else None)
    # uint16 end-to-end: the engine keeps the token store at its on-disk
    # width in HBM and upcasts after the per-beam gather (beam.py:418) —
    # exact (tests/test_search.py::test_uint16_token_store_is_exact), and
    # the 5.2M corpus's token store drops from 6.2 to 3.1 GB of HBM
    tc = TokenizedCorpus.load(os.path.join(index_dir, "tokens.npz"),
                              token_dtype=np.uint16)
    n_pad = index.vectors.shape[0]
    spec = tok.spec

    def padrows(x, fill):
        out = np.full((n_pad,) + x.shape[1:], fill, x.dtype)
        out[: x.shape[0]] = x
        return out

    encode_qsp_fn = None
    if unified:
        # variable-hop serving: the q⊕p encode also yields the stop head
        encode_qsp_fn = lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_qsp)
    return BeamSearcher(
        encode_fn=lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_seq),
        encode_qsp_fn=encode_qsp_fn,
        params=params, index=index,
        text_ids=jnp.asarray(padrows(tc.text_ids, spec.pad_id)),
        text_lens=jnp.asarray(padrows(tc.text_lens, 0)),
        empty=jnp.asarray(padrows(tc.empty, False)),
        spec=spec, config=cfg, mesh=mesh)


def _patch_missing(d, i):
    """HNSW returns id -1 when the index holds fewer than k docs; Python
    negative indexing would silently wrap corpus[-1] to the last document.
    Remap to doc 0 with a NEG_INF score so the slot can never win."""
    from ..ops.mips import NEG_INF

    missing = i < 0
    return np.where(missing, NEG_INF, d), np.where(missing, 0, i)


class _HnswBeamSearcher:
    """Host-serving 2-hop engine: device encodes, native HNSW searches.

    Mirrors the reference's --hnsw mode (eval_mhop_retrieval.py:96-119,
    153-188) with the same .search() result contract as BeamSearcher.
    """

    def __init__(self, hnsw, encode, tok, corpus, cfg, ef_search):
        self.hnsw = hnsw
        self.encode = encode
        self.tok = tok
        self.corpus = corpus
        self.cfg = cfg
        self.ef = ef_search

    def search(self, q_inputs, q_raw_ids, q_raw_lens):
        import jax.numpy as jnp
        from ..ops.mips import NEG_INF

        cfg = self.cfg
        beam1, beam2, topk = cfg.beam_size_1, cfg.beam_size_2, cfg.topk
        q_tt = q_inputs.get("token_type_ids")
        q_vec = np.asarray(self.encode(jnp.asarray(q_inputs["input_ids"]),
                                       jnp.asarray(q_inputs["attention_mask"]),
                                       None if q_tt is None
                                       else jnp.asarray(q_tt)),
                           np.float32)
        d1, i1 = self.hnsw.search(q_vec, beam1, self.ef)
        d1, i1 = _patch_missing(d1, i1)
        bsz = q_vec.shape[0]
        # assemble hop-2 inputs from raw question ids ⊕ doc-text ids (id-level
        # pair encoding — identical to the reference's host retokenization)
        from ..search.beam import assemble_pair_inputs

        doc_rows = []
        for b in range(bsz):
            for s in range(beam1):
                doc = self.corpus[int(i1[b, s])]
                text = doc["text"] if doc["text"].strip() else doc["title"]
                if not doc["text"].strip():
                    d1[b, s] = NEG_INF
                doc_rows.append(self.tok.raw_ids_padded(text, 300))
        b_ids = np.stack([r[0] for r in doc_rows])
        b_lens = np.array([r[1] for r in doc_rows])
        a_ids = np.repeat(q_raw_ids, beam1, axis=0)
        a_lens = np.repeat(q_raw_lens, beam1, axis=0)
        qsp = assemble_pair_inputs(jnp.asarray(a_ids), jnp.asarray(a_lens),
                                   jnp.asarray(b_ids), jnp.asarray(b_lens),
                                   cfg.max_q_sp_len, self.tok.spec)
        qsp_vec = np.asarray(self.encode(qsp["input_ids"],
                                         qsp["attention_mask"],
                                         qsp.get("token_type_ids")), np.float32)
        d2, i2 = self.hnsw.search(qsp_vec, beam2, self.ef)
        d2, i2 = _patch_missing(d2, i2)
        d2 = d2.reshape(bsz, beam1, beam2)
        i2 = i2.reshape(bsz, beam1, beam2)
        path = d1[:, :, None] + d2
        flatscores = path.reshape(bsz, -1)
        order = np.argsort(-flatscores, axis=1)[:, :topk]
        hop1_slot = order // beam2
        return {
            "path_scores": np.take_along_axis(flatscores, order, axis=1),
            "hop1_ids": np.take_along_axis(i1, hop1_slot, axis=1),
            "hop2_ids": np.take_along_axis(i2.reshape(bsz, -1), order, axis=1),
            "hop1_cand_ids": i1,
            "hop1_cand_scores": d1,
        }


def _hnsw_searcher(args, logger, tok, model, params, cfg, corpus):
    import jax
    import jax.numpy as jnp
    from ..index.hnsw import HNSWIndex

    hnsw_path = os.path.join(args.index_dir, "index.hnsw")
    if os.path.exists(hnsw_path):
        logger.info("loading HNSW index %s", hnsw_path)
        hnsw = HNSWIndex.load(hnsw_path)
    else:
        logger.info("building HNSW index from index.npz ...")
        dense = DenseIndex.load(os.path.join(args.index_dir, "index.npz"))
        if dense.multi_vector > 1:
            raise ValueError(
                "--hnsw does not support multi-vector indexes: the graph "
                "returns ROW ids and the host path has no max-over-vectors "
                "doc merge — use the exact device engine")
        vecs = np.asarray(dense.vectors[: dense.n_docs], np.float32)
        if dense.scales is not None:
            # int8 codes without their per-row dequantization scales would
            # skew every document's inner products by its own scale
            vecs *= np.asarray(dense.scales)[: dense.n_docs, None]
        hnsw = HNSWIndex(vecs.shape[1], M=32, ef_construction=200)
        hnsw.add(vecs)
        hnsw.save(hnsw_path)
        logger.info("built + cached %s (%d vectors)", hnsw_path, len(hnsw))

    # params passed as an argument (never close over big arrays in jit)
    _enc = jax.jit(lambda p, ids, mask, tt: model.apply(
        p, ids, mask, tt, method=model.encode_seq))
    encode = lambda ids, mask, tt=None: _enc(params, ids, mask, tt)
    return _HnswBeamSearcher(hnsw, encode, tok, corpus, cfg, args.ef_search)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("raw_data", help="eval JSONL: question/sp/type per line")
    p.add_argument("index_dir", help="output dir of cli.encode_corpus")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--model-name", default="roberta-base")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--topk", type=int, default=2)
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--beam-size-2", type=int, default=None,
                   help="hop-2 beam (FEVER uses asymmetric beams, "
                        "eval_mhop_fever.py:55-56); defaults to --beam-size")
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--max-q-len", type=int, default=70)
    p.add_argument("--max-q-sp-len", type=int, default=350)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--index-shards", type=int, default=1)
    p.add_argument("--hnsw", action="store_true",
                   help="host-side approximate search via the native C++ "
                        "HNSW index (reference --hnsw parity); builds and "
                        "caches <index_dir>/index.hnsw")
    p.add_argument("--ef-search", type=int, default=128)
    p.add_argument("--unified", action="store_true",
                   help="variable-hop serving with a UnifiedRetriever "
                        "checkpoint: the stop head decides whether the top "
                        "chain is a single passage (the reference trained "
                        "this head but shipped no eval for it)")
    p.add_argument("--stop-threshold", type=float, default=0.5,
                   help="P(single-hop) above which the top chain is emitted "
                        "as one passage (--unified only)")
    p.add_argument("--stop-skip", type=float, default=0.0,
                   help="device-side early stop (--unified only): questions "
                        "whose best hop-1 pair reaches this P(stop) skip the "
                        "hop-2 encode of their remaining candidates tile-"
                        "wise (SearchConfig.stop_skip_threshold); 0 = off")
    p.add_argument("--pca", action="store_true",
                   help="PCA-prefiltered MIPS (index must be built with "
                        "encode_corpus --pca-dims): faster search with "
                        "per-query exactness certificates; the certified "
                        "fraction is reported")
    p.add_argument("--pca-k-chunks", type=int, default=8,
                   help="chunks rescanned per query (higher = more "
                        "certified queries)")
    p.add_argument("--pca-hops", default="auto",
                   choices=["auto", "1", "2", "12"],
                   help="which hops use the prefilter; auto = hop 2 always, "
                        "hop 1 only without hop-2 buckets (measured lax.cond "
                        "interaction, PERF.md)")
    common.add_hop2_tiling_args(p)
    p.add_argument("--save-path", default="")
    args = p.parse_args(argv)

    logger = common.setup_logging()
    enc_cfg = common.resolve_encoder_config(args.model_name)
    tok = common.resolve_tokenizer(args.tokenizer)
    model, params = common.init_retriever(enc_cfg, unified=args.unified,
                                          checkpoint=args.checkpoint)

    with open(args.raw_data) as f:
        ds_items = [json.loads(l) for l in f if l.strip()]

    h2b, h2f = common.resolve_hop2_tiling(
        args, args.batch_size * args.beam_size, args.max_q_sp_len)
    cfg = SearchConfig(beam_size_1=args.beam_size,
                       beam_size_2=args.beam_size_2 or args.beam_size,
                       topk=args.topk, max_q_len=args.max_q_len,
                       max_q_sp_len=args.max_q_sp_len,
                       chunk_rows=args.chunk_rows,
                       use_pallas=not args.no_pallas,
                       hop2_buckets=h2b, hop2_tile_fracs=h2f,
                       hop2_prune_margin=args.hop2_prune_margin,
                       use_pca=args.pca, pca_k_chunks=args.pca_k_chunks,
                       pca_hops=args.pca_hops,
                       stop_skip_threshold=args.stop_skip)
    corpus = Corpus.from_id2doc(os.path.join(args.index_dir, "id2doc.json"))
    if args.stop_skip > 0 and not args.unified:
        p.error("--stop-skip needs --unified (the stop head lives on the "
                "UnifiedRetriever's q⊕p encoder)")
    if args.pca and args.hnsw:
        p.error("--pca is a device tier (not with --hnsw)")
    if args.hnsw:
        if args.unified:
            p.error("--unified is not supported with --hnsw (the host HNSW "
                    "engine has no stop-head path); use the device engine")
        searcher = _hnsw_searcher(args, logger, tok, model, params, cfg, corpus)
    else:
        mesh = (make_mesh(index=args.index_shards)
                if args.index_shards > 1 else None)
        searcher = load_searcher(args.index_dir, tok, model, params, cfg,
                                 mesh, unified=args.unified)

    metrics, outputs = [], []
    cert_hits, cert_total = 0, 0
    bs = args.batch_size
    t0 = time.time()
    n_q = 0
    for s in range(0, len(ds_items), bs):
        batch = ds_items[s:s + bs]
        pad = bs - len(batch)
        qs = [(r["question"][:-1] if r["question"].endswith("?")
               else r["question"]) for r in batch]
        qs_padded = qs + [qs[-1]] * pad
        q_inputs = tok.encode_batch_one(qs_padded, args.max_q_len)
        # raw ids feed hop-2 pair assembly: the reference tokenizes the FULL
        # question inside encode_plus(q, doc, max_length=max_q_sp_len) and
        # lets longest-first truncation decide, so budget by max_q_sp_len
        q_budget = args.max_q_sp_len - (4 if tok.spec.roberta_style else 3)
        raw = [tok.raw_ids_padded(q, q_budget) for q in qs_padded]
        res = searcher.search(q_inputs, np.stack([r[0] for r in raw]),
                              np.array([r[1] for r in raw]))
        n_q += len(batch)
        for key in ("pca_cert1", "pca_cert2"):
            if key in res:
                c = np.asarray(res[key][: len(batch)])
                cert_hits += int(c.sum())
                cert_total += c.size
        for i, row in enumerate(batch):
            # variable-hop: a chain whose stop head fires is one passage
            stops = [False] * len(res["hop1_ids"][i])
            if args.unified and "top_stop_probs" in res:
                stops = [p > args.stop_threshold
                         for p in res["top_stop_probs"][i]]
            path_titles = [
                [corpus[int(h1)]["title"]] if stop
                else [corpus[int(h1)]["title"], corpus[int(h2)]["title"]]
                for h1, h2, stop in zip(res["hop1_ids"][i],
                                        res["hop2_ids"][i], stops)]
            hop1_titles = [corpus[int(j)]["title"]
                           for j in res["hop1_cand_ids"][i]]
            if "sp" in row:
                metrics.append(chain_metrics(row["sp"], row.get("type", "single"),
                                             path_titles, hop1_titles))
            out_row = {
                "_id": row.get("_id"),
                "question": row["question"],
                "candidate_chains": [
                    [corpus[int(h1)]] if stop
                    else [corpus[int(h1)], corpus[int(h2)]]
                    for h1, h2, stop in zip(res["hop1_ids"][i],
                                            res["hop2_ids"][i], stops)],
            }
            if args.unified and "top_stop_probs" in res:
                out_row["stop_probs"] = [float(p)
                                         for p in res["top_stop_probs"][i]]
            outputs.append(out_row)
    dt = time.time() - t0
    logger.info("searched %d questions in %.2fs (%.1f q/s)", n_q, dt, n_q / dt)
    if cert_total:
        logger.info("pca exactness certificates: %.1f%% of MIPS queries "
                    "provably exact", 100.0 * cert_hits / cert_total)

    agg = None
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
    return agg, outputs


if __name__ == "__main__":
    main()
