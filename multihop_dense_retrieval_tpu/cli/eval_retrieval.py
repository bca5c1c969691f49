"""CLI: single-hop retrieval eval with answer-recall@k.

Equivalent of scripts/eval/eval_retrieval.py: encode questions, exact top-k
over the index, then answer recall @ {1,5,10,20,50,100} via token-subsequence
matching (a process pool of SimpleTokenizer matchers in the reference,
eval_retrieval.py:60-82,171-178 — a thread pool here; the matcher releases
the GIL rarely but corpora are small relative to search time).

Also reports SP recall@k when rows carry `sp` gold titles.
"""

import argparse
import concurrent.futures as cf
import json
import time

import numpy as np

from ..core.config import SearchConfig
from ..data.corpus import Corpus
from ..index.store import DenseIndex
from ..ops.mips import mips_topk
from ..utils.text import SimpleTokenizer, para_has_answer
from . import common


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("raw_data", help="eval JSONL: question (or FEVER claim)/answer per line")
    p.add_argument("index_dir")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--model-name", default="roberta-base")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-q-len", type=int, default=50)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--num-workers", type=int, default=16)
    p.add_argument("--pca", action="store_true",
                   help="PCA-prefiltered MIPS (index built with --pca-dims) "
                        "— bulk large-k retrieval is where the prefilter "
                        "pays most (no downstream encode to schedule "
                        "around); certified fraction reported")
    p.add_argument("--pca-k-chunks", type=int, default=16)
    p.add_argument("--save-path", default="")
    args = p.parse_args(argv)

    logger = common.setup_logging()
    enc_cfg = common.resolve_encoder_config(args.model_name)
    tok = common.resolve_tokenizer(args.tokenizer)
    model, params = common.init_retriever(enc_cfg, checkpoint=args.checkpoint)
    index = DenseIndex.load(f"{args.index_dir}/index.npz")
    corpus = Corpus.from_id2doc(f"{args.index_dir}/id2doc.json")

    with open(args.raw_data) as f:
        items = [json.loads(l) for l in f if l.strip()]

    import jax.numpy as jnp
    import jax

    @jax.jit
    def encode(params, ids, mask):
        return model.apply(params, ids, mask, method=model.encode_seq)

    if args.pca and index.pca_proj is None:
        p.error("--pca needs an index built with encode_corpus --pca-dims")
    use_pca = args.pca
    if use_pca and index.vectors.shape[0] // index.pca_cand_rows < 2:
        # same guard as the engine (search/beam.py): a single candidate
        # chunk leaves nothing unselected for the certificate comparison,
        # and mips_topk_pca rejects k_chunks >= chunks — fall back to the
        # exact kernels instead of crashing on tiny corpora
        logger.info("--pca: index too small for the prefilter "
                    "(single candidate chunk); using exact search")
        use_pca = False
    # multi-vector indexes: fetch topk*m ROWS, collapse to topk DOCS via
    # max-over-vectors (the engine's merge, ops/mips.py::merge_multivector)
    mv = index.multi_vector
    k_rows = args.topk * mv

    all_ids = []
    cert_hits = cert_total = 0
    t0 = time.time()
    bs = args.batch_size
    for s in range(0, len(items), bs):
        batch = items[s:s + bs]
        pad = bs - len(batch)
        qs = [r.get("question", r.get("claim", "")) for r in batch]
        qs = [q[:-1] if q.endswith("?") else q for q in qs]
        enc = tok.encode_batch_one(qs + [qs[-1]] * pad, args.max_q_len)
        vecs = encode(params, jnp.asarray(enc["input_ids"]),
                      jnp.asarray(enc["attention_mask"]))
        if use_pca:
            from ..ops.mips import mips_topk_pca, pick_pca_step_rows

            cand = index.pca_cand_rows
            n_pad_rows = index.vectors.shape[0]
            step = pick_pca_step_rows(n_pad_rows, cand)
            kc = max(1, min(args.pca_k_chunks, n_pad_rows // cand - 1))
            vals, ids, cert = mips_topk_pca(
                index.vectors, index.pca_proj, index.pca_rot,
                index.pca_bounds, vecs.astype(jnp.float32), k_rows,
                k_chunks=kc, cand_rows=cand, step_rows=step,
                n_valid=index.n_docs, doc_scales=index.scales,
                interpret=jax.default_backend() != "tpu")
            c = np.asarray(cert)[: len(batch)]
            cert_hits += int(c.sum())
            cert_total += c.size
        else:
            # int8 indexes: queries stay fp32 (the kernel quantizes them
            # itself) and per-row scales ride along — casting queries to
            # the index dtype would truncate them to int8 garbage
            qdt = (jnp.float32 if index.scales is not None
                   else index.vectors.dtype)
            vals, ids = mips_topk(index.vectors, vecs.astype(qdt),
                                  k_rows, chunk_rows=args.chunk_rows,
                                  n_valid=index.n_docs,
                                  doc_scales=index.scales)
        if mv > 1:
            from ..ops.mips import merge_multivector

            _, ids = merge_multivector(vals, ids, args.topk, mv)
        all_ids.append(np.asarray(ids)[: len(batch)])
    all_ids = np.concatenate(all_ids)
    dt = time.time() - t0
    logger.info("retrieved %d questions in %.2fs (%.1f q/s)",
                len(items), dt, len(items) / dt)
    if cert_total:
        logger.info("pca exactness certificates: %.1f%% provably exact "
                    "top-%d", 100.0 * cert_hits / cert_total, args.topk)

    simple = SimpleTokenizer()
    ks = [k for k in (1, 5, 10, 20, 50, 100) if k <= args.topk]

    def recall_row(i):
        row = items[i]
        answers = row.get("answer", row.get("answers", []))
        if isinstance(answers, str):
            # raw files store a bare string; para_has_answer would iterate
            # it CHARACTER by character and near-always "find" one-letter
            # answers, silently inflating recall
            answers = [answers]
        sp = set(row.get("sp", []))
        hits, sp_hits = {}, {}
        found, sp_found = False, False
        for rank, doc_id in enumerate(all_ids[i]):
            doc = corpus[int(doc_id)]
            if not found and answers and para_has_answer(
                    answers, doc["title"] + " " + doc["text"], simple):
                found = True
                first = rank
            if not sp_found and sp and doc["title"] in sp:
                sp_found = True
                sp_first = rank
        for k in ks:
            hits[k] = int(found and first < k) if answers else None
            sp_hits[k] = int(sp_found and sp_first < k) if sp else None
        return hits, sp_hits

    with cf.ThreadPoolExecutor(args.num_workers) as pool:
        results = list(pool.map(recall_row, range(len(items))))

    out = {}
    for k in ks:
        ans = [r[0][k] for r in results if r[0][k] is not None]
        sps = [r[1][k] for r in results if r[1][k] is not None]
        if ans:
            out[f"answer_recall@{k}"] = float(np.mean(ans))
        if sps:
            out[f"sp_recall@{k}"] = float(np.mean(sps))
    out["qps"] = len(items) / dt
    logger.info("metrics: %s", out)
    print(json.dumps(out))

    if args.save_path and common.is_primary():
        with open(args.save_path, "w") as f:
            for i, row in enumerate(items):
                f.write(json.dumps({
                    "question": row.get("question", row.get("claim", "")),
                    "retrieved": [corpus[int(d)]["title"] for d in all_ids[i]],
                }) + "\n")
    return out


if __name__ == "__main__":
    main()
