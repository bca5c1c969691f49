"""CLI: bulk-encode a corpus into the dense index + tokenized store.

Equivalent of scripts/encode_corpus.py, emitting three artifacts:
  <out>/index.npz      — DenseIndex (bf16, chunk-aligned)
  <out>/tokens.npz     — TokenizedCorpus (uint16 ids) for on-device hop-2
  <out>/id2doc.json    — row → {title, text} table (eval/demo parity)

Usage:
  python -m multihop_dense_retrieval_tpu.cli.encode_corpus CORPUS.jsonl OUT_DIR \
      --tokenizer hash --model-name tiny [--checkpoint ckpt.pt]
"""

import argparse
import os

from ..core.mesh import make_mesh
from ..data.corpus import Corpus, TokenizedCorpus
from . import common


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("corpus", help="JSONL with {title, text} per line")
    p.add_argument("out_dir")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--model-name", default="roberta-base")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max-c-len", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--index-dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "int8"],
                   help="int8 halves HBM vs bf16 (per-row symmetric scales)")
    p.add_argument("--max-docs", type=int, default=None)
    p.add_argument("--no-length-sort", action="store_true",
                   help="disable length-sorted bucketed encoding (exact "
                        "either way; sorting is the fast path)")
    p.add_argument("--pca-dims", type=int, default=None,
                   help="build a PCA prefilter of this rank alongside the "
                        "index (search with eval --pca: faster MIPS with "
                        "per-query exactness certificates)")
    p.add_argument("--pca-cand-rows", type=int, default=512,
                   help="candidate-chunk granularity of the prefilter "
                        "(multiple of 128, divides chunk-rows)")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="devices on the data axis (default: all)")
    p.add_argument("--multi-vector", type=int, default=1,
                   help=">1: encode each passage into N grouped index rows "
                        "(models/retriever.py::MultiVectorCtxEncoder); "
                        "search collapses rows to docs by max-over-vectors")
    p.add_argument("--mv-scheme", default="tokenwise",
                   choices=["tokenwise", "layerwise"])
    p.add_argument("--unified", action="store_true",
                   help="encode with a UnifiedRetriever checkpoint "
                        "(variable-hop serving, see eval --unified)")
    p.add_argument("--num-shards", type=int, default=1,
                   help="split the corpus into N contiguous slices; this "
                        "invocation encodes one slice (see --shard-id) and "
                        "writes a shard artifact instead of the final index "
                        "(merge with --merge-only).  Under cli.pod this is "
                        "auto-set to the process count.")
    p.add_argument("--shard-id", type=int, default=None,
                   help="which slice to encode (default: the jax process "
                        "index — the right value under cli.pod)")
    p.add_argument("--merge-only", action="store_true",
                   help="skip encoding; merge existing shard artifacts in "
                        "OUT_DIR into index.npz/tokens.npz/id2doc.json")
    p.add_argument("--keep-shards", action="store_true",
                   help="keep the per-shard artifacts after merging")
    p.add_argument("--export-npy", action="store_true",
                   help="also write wiki_index.npy — the reference's raw "
                        "fp32 embedding matrix (consumed there via np.load "
                        "+ FAISS add, scripts/eval/eval_mhop_retrieval.py) — "
                        "so a TPU-encoded corpus drops into the reference "
                        "stack; with id2doc.json that closes the index "
                        "interop loop the way cli/export_ckpt does for "
                        "checkpoints.  Single-host only (not --num-shards)")
    args = p.parse_args(argv)
    if args.export_npy and (args.num_shards > 1 or args.merge_only):
        p.error("--export-npy requires the single-host encode path (each "
                "shard only holds its slice and merged artifacts are "
                "already quantized); re-encode without --num-shards/"
                "--merge-only to export")
    if args.export_npy and args.multi_vector > 1:
        p.error("--export-npy is the reference's one-row-per-doc FAISS "
                "format; a multi-vector matrix (N rows per doc) would "
                "silently misalign with id2doc.json there")

    logger = common.setup_logging(args.out_dir)

    import jax
    import jax.numpy as jnp
    from ..index import shards as sh

    build_kw = dict(chunk_rows=args.chunk_rows, dtype=args.index_dtype,
                    multi_vector=args.multi_vector, pca_dims=args.pca_dims,
                    pca_cand_rows=args.pca_cand_rows)
    if args.merge_only:
        index = sh.merge_shards(args.out_dir,
                                args.num_shards if args.num_shards > 1
                                else None,
                                keep_shards=args.keep_shards, **build_kw)
        logger.info("merged shards: index (%d docs, padded %d) in %s",
                    index.n_docs, index.vectors.shape[0], args.out_dir)
        return

    # pod mode: every process encodes its own slice on LOCAL devices (a
    # global-mesh jit cannot consume process-local host arrays), then
    # process 0 merges after a barrier — see index/shards.py.
    pod = jax.process_count() > 1
    num_shards = args.num_shards
    if pod and num_shards == 1:
        num_shards = jax.process_count()
    if args.export_npy and num_shards > 1:
        # pod auto-sharding resolves after argparse — fail as loudly here
        raise SystemExit(
            "--export-npy cannot run on the sharded (pod) encode path; "
            "encode single-host to export the reference matrix")
    shard_id = args.shard_id
    if shard_id is None:
        shard_id = jax.process_index()

    cfg = common.resolve_encoder_config(args.model_name)
    tok = common.resolve_tokenizer(args.tokenizer)
    model, params = common.init_retriever(cfg, unified=args.unified,
                                          checkpoint=args.checkpoint)

    logger.info("loading corpus %s", args.corpus)
    corpus = Corpus.from_jsonl(args.corpus, max_docs=args.max_docs)
    if num_shards > 1:
        lo, hi = sh.shard_bounds(len(corpus), num_shards, shard_id)
        logger.info("shard %d/%d: docs [%d, %d)", shard_id, num_shards,
                    lo, hi)
        corpus = Corpus(corpus.docs[lo:hi])
    logger.info("tokenizing %d docs", len(corpus))
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=args.max_c_len)

    devs = jax.local_devices() if pod else jax.devices()
    mesh = make_mesh(data=args.data_parallel or len(devs), index=1,
                     devices=devs)

    if args.multi_vector > 1:
        from ..models.retriever import MultiVectorCtxEncoder

        mv_model = MultiVectorCtxEncoder(cfg, multi_vector=args.multi_vector,
                                         scheme=args.mv_scheme)
        # the multi-vector encoder shares the retriever's transformer stack
        # AND projection head (corpus rows must live in the same projected
        # space as the query vectors they are scored against).
        # Passed as the jit ARGUMENT (never close over params in jit).
        params = {"params": {"encoder": params["params"]["encoder"],
                             "project": params["params"]["project"]}}

        def encode_fn(p_, ids, mask, *type_ids):
            return mv_model.apply(p_, ids, mask, *type_ids)
    else:
        def encode_fn(p_, ids, mask, *type_ids):
            return model.apply(p_, ids, mask, *type_ids,
                               method=model.encode_seq)

    logger.info("encoding on %s", mesh)
    if num_shards > 1:
        from ..index.build import encode_corpus as encode_slice

        emb = encode_slice(encode_fn, params, tc, tok.spec,
                           max_c_len=args.max_c_len,
                           batch_size=args.batch_size, mesh=mesh,
                           progress=True, multi_vector=args.multi_vector,
                           length_sort=not args.no_length_sort)
        sh.save_shard(args.out_dir, shard_id, num_shards, emb, tc, corpus)
        logger.info("wrote shard %d/%d (%d docs) to %s", shard_id,
                    num_shards, len(corpus), args.out_dir)
        if pod:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("encode_corpus_shards")
            if jax.process_index() == 0:
                index = sh.merge_shards(args.out_dir, num_shards,
                                        keep_shards=args.keep_shards,
                                        **build_kw)
                logger.info("merged %d shards: index (%d docs, padded %d)",
                            num_shards, index.n_docs,
                            index.vectors.shape[0])
        else:
            logger.info("encode the remaining shards, then run with "
                        "--merge-only to produce the final index")
        return

    from ..index.build import encode_corpus as encode_slice
    from ..index.store import DenseIndex

    emb = encode_slice(encode_fn, params, tc, tok.spec,
                       max_c_len=args.max_c_len,
                       batch_size=args.batch_size, mesh=mesh,
                       progress=True, multi_vector=args.multi_vector,
                       length_sort=not args.no_length_sort)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.export_npy:
        import numpy as np

        # raw fp32, unpadded, unquantized — exactly what the reference's
        # np.load(index_path) + index.add(xb) expects
        np.save(os.path.join(args.out_dir, "wiki_index.npy"), emb)
        logger.info("wrote wiki_index.npy %s (reference FAISS format)",
                    emb.shape)
    index = DenseIndex.build(emb, chunk_rows=args.chunk_rows,
                             dtype=jnp.dtype(args.index_dtype),
                             mesh=mesh, multi_vector=args.multi_vector,
                             pca_dims=args.pca_dims,
                             pca_cand_rows=args.pca_cand_rows)
    index.save(os.path.join(args.out_dir, "index.npz"))
    tc.save(os.path.join(args.out_dir, "tokens.npz"))
    corpus.save_id2doc(os.path.join(args.out_dir, "id2doc.json"))
    logger.info("wrote index (%d docs, padded %d) to %s",
                index.n_docs, index.vectors.shape[0], args.out_dir)


if __name__ == "__main__":
    main()
