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
from ..index.build import build_index
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
    args = p.parse_args(argv)

    logger = common.setup_logging(args.out_dir)
    cfg = common.resolve_encoder_config(args.model_name)
    tok = common.resolve_tokenizer(args.tokenizer)
    model, params = common.init_retriever(cfg, unified=args.unified,
                                          checkpoint=args.checkpoint)

    logger.info("loading corpus %s", args.corpus)
    corpus = Corpus.from_jsonl(args.corpus, max_docs=args.max_docs)
    logger.info("tokenizing %d docs", len(corpus))
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=args.max_c_len)

    import jax
    mesh = make_mesh(data=args.data_parallel or len(jax.devices()), index=1)

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
    import jax.numpy as jnp
    index = build_index(encode_fn, params, tc, tok.spec,
                        max_c_len=args.max_c_len, batch_size=args.batch_size,
                        chunk_rows=args.chunk_rows, mesh=mesh, progress=True,
                        dtype=jnp.dtype(args.index_dtype),
                        multi_vector=args.multi_vector,
                        length_sort=not args.no_length_sort,
                        pca_dims=args.pca_dims,
                        pca_cand_rows=args.pca_cand_rows)

    os.makedirs(args.out_dir, exist_ok=True)
    index.save(os.path.join(args.out_dir, "index.npz"))
    tc.save(os.path.join(args.out_dir, "tokens.npz"))
    corpus.save_id2doc(os.path.join(args.out_dir, "id2doc.json"))
    logger.info("wrote index (%d docs, padded %d) to %s",
                index.n_docs, index.vectors.shape[0], args.out_dir)


if __name__ == "__main__":
    main()
