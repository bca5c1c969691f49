"""Shared CLI plumbing: tokenizer/model/checkpoint resolution.

The reference spreads this across argparse configs (mdr/retrieval/config.py)
and load_saved (utils/utils.py:10-22); here every entry point shares one
resolver so `--model-name roberta-base --checkpoint q_encoder.pt` works the
same everywhere, and tests/benches can use `--tokenizer hash --model-name
tiny` for a self-contained run.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.compile_cache import enable_compile_cache
from ..core.config import EncoderConfig
from ..data.tokenization import HashTokenizer, HFTokenizer
from ..models import MhopRetriever, UnifiedRetriever
from ..models import convert


def setup_logging(output_dir: Optional[str] = None) -> logging.Logger:
    # every CLI funnels through here (or add_pipeline_args) before first
    # device use — the one spot to arm the persistent compile cache so a
    # restart never repays the multi-minute remote compile
    enable_compile_cache()
    logger = logging.getLogger("mdr_tpu")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        logger.addHandler(logging.StreamHandler())
        # multi-host pods share one output dir — only process 0 owns
        # log.txt (every process appending interleaves/corrupts lines)
        if output_dir and is_primary():
            os.makedirs(output_dir, exist_ok=True)
            logger.addHandler(logging.FileHandler(
                os.path.join(output_dir, "log.txt")))
    return logger


def load_json_flex(path: str):
    """Load a .json array OR .jsonl file (sniffs the first non-whitespace
    char — raw HotpotQA ships as a json array, our dumps as jsonl)."""
    import json

    with open(path) as f:
        head = f.read(64)
        f.seek(0)
        if head.lstrip()[:1] == "[":
            return json.load(f)
        return [json.loads(l) for l in f if l.strip()]


def is_primary() -> bool:
    """True on the process that should own shared-filesystem writes
    (process 0 of a pod; always true single-process)."""
    import jax

    return jax.process_index() == 0


MODEL_PRESETS = {
    "roberta-base": EncoderConfig.roberta_base,
    "bert-base-uncased": EncoderConfig.bert_base_uncased,
    "electra-large": EncoderConfig.electra_large,
    "tiny": lambda **kw: EncoderConfig.tiny(
        vocab_size=50265, max_position_embeddings=514, **kw),
    # 4-layer/64-wide: still CPU-fast, but enough depth/width to learn
    # token-matching (induction) circuits the 2-layer tiny cannot — used
    # by the trained-weights fidelity/prune harnesses (scripts_dev/)
    "mini": lambda **kw: EncoderConfig.tiny(
        vocab_size=50265, max_position_embeddings=514, hidden_size=64,
        num_layers=4, intermediate_size=128, **kw),
}


def resolve_encoder_config(name: str, dtype: str = "bfloat16") -> EncoderConfig:
    if name not in MODEL_PRESETS:
        raise ValueError(f"unknown model preset {name}; "
                         f"options: {sorted(MODEL_PRESETS)}")
    return MODEL_PRESETS[name](dtype=dtype)


def add_pipeline_args(p):
    """Arguments that construct a `DemoPipeline` (retriever + reader + live
    index) — shared by the demo REPL and the HTTP server so the two flag
    surfaces cannot drift."""
    enable_compile_cache()  # serve/demo skip setup_logging; arm it here too
    p.add_argument("index_dir")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--retriever-model", default="roberta-base")
    p.add_argument("--retriever-checkpoint", default="")
    p.add_argument("--reader-model", default="electra-large")
    p.add_argument("--reader-checkpoint", default="")
    p.add_argument("--reader-tokenizer", default="",
                   help="tokenizer for the reader (its vocabulary differs "
                        "from the retriever's: electra wordpiece vs roberta "
                        "BPE); default: --tokenizer, correct only for the "
                        "hash test tokenizer")
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--max-q-len", type=int, default=70)
    p.add_argument("--max-q-sp-len", type=int, default=350)
    p.add_argument("--max-seq-len", type=int, default=512)
    p.add_argument("--max-ans-len", type=int, default=30)
    p.add_argument("--chunk-rows", type=int, default=4096)
    p.add_argument("--max-c-len", type=int, default=300,
                   help="passage budget when encoding live-added documents")
    p.add_argument("--reader-bf16-scores", action="store_true", default=True,
                   help="bf16 reader attention scores — DEFAULT (+5-11%% "
                        "at widths 384-512; 100%% answer agreement with "
                        "fp32 under a trained reader, PERF.md fidelity row)")
    p.add_argument("--reader-fp32-scores", dest="reader_bf16_scores",
                   action="store_false",
                   help="revert reader attention scores to fp32")
    p.add_argument("--pca", action="store_true",
                   help="PCA-prefiltered MIPS (index built with --pca-dims)")
    p.add_argument("--pca-k-chunks", type=int, default=8)
    p.add_argument("--lambda", dest="lam", type=float, default=0.8)
    p.add_argument("--unified", action="store_true",
                   help="serve a UnifiedRetriever checkpoint: the stop head "
                        "decides per beam whether the top passage answers "
                        "alone (1-passage chain) or hop 2 runs — variable-"
                        "hop serving on /retrieve, /answer, and the REPL")
    p.add_argument("--stop-threshold", type=float, default=0.5,
                   help="stop-probability above which a chain is served as "
                        "one passage (--unified only)")
    add_rank_args(p)
    add_hop2_tiling_args(p)


def add_rank_args(p):
    """Two-stage read flags (shared by the pipeline CLIs, end2end and
    train_qa predict)."""
    p.add_argument("--rank-topm", type=int, default=0,
                   help="two-stage read: rank ALL chains at --rank-width "
                        "tokens, run the full span/sp pass on the top-m per "
                        "question (0 = read every chain fully, the "
                        "reference behavior)")
    p.add_argument("--rank-width", type=int, default=128,
                   help="rank-pass token width; the r5 trained-reader "
                        "fidelity matrix (280 questions, evidence planted "
                        "at offsets 64..448, docs/fidelity_r5.json) shows "
                        "1.0 answer agreement with the full read at every "
                        "width down to 96 — 128 keeps one bucket of margin; "
                        "validate on your data if evidence can fall past "
                        "the width")


def _prune_margin(s: str) -> float:
    """--hop2-prune-margin parser: 'auto' = -0.5, 'auto:Q' = -Q
    (SearchConfig.hop2_prune_margin = -q = the q-quantile of the batch's
    positive hop-1 gaps, derived inside the jitted search —
    search/beam.py.  q=0.5 is the max-throughput median; q=0.9 was the
    65k-doc sweep's quality-neutral point, docs/prune_sweep_r5.json)."""
    if s == "auto":
        return -0.5
    if s.startswith("auto:"):
        q = float(s[5:])
        if not 0 < q <= 1:
            raise argparse.ArgumentTypeError(
                "auto:Q needs a gap quantile Q in (0, 1]")
        return -q
    v = float(s)
    if v < 0:
        raise argparse.ArgumentTypeError(
            "margin must be >= 0, 'auto', or 'auto:Q'")
    return v


def add_hop2_tiling_args(p):
    """Length-adaptive hop-2 encode flags (exact results, ~9-20%% measured
    serving win depending on beam width — PERF.md)."""
    p.add_argument("--hop2-buckets", default="auto",
                   help='hop-2 encode width tiles: "auto" (measured preset '
                        'picked by batch×beam row count), "off", or a comma '
                        'list of multiples of 32 ending at max-q-sp-len, '
                        'e.g. "128,160,192,256,350"')
    p.add_argument("--hop2-tile-fracs", default="",
                   help="comma row-fractions per bucket (sum to 1); empty = "
                        "preset fracs for auto, equal tiles otherwise")
    p.add_argument("--hop2-prune-margin", type=_prune_margin, default=0.0,
                   help="approximate: skip re-encoding hop-1 candidates "
                        "scoring more than this margin below their "
                        "question's top-1 (inner-product units); pruned "
                        "chains are excluded.  0 = off (exact); 'auto' = "
                        "per-batch MEDIAN hop-1 gap (max throughput: 1.72x "
                        "at beam 4, but flips near-tied chains under heavy "
                        "crowding — 65k-doc sweep agreement 0.77); "
                        "'auto:0.9' = the p90 gap, that sweep's "
                        "quality-neutral point (P-EM/PR unchanged, "
                        "agreement 0.98, 7.5%% pruned).  Sweep on your own "
                        "data (scripts_dev/prune_sweep.py)")


def resolve_hop2_tiling(args, n_rows: int, max_width: int):
    """Map the --hop2-buckets/--hop2-tile-fracs flags to SearchConfig
    fields.  ``n_rows`` is the hop-2 row count (batch × beam_size_1)."""
    from ..core.config import default_hop2_tiling

    spec = getattr(args, "hop2_buckets", "auto")
    if spec == "off":
        return (), ()
    if spec == "auto":
        return default_hop2_tiling(n_rows, max_width)
    buckets = tuple(int(x) for x in spec.split(","))
    fracs_spec = getattr(args, "hop2_tile_fracs", "")
    fracs = (tuple(float(x) for x in fracs_spec.split(","))
             if fracs_spec else ())
    # Fail loud on configs the engine would silently discard (its
    # _encode_hop2 falls back to equal tiles / full-width when the tiling
    # doesn't apply — fine for library defaults, wrong for explicit flags).
    if fracs:
        if len(fracs) != len(buckets):
            raise ValueError(
                f"--hop2-tile-fracs has {len(fracs)} entries for "
                f"{len(buckets)} buckets")
        sizes = [int(round(f * n_rows)) for f in fracs]
        sizes[-1] = n_rows - sum(sizes[:-1])
        if min(sizes) <= 0:
            raise ValueError(
                f"--hop2-tile-fracs {fracs_spec} leaves an empty tile at "
                f"{n_rows} hop-2 rows (batch x beam)")
    elif n_rows % len(buckets):
        raise ValueError(
            f"--hop2-buckets: {n_rows} hop-2 rows do not split into "
            f"{len(buckets)} equal tiles; pass --hop2-tile-fracs")
    return buckets, fracs


def resolve_tokenizer(spec: str, vocab_size: int = 50265,
                      roberta_style: bool = True):
    """`hash` → deterministic test tokenizer; anything else → local HF path."""
    if spec == "hash":
        return HashTokenizer(vocab_size=vocab_size, roberta_style=roberta_style)
    return HFTokenizer(spec)


def load_retriever_params(checkpoint: str, config: EncoderConfig,
                          model=None, unified: bool = False):
    """Load params from either a reference torch .pt or an orbax directory."""
    if checkpoint.endswith(".pt"):
        sd = convert.load_torch_state_dict(checkpoint)
        fn = convert.unified_ckpt_to_flax if unified else convert.retriever_ckpt_to_flax
        return {"params": fn(sd, config)}
    import numpy as np

    from ..core import checkpoint as ckpt

    params = ckpt.restore_pytree(checkpoint)
    # orbax restores the sharding the checkpoint was SAVED with (e.g. a
    # 2-device training mesh); pull to host so the consumer's jit can place
    # the params on whatever mesh it runs on
    return jax.tree_util.tree_map(np.asarray, params)


def init_retriever(config: EncoderConfig, *, unified: bool = False,
                   checkpoint: str = "", seed: int = 0, remat: bool = False):
    # cls_only: the last encoder layer computes the CLS position only —
    # bit-identical vectors (test_encoder.py::test_cls_only_last_layer...)
    # with ~1/num_layers fewer FLOPs; valid for training too (the loss only
    # consumes CLS, so gradients are unchanged).
    # remat: per-layer rematerialization (jax.checkpoint) — required to
    # train production batch sizes (activation memory + XLA program size).
    params = None
    if unified:
        kw = {}
        if checkpoint.endswith(".pt"):
            # reference checkpoints decide the head layout (convert.py::
            # unified_ckpt_to_flax: project only for roberta names, stop
            # head on the tanh pooler)
            params = load_retriever_params(checkpoint, config, unified=True)
            kw = dict(use_projection="project" in params["params"],
                      stop_on_pooled="pooler" in params["params"])
        model = UnifiedRetriever(config, **kw)
    else:
        model = MhopRetriever(config, cls_only=True, remat=remat)
    if checkpoint:
        if params is None:
            params = load_retriever_params(checkpoint, config,
                                           unified=unified)
    else:
        ids = jnp.ones((1, 8), jnp.int32)
        if unified:
            batch = {k: ids for k in
                     ["q_input_ids", "q_mask", "q_sp_input_ids", "q_sp_mask",
                      "c1_input_ids", "c1_mask", "c2_input_ids", "c2_mask",
                      "neg1_input_ids", "neg1_mask", "neg2_input_ids",
                      "neg2_mask"]}
            params = model.init(jax.random.PRNGKey(seed), batch)
        else:
            params = model.init(jax.random.PRNGKey(seed), ids, ids,
                                method=model.encode_seq)
    return model, params
