"""Typed configuration for the framework.

The reference uses flat argparse namespaces (mdr/retrieval/config.py:14-112,
mdr/qa/config.py:16-88).  Here configs are frozen dataclasses so they are
hashable (usable as jit static args) and self-documenting.  Defaults mirror
the reference's published HotpotQA settings: q<=70 / q_sp<=350 / c<=300
tokens, reader seq<=512, grad clip 2.0, Adam + linear warmup.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


def _frozen(cls):
    return dataclasses.dataclass(frozen=True)(cls)


@_frozen
class EncoderConfig:
    """Architecture config for the BERT-family transformer encoder.

    Covers RoBERTa (retriever backbone, reference
    mdr/retrieval/models/mhop_retriever.py:20), BERT (single-hop variants,
    models/retriever.py:14) and ELECTRA (reader backbone, mdr/qa/qa_model.py:37).
    """

    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    # RoBERTa computes position ids as pad_id + cumsum(mask); BERT/ELECTRA use
    # plain arange.  `roberta_positions` selects between the two.
    roberta_positions: bool = True
    # ELECTRA-small/base have embedding_size != hidden_size and an extra
    # projection; None means embedding_size == hidden_size.
    embedding_size: Optional[int] = None
    hidden_act: str = "gelu"
    # Compute dtype.  Params are always fp32; activations run in this dtype
    # (bf16 feeds the MXU at full rate; the reference needed apex amp for this).
    dtype: str = "bfloat16"
    # "xla" (default), "fused" (ops/fused_attention.py: whole-sequence
    # pallas kernel, scores never leave VMEM — the fast serving path for
    # MDR shapes, fp32 softmax), or "flash" (stock pallas flash-attention,
    # TPU-only, seq len must divide 128).  MEASURED on v5e at L<=512: XLA
    # beats stock flash (69.7 vs 125.7 ms for a 96x384 encode) — its
    # online-softmax tiling targets long sequences; the short-sequence
    # "fused" kernel removes the score-matrix HBM round-trips instead.
    attention_impl: str = "xla"
    # Attention score accumulation dtype.  "float32" (default) matches the
    # reference's numerics; "bfloat16" halves score-matrix HBM traffic
    # (~8%% faster 12-layer encode at L=352 on v5e) at percent-level logit
    # noise — acceptable for serving, keep f32 for strict parity evals.
    attention_scores_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    # ---- presets -------------------------------------------------------

    @classmethod
    def roberta_base(cls, **kw) -> "EncoderConfig":
        return cls(**kw)

    @classmethod
    def bert_base_uncased(cls, **kw) -> "EncoderConfig":
        d = dict(
            vocab_size=30522,
            max_position_embeddings=512,
            type_vocab_size=2,
            layer_norm_eps=1e-12,
            pad_token_id=0,
            roberta_positions=False,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def electra_large(cls, **kw) -> "EncoderConfig":
        d = dict(
            vocab_size=30522,
            hidden_size=1024,
            num_layers=24,
            num_heads=16,
            intermediate_size=4096,
            max_position_embeddings=512,
            type_vocab_size=2,
            layer_norm_eps=1e-12,
            pad_token_id=0,
            roberta_positions=False,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def tiny(cls, **kw) -> "EncoderConfig":
        """A minuscule config for unit tests (CPU-fast, same code paths)."""
        d = dict(
            vocab_size=128,
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            max_position_embeddings=68,
            dtype="float32",
        )
        d.update(kw)
        return cls(**d)


@_frozen
class RetrieverTrainConfig:
    """Hyperparameters for contrastive retriever training.

    Mirrors the reference trainer flags (scripts/train_mhop.py:125-190,
    mdr/retrieval/config.py).
    """

    batch_size: int = 150
    eval_batch_size: int = 256
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.1
    max_grad_norm: float = 2.0
    num_epochs: int = 50
    gradient_accumulation: int = 1
    seed: int = 3
    max_q_len: int = 70
    max_q_sp_len: int = 350
    max_c_len: int = 300
    # momentum / memory-bank stage (scripts/train_momentum.py)
    momentum: bool = False
    queue_size: int = 76800
    momentum_m: float = 0.999
    # unified variable-hop stage
    unified: bool = False
    temperature: float = 1.0


@_frozen
class SearchConfig:
    """2-hop beam search settings (scripts/eval/eval_mhop_retrieval.py:55-70)."""

    beam_size_1: int = 5
    beam_size_2: int = 5
    topk: int = 2
    max_q_len: int = 70
    max_q_sp_len: int = 350
    batch_size: int = 100
    # chunk rows per MIPS tile step (per shard)
    chunk_rows: int = 131072
    use_pallas: bool = True
    # Length-adaptive hop-2 encoding (serving optimization, exact results).
    # Non-empty: hop-2 rows are sorted by assembled length and split into
    # len(hop2_buckets) equal tiles; tile i is encoded at width
    # hop2_buckets[i] when every row fits (lax.cond, no host sync), else at
    # max_q_sp_len.  Wiki abstracts average ~100 tokens vs the 350-token
    # static pad, so most tiles take the narrow branch.  () disables.
    hop2_buckets: tuple = ()
    # Optional per-tile row fractions (same length as hop2_buckets, summing
    # to 1).  Uneven tiles let the expensive wide buckets stay SMALL — e.g.
    # (0.25, 0.25, 0.25, 0.125, 0.125) puts only 1/8 of rows in the full-
    # width fallback tile.  () = equal tiles.
    # Tuning guidance (measured on v5e, B=192, wiki-like lengths, vs the
    # 2680 q/s {128,160,192,256,350}@{.25,.25,.25,.125,.125} default):
    #   * widths MUST be multiples of 32 — {112,144,176,224,350} (same tile
    #     structure, 8% fewer tokens) ran 31% SLOWER (1853 q/s): odd
    #     16-multiples hit bad XLA attention tilings;
    #   * prefer FEW, LARGE tiles — a 6-tile {112,...,350} split with
    #     12-36-row tiles ran 23% slower (2064 q/s): per-tile fixed costs
    #     beat the token savings.
    hop2_tile_fracs: tuple = ()
    # Round the hop-1 question width up to this multiple of the batch max
    # (host-side slice; a few cached traces).  0 disables (fixed max_q_len).
    q_width_multiple: int = 0
    # Adaptive hop-2 candidate pruning (approximate; 0 disables).  A hop-1
    # candidate is re-encoded only while its score is within this margin of
    # its question's top-1 (inner-product units); pruned rows sort to the
    # tail tiles of the bucketed hop-2 encode, and fully-pruned tiles skip
    # the encoder via lax.cond (the only static-shape way to actually save
    # the FLOPs).  Pruned candidates' chains score NEG_INF — identical to
    # how empty-doc chains are excluded.  The lever targets the measured
    # beam-4 plateau: hop-2 encode is 75% of time and row COUNT is what
    # tiling cannot reduce (PERF.md).  Quality: margin sweeps on trained
    # weights in scripts_dev/prune_sweep.py.  Negative = AUTO: -q means
    # the q-quantile of the batch's positive hop-1 gaps, derived inside
    # the jitted search (no probe run needed; CLI `--hop2-prune-margin
    # auto` = -0.5, `auto:Q` = -Q).  The 65k-doc trained-weight sweep
    # (docs/prune_sweep_r5.json): the median maximizes throughput (1.72x
    # measured) but flips near-tied chains under crowding; q=0.9 was its
    # quality-neutral point.
    hop2_prune_margin: float = 0.0
    # Device-side variable-hop early stop (UnifiedRetriever serving; 0.0
    # disables).  Requires an engine built with encode_qsp_fn.  The stop
    # head consumes the q⊕p encoding (reference unified_retriever.py:49-53),
    # so the decision is a CASCADE inside the one jitted program: each
    # question's BEST hop-1 pair is encoded first (B rows, full width);
    # questions whose P(stop) reaches this threshold mark their remaining
    # beam1-1 candidate rows inactive, and the main hop-2 encode skips them
    # tile-wise exactly like hop2_prune_margin rows (so the FLOP saving
    # needs hop2_buckets; without buckets results are identical but nothing
    # is skipped).  Stopped questions still emit their top-1 candidate's
    # chains — the host layer (cli/eval_mhop_retrieval --unified
    # --stop-threshold) decides whether to surface the single-passage
    # answer, same as host-side stopping.  The reference trained this head
    # but never served it; this makes it a measured serving capability.
    stop_skip_threshold: float = 0.0
    # PCA-prefiltered MIPS (ops/mips.py::mips_topk_pca): requires an index
    # built with pca_dims (encode_corpus --pca-dims).  Search outputs gain
    # per-query exactness-certificate masks.  Composes with index sharding
    # (per-shard prefilters; certificate = AND over shards).
    use_pca: bool = False
    # chunks rescanned per query per k result-slot (phase 2); higher = more
    # certified queries, more rescan bandwidth
    pca_k_chunks: int = 8
    # Which hops run the prefilter.  "auto" (measured, PERF.md): hop 2
    # always; hop 1 only when hop2_buckets is empty — the scalar-prefetch
    # rescan UPSTREAM of the lax.cond bucketed encode regresses the whole
    # pipeline by ~24 ms/batch (92.4 vs 68.5 measured) even though the op
    # itself wins in every isolated harness, while hop-2 pca or bucketless
    # engines win as expected.  "1" / "2" / "12" force a fixed assignment.
    pca_hops: str = "auto"


# Measured hop-2 tiling presets (PERF.md; v5e, 5.2M int8 index, wiki-like
# lengths).  Which split wins depends on the hop-2 ROW COUNT
# (batch_size × beam_size_1): tiles must stay large enough that per-tile
# fixed costs don't eat the padded-token savings.
HOP2_BUCKETS_5TILE = (128, 160, 192, 256, 350)
HOP2_TILE_FRACS_5TILE = (0.25, 0.25, 0.25, 0.125, 0.125)
HOP2_BUCKETS_6TILE = (96, 128, 160, 192, 224, 350)
HOP2_TILE_FRACS_6TILE = (0.125, 0.25, 0.25, 0.125, 0.125, 0.125)


def default_hop2_tiling(n_rows: int, max_width: int = 350):
    """Measured-best length-adaptive hop-2 tiling for a given row count.

    Returns ``(hop2_buckets, hop2_tile_fracs)`` for SearchConfig.  Rules
    (all measured on v5e, beam-4 sweep + beam-1 dead-end table, PERF.md):

    * >=512 rows: the 6-tile split — 920 vs 849 q/s at beam-4 batch-192
      (+8.6%); with 768 rows even the 96-row tiles stay MXU-efficient.
    * 128..511 rows: the 5-tile split — +20% at beam-1 batch-192; the
      6-tile split LOSES 23% there (per-tile fixed costs).
    * <128 rows: no tiling — the smallest tile would drop below ~16 rows
      (8-row tiles at 40 rows regressed, bench.py e2e phase note).

    For a non-default ``max_width`` the preset is clipped: buckets >=
    max_width are dropped and their row fractions merge into a final
    max_width tile.  Results are EXACT either way (lax.cond falls back to
    the full width whenever a tile's longest row exceeds its bucket).
    """
    if n_rows >= 512:
        b, f = HOP2_BUCKETS_6TILE, HOP2_TILE_FRACS_6TILE
    elif n_rows >= 128:
        b, f = HOP2_BUCKETS_5TILE, HOP2_TILE_FRACS_5TILE
    else:
        return (), ()
    if max_width != 350:
        k = sum(1 for w in b if w < max_width)
        if k < 2:
            return (), ()
        if k == len(b):            # wider pad: the full tile widens with it
            return b[:-1] + (max_width,), f
        b = tuple(b[:k]) + (max_width,)
        f = tuple(f[:k]) + (round(1.0 - sum(f[:k]), 6),)
    return b, f


@_frozen
class ReaderConfig:
    """QA reader settings (mdr/qa/config.py, scripts/train_qa.py)."""

    max_seq_len: int = 512
    max_q_len: int = 64
    max_ans_len: int = 30
    num_answer_spans: int = 10  # padded answer-occurrence slots for marginal loss
    max_sents: int = 40  # padded sentence-marker slots
    sp_weight: float = 0.05
    sp_pred: bool = True
    rank_lambda: float = 0.8  # span/rank combination (train_qa.py eval_final)
    batch_size: int = 8
    learning_rate: float = 5e-5
    num_epochs: int = 5
    warmup_ratio: float = 0.1
    max_grad_norm: float = 2.0
    neg_num: int = 5
    seed: int = 42
