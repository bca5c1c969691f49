"""Bi-encoder retriever models.

Re-designs of the reference model zoo (mdr/retrieval/models/):

  * `MhopRetriever`   — the production multi-hop shared encoder + projection
                        head (mhop_retriever.py:12-41)
  * `SingleRetriever` — single-hop bi-encoder (retriever.py:43-68); with
                        `shared=False` it keeps separate q/ctx towers
                        (retriever.py:14-41)
  * `CtxEncoder`      — corpus encoder view reusing the same weights
                        (retriever.py:176-190); in JAX this is just
                        `encode_seq`, no separate module needed — provided
                        for API parity
  * `UnifiedRetriever` — variable-hop retriever with a stop head
                        (unified_retriever.py:10-56)

The momentum/memory-bank variant (mhop_retriever.py:45-129) is functional
state, not a module — see train/momentum.py: two param trees + a queue array
in the train state.

All encode paths return fp32 vectors; inner products / losses run in fp32
while the transformer body runs in bf16.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import EncoderConfig
from .encoder import TransformerEncoder


class ProjectionHead(nn.Module):
    """Linear(h,h) + LayerNorm over the CLS token (mhop_retriever.py:21)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, cls_rep):
        c = self.config
        x = nn.Dense(c.hidden_size, name="dense", dtype=jnp.float32)(
            cls_rep.astype(jnp.float32)
        )
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm",
                            dtype=jnp.float32)(x)


class MhopRetriever(nn.Module):
    """Shared encoder for queries, query⊕passage reformulations and passages.

    `__call__` encodes the six training views of a batch
    (mhop_retriever.py:28-38); `encode_seq` is the single entry point used by
    corpus encoding and search.
    """

    config: EncoderConfig
    # cls_only: final encoder layer computes position 0 only — bit-identical
    # CLS vector, ~1/num_layers fewer FLOPs (see encoder.TransformerEncoder)
    cls_only: bool = False
    # remat: rematerialize each encoder layer in the backward pass
    # (jax.checkpoint) — trades ~33% more FLOPs for O(num_layers) less
    # activation memory AND a much smaller XLA program, which is what lets
    # production-size training batches compile on this environment's remote
    # compiler (B=16 full-budget compiles without it; B>=32 needs it)
    remat: bool = False

    def setup(self):
        self.encoder = TransformerEncoder(self.config, name="encoder",
                                          cls_only=self.cls_only,
                                          remat=self.remat)
        self.project = ProjectionHead(self.config, name="project")

    def encode_seq(self, input_ids, mask, token_type_ids=None):
        hidden = self.encoder(input_ids, mask, token_type_ids)
        return self.project(hidden[:, 0, :])

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return {
            "q": self.encode_seq(batch["q_input_ids"], batch["q_mask"],
                                 batch.get("q_type_ids")),
            "q_sp1": self.encode_seq(batch["q_sp_input_ids"], batch["q_sp_mask"],
                                     batch.get("q_sp_type_ids")),
            "c1": self.encode_seq(batch["c1_input_ids"], batch["c1_mask"],
                                  batch.get("c1_type_ids")),
            "c2": self.encode_seq(batch["c2_input_ids"], batch["c2_mask"],
                                  batch.get("c2_type_ids")),
            "neg_1": self.encode_seq(batch["neg1_input_ids"], batch["neg1_mask"],
                                     batch.get("neg1_type_ids")),
            "neg_2": self.encode_seq(batch["neg2_input_ids"], batch["neg2_mask"],
                                     batch.get("neg2_type_ids")),
        }

    # API parity with the reference's encode_q/encode_qsp entry points.
    def encode_q(self, input_ids, mask, token_type_ids=None):
        return self.encode_seq(input_ids, mask, token_type_ids)


class SingleRetriever(nn.Module):
    """Single-hop DPR-style bi-encoder (retriever.py:14-68).

    shared=True  → one tower (RobertaRetrieverSingle)
    shared=False → separate q and ctx towers (BertRetrieverSingle)
    """

    config: EncoderConfig
    shared: bool = True

    def setup(self):
        self.encoder = TransformerEncoder(self.config, name="encoder")
        self.project = ProjectionHead(self.config, name="project")
        if not self.shared:
            self.encoder_q = TransformerEncoder(self.config, name="encoder_q")
            self.project_q = ProjectionHead(self.config, name="project_q")

    def encode_ctx(self, input_ids, mask, token_type_ids=None):
        hidden = self.encoder(input_ids, mask, token_type_ids)
        return self.project(hidden[:, 0, :])

    def encode_q(self, input_ids, mask, token_type_ids=None):
        if self.shared:
            return self.encode_ctx(input_ids, mask, token_type_ids)
        hidden = self.encoder_q(input_ids, mask, token_type_ids)
        return self.project_q(hidden[:, 0, :])

    def __call__(self, batch):
        return {
            "q": self.encode_q(batch["q_input_ids"], batch["q_mask"],
                               batch.get("q_type_ids")),
            "c": self.encode_ctx(batch["c_input_ids"], batch["c_mask"],
                                 batch.get("c_type_ids")),
            "neg": self.encode_ctx(batch["neg_input_ids"], batch["neg_mask"],
                                   batch.get("neg_type_ids")),
        }


class UnifiedRetriever(nn.Module):
    """Variable-hop retriever: MhopRetriever + a stop classifier over the
    pooled q⊕sp representation deciding whether a second hop is needed
    (unified_retriever.py:23,34-52).

    Defaults are the from-scratch redesign (projection head for vectors,
    stop head on raw CLS).  The two flags exist to ingest REAL reference
    checkpoints (models/convert.py::unified_ckpt_to_flax picks them from
    the state dict): the reference creates `project` only for roberta
    model names (unified_retriever.py:18-22) and ALWAYS feeds the stop
    head from the HF tanh pooler output, not CLS (unified_retriever.py:43
    `self.encoder_c(...)[1]`).
    """

    config: EncoderConfig
    use_projection: bool = True
    stop_on_pooled: bool = False

    def setup(self):
        self.encoder = TransformerEncoder(self.config, name="encoder")
        if self.use_projection:
            self.project = ProjectionHead(self.config, name="project")
        self.stop_head = nn.Dense(2, name="stop_head", dtype=jnp.float32)
        if self.stop_on_pooled:
            self.pooler = nn.Dense(self.config.hidden_size, name="pooler",
                                   dtype=jnp.float32)

    def _vec(self, cls):
        return self.project(cls) if self.use_projection else cls

    def encode_seq(self, input_ids, mask, token_type_ids=None):
        hidden = self.encoder(input_ids, mask, token_type_ids)
        return self._vec(hidden[:, 0, :])

    def encode_qsp(self, input_ids, mask, token_type_ids=None):
        """Returns (vector, stop_logits) for a reformulated query."""
        hidden = self.encoder(input_ids, mask, token_type_ids)
        cls = hidden[:, 0, :]
        stop_in = cls.astype(jnp.float32)
        if self.stop_on_pooled:
            stop_in = jnp.tanh(self.pooler(stop_in))
        return self._vec(cls), self.stop_head(stop_in)

    def __call__(self, batch):
        q_sp1, stop_logits = self.encode_qsp(
            batch["q_sp_input_ids"], batch["q_sp_mask"], batch.get("q_sp_type_ids"))
        return {
            "q": self.encode_seq(batch["q_input_ids"], batch["q_mask"],
                                 batch.get("q_type_ids")),
            "q_sp1": q_sp1,
            "stop_logits": stop_logits,
            "c1": self.encode_seq(batch["c1_input_ids"], batch["c1_mask"],
                                  batch.get("c1_type_ids")),
            "c2": self.encode_seq(batch["c2_input_ids"], batch["c2_mask"],
                                  batch.get("c2_type_ids")),
            "neg_1": self.encode_seq(batch["neg1_input_ids"], batch["neg1_mask"],
                                     batch.get("neg1_type_ids")),
            "neg_2": self.encode_seq(batch["neg2_input_ids"], batch["neg2_mask"],
                                     batch.get("neg2_type_ids")),
        }

    def encode_q(self, input_ids, mask, token_type_ids=None):
        return self.encode_seq(input_ids, mask, token_type_ids)


class NQRetriever(nn.Module):
    """NQ/WebQ single-hop retriever with the error-recovery view
    (unified_retriever.py:59-111): `q_neg1` re-encodes question ⊕ a wrongly
    retrieved passage as a second-chance query.

    NOTE: the reference's RobertaNQRetriever constructs a projection head but
    returns the raw CLS (unified_retriever.py:70-73) — `use_projection=False`
    reproduces that; True applies the head.
    """

    config: EncoderConfig
    use_projection: bool = False

    def setup(self):
        self.encoder = TransformerEncoder(self.config, name="encoder")
        self.project = ProjectionHead(self.config, name="project")

    def encode_seq(self, input_ids, mask, token_type_ids=None):
        cls = self.encoder(input_ids, mask, token_type_ids)[:, 0, :]
        if self.use_projection:
            return self.project(cls)
        return cls.astype(jnp.float32)

    def __call__(self, batch):
        out = {
            "q": self.encode_seq(batch["q_input_ids"], batch["q_mask"],
                                 batch.get("q_type_ids")),
            "c": self.encode_seq(batch["c_input_ids"], batch["c_mask"],
                                 batch.get("c_type_ids")),
            "neg": self.encode_seq(batch["neg_input_ids"], batch["neg_mask"],
                                   batch.get("neg_type_ids")),
            "q_neg1": self.encode_seq(batch["q_neg1_input_ids"],
                                      batch["q_neg1_mask"],
                                      batch.get("q_neg1_type_ids")),
        }
        # optional extra dense negatives (BertNQRetriever,
        # unified_retriever.py:100-106)
        if "dense_neg1_input_ids" in batch:
            out["dense_neg1"] = self.encode_seq(
                batch["dense_neg1_input_ids"], batch["dense_neg1_mask"],
                batch.get("dense_neg1_type_ids"))
            out["dense_neg2"] = self.encode_seq(
                batch["dense_neg2_input_ids"], batch["dense_neg2_mask"],
                batch.get("dense_neg2_type_ids"))
        return out

    def encode_q(self, input_ids, mask, token_type_ids=None):
        return self.encode_seq(input_ids, mask, token_type_ids)


class MultiVectorCtxEncoder(nn.Module):
    """Multi-vector corpus encoder (reference models/retriever.py:147-174):

    scheme="layerwise" — CLS of the last `multi_vector` layers
    scheme="tokenwise" — first `multi_vector` token reps of the last layer
    multi_vector=1     — plain CLS
    Returns (B * multi_vector, H) fp32, rows grouped per passage.

    project=True (default) runs every vector through the retriever's
    ProjectionHead so corpus rows live in the SAME embedding space as the
    projected query vectors (MhopRetriever.encode_seq) they are scored
    against.  project=False matches the reference's raw-hidden-state
    CtxEncoder, which it only ever pairs with unprojected query encoders.
    """

    config: EncoderConfig
    multi_vector: int = 1
    scheme: str = "tokenwise"
    project: bool = True

    def setup(self):
        self.encoder = TransformerEncoder(
            self.config, name="encoder",
            return_all_hiddens=(self.scheme == "layerwise"))
        if self.project:
            self.proj = ProjectionHead(self.config, name="project")

    def _head(self, x):
        return self.proj(x) if self.project else x.astype(jnp.float32)

    def __call__(self, input_ids, mask, token_type_ids=None):
        out = self.encoder(input_ids, mask, token_type_ids)
        if self.multi_vector <= 1:
            h = out[-1] if isinstance(out, list) else out
            return self._head(h[:, 0, :]).astype(jnp.float32)
        if self.scheme == "layerwise":
            cls = jnp.stack([h[:, 0, :] for h in out[::-1][: self.multi_vector]],
                            axis=1)
        elif self.scheme == "tokenwise":
            cls = out[:, : self.multi_vector, :]
        else:
            raise ValueError(f"unknown scheme {self.scheme}")
        if cls.shape[1] != self.multi_vector:
            # silently emitting fewer rows would corrupt the doc = row //
            # multi_vector layout every consumer relies on (index/build.py,
            # ops/mips.py::merge_multivector)
            raise ValueError(
                f"{self.scheme} multi_vector={self.multi_vector} needs "
                f">= {self.multi_vector} "
                f"{'encoder layers' if self.scheme == 'layerwise' else 'sequence positions'}"
                f", got {cls.shape[1]}")
        flat = cls.reshape(-1, cls.shape[-1])
        return self._head(flat).astype(jnp.float32)


# Corpus encoding reuses MhopRetriever.encode_seq with the same checkpoint
# (reference loads the retriever ckpt into RobertaCtxEncoder with exact=False,
# scripts/encode_corpus.py:74).  Alias for API parity:
CtxEncoder = MhopRetriever
