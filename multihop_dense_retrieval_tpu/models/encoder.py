"""BERT-family transformer encoder in Flax, TPU-first.

One module covers all three backbones the reference uses through HF
`AutoModel.from_pretrained` (mdr/retrieval/models/mhop_retriever.py:20,
mdr/retrieval/models/retriever.py:20-25, mdr/qa/qa_model.py:37):

  * roberta-base   — retriever backbone (RoBERTa position-id scheme)
  * bert-base      — single-hop retriever variants
  * electra-large  — QA reader backbone (no pooler; the reader adds its own)

TPU-first choices:
  * activations in bf16 (MXU native), params fp32, softmax/layernorm
    statistics in fp32 — replaces the reference's apex amp O1
    (scripts/train_mhop.py:135-138) with a principled mixed-precision policy;
  * static shapes everywhere: inputs are padded to fixed lengths host-side so
    a single jit trace serves the whole run;
  * attention as two einsums feeding the MXU; XLA fuses bias+mask+softmax.

Weight layout intentionally mirrors HF naming closely enough that
`models/convert.py` can map released torch checkpoints 1:1.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderConfig

NEG_INF = -1e9  # bf16-safe large negative for masking


def _gelu_exact(x):
    """Exact (erf) gelu, computed in fp32 with a single downcast.

    HF BERT/RoBERTa use erf gelu.  MEASURED (v5e, 12x FFN at B*W=36.9k,
    F=3072): `nn.gelu(approximate=False)` on bf16 costs 13.3 ms/encode —
    XLA's bf16 erf path round-trips precision op-by-op — while this
    upcast-once formula costs 2.8 ms for the SAME function with strictly
    fewer bf16 roundings (one, at the end).  No-op for fp32 inputs.
    """
    xf = x.astype(jnp.float32)
    out = xf * 0.5 * (1.0 + jax.lax.erf(xf * 0.7071067811865476))
    return out.astype(x.dtype)


def _act(name: str):
    if name == "gelu":
        return _gelu_exact
    if name == "gelu_new":
        return lambda x: nn.gelu(x, approximate=True)
    if name == "relu":
        return nn.relu
    raise ValueError(f"unknown activation {name}")


def roberta_position_ids(input_ids: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """RoBERTa position ids: pad positions get pad_id, others pad_id+cumsum.

    Matches fairseq/HF `create_position_ids_from_input_ids` semantics that the
    released roberta-base checkpoint was trained with (hence
    max_position_embeddings=514 for seq len 512).
    """
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


class Embeddings(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids, deterministic=True):
        c = self.config
        emb_size = c.embedding_size or c.hidden_size
        word = nn.Embed(c.vocab_size, emb_size, name="word_embeddings",
                        dtype=c.compute_dtype)(input_ids)
        pos = nn.Embed(c.max_position_embeddings, emb_size,
                       name="position_embeddings", dtype=c.compute_dtype)(position_ids)
        typ = nn.Embed(c.type_vocab_size, emb_size, name="token_type_embeddings",
                       dtype=c.compute_dtype)(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm",
                         dtype=jnp.float32)(x).astype(c.compute_dtype)
        if c.embedding_size is not None and c.embedding_size != c.hidden_size:
            x = nn.Dense(c.hidden_size, name="embeddings_project",
                         dtype=c.compute_dtype)(x)
        return x


class SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x, attn_bias, attention_mask=None, q_positions=None):
        c = self.config
        h, d = c.num_heads, c.head_dim
        dt = c.compute_dtype
        x_q = x if q_positions is None else x[:, :q_positions]
        q = nn.DenseGeneral((h, d), name="query", dtype=dt)(x_q)
        k = nn.DenseGeneral((h, d), name="key", dtype=dt)(x)
        v = nn.DenseGeneral((h, d), name="value", dtype=dt)(x)
        L = x.shape[1]
        use_flash = (c.attention_impl == "flash" and L % 128 == 0
                     and q_positions is None
                     and attention_mask is not None
                     and jax.default_backend() == "tpu")
        if c.attention_impl == "fused" and attention_mask is not None:
            # fused short-sequence attention (ops/fused_attention.py): heads
            # stay lane slices of the (B, L, H) projection layout, the
            # (Lq, L) score matrix never leaves VMEM.  Interpret mode keeps
            # the same code path testable off-TPU.
            from ..ops.fused_attention import fused_attention

            B_ = x.shape[0]
            Lq = q.shape[1]
            out = fused_attention(
                q.reshape(B_, Lq, h * d), k.reshape(B_, L, h * d),
                v.reshape(B_, L, h * d), attention_mask, h,
                interpret=jax.default_backend() != "tpu")
            out = out.reshape(B_, Lq, h, d)
        elif use_flash:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

            seg = attention_mask.astype(jnp.int32)
            out = fa.flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=fa.SegmentIds(seg, seg),
                sm_scale=1.0 / float(np.sqrt(d)))
            out = out.transpose(0, 2, 1, 3)  # back to (B, L, H, D)
        elif c.attention_scores_dtype == "bfloat16":
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(dt)
            probs = jax.nn.softmax(scores + attn_bias.astype(dt), axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(dt)
            scores = scores.astype(jnp.float32) + attn_bias  # (B,1,1,L) fp32
            probs = jax.nn.softmax(scores, axis=-1).astype(dt)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(c.hidden_size, axis=(-2, -1), name="out", dtype=dt)(out)
        return out


class EncoderLayer(nn.Module):
    config: EncoderConfig
    # compute only the first `q_positions` output positions (None = all).
    # Used for the retriever's LAST layer: only the CLS vector is consumed,
    # so attention queries and the FFN run for position 0 alone — the result
    # is bit-identical to the full layer's position 0 and skips ~1/num_layers
    # of the encode FLOPs.
    q_positions: Optional[int] = None

    @nn.compact
    def __call__(self, x, attn_bias, attention_mask=None):
        c = self.config
        dt = c.compute_dtype
        qp = self.q_positions
        if qp is None:
            attn_out = SelfAttention(c, name="attention")(x, attn_bias,
                                                          attention_mask)
            res = x
        else:
            attn_out = SelfAttention(c, name="attention")(
                x, attn_bias, attention_mask, q_positions=qp)
            res = x[:, :qp]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_layer_norm",
                         dtype=jnp.float32)(res + attn_out).astype(dt)
        inter = nn.Dense(c.intermediate_size, name="intermediate", dtype=dt)(x)
        inter = _act(c.hidden_act)(inter)
        out = nn.Dense(c.hidden_size, name="output", dtype=dt)(inter)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_layer_norm",
                         dtype=jnp.float32)(x + out).astype(dt)
        return x


class TransformerEncoder(nn.Module):
    """Returns the last hidden state (B, L, H) in the compute dtype.

    With return_all_hiddens=True returns a list of per-layer hidden states
    (embeddings output first) — used by the layerwise multi-vector corpus
    encoder (reference models/retriever.py:156-167).
    """

    config: EncoderConfig
    remat: bool = False
    return_all_hiddens: bool = False
    # cls_only=True: the final layer computes position 0 only (bit-identical
    # CLS, ~1/num_layers fewer FLOPs) and the output is (B, 1, H).  Use for
    # bi-encoder inference; NOT for the reader (needs all positions) or
    # training (params would still get full grads, but keep it simple).
    cls_only: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        c = self.config
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), dtype=jnp.int32)
        if c.roberta_positions:
            position_ids = roberta_position_ids(input_ids, c.pad_token_id)
        else:
            position_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
        x = Embeddings(c, name="embeddings")(input_ids, token_type_ids, position_ids)
        attn_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
        ).astype(jnp.float32)
        layer_cls = nn.remat(EncoderLayer) if self.remat else EncoderLayer
        hiddens = [x]
        for i in range(c.num_layers):
            last = i == c.num_layers - 1
            qp = 1 if (self.cls_only and last and not self.return_all_hiddens) \
                else None
            x = layer_cls(c, name=f"layer_{i}", q_positions=qp)(
                x, attn_bias, attention_mask)
            hiddens.append(x)
        if self.return_all_hiddens:
            return hiddens
        return x
