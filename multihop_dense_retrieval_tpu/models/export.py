"""Export Flax params back to reference-layout torch state dicts.

Inverse of convert.py: users who train on TPU here can hand checkpoints
back to the reference's torch stack.  The reference loads with a STRICT
``model.load_state_dict`` (``load_saved``, mdr/retrieval/utils/utils.py:10-22),
so each exporter emits the exact key set the corresponding reference module
owns under transformers==2.11.0 (requirements.txt:1 — that era has no
``embeddings.position_ids`` buffers in state dicts):

  * ``retriever_flax_to_ckpt``  → RobertaRetriever / RobertaRetrieverSingle
    (mhop_retriever.py:20-21, retriever.py:43-58): ``encoder.*`` +
    ``project.0/project.1``.  RobertaModel owns a tanh pooler the retriever
    never consumes (``encode_seq`` reads ``[0][:, 0, :]``); our Flax tree has
    no such slot, so zeros are synthesized to satisfy the strict load.
  * ``unified_flax_to_ckpt``    → UnifiedRetriever (unified_retriever.py:17-23):
    transformer under ``encoder_c.``, ``stop`` head, ``project`` only when
    the Flax tree has one (reference: roberta model names only).
  * ``reader_flax_to_ckpt``     → QAModel (qa_model.py:37-46): ELECTRA has no
    HF pooler so the reference adds its own BertPooler at top-level
    ``pooler.dense``; BERT readers reuse the HF pooler at
    ``encoder.pooler.dense`` (qa_model.py:53-57).

Everything operates on {name: np.ndarray} dicts; torch is only needed at the
saving boundary (`save_torch_state_dict`).  Round-trips through convert.py
are bit-exact (tests/test_export.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def _np(x) -> Array:
    return np.asarray(x)


def _dense_inv(out: StateDict, name: str, p: Dict) -> None:
    # flax Dense kernel is (in, out); torch Linear stores weight (out, in)
    out[f"{name}.weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    out[f"{name}.bias"] = _np(p["bias"])


def _layer_norm_inv(out: StateDict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])


def _qkv_inv(out: StateDict, name: str, p: Dict) -> None:
    k = _np(p["kernel"])                      # (in, heads, head_dim)
    out[f"{name}.weight"] = np.ascontiguousarray(
        k.reshape(k.shape[0], -1).T)
    out[f"{name}.bias"] = _np(p["bias"]).reshape(-1)


def _attn_out_inv(out: StateDict, name: str, p: Dict) -> None:
    k = _np(p["kernel"])                      # (heads, head_dim, out)
    out[f"{name}.weight"] = np.ascontiguousarray(
        k.reshape(-1, k.shape[-1]).T)
    out[f"{name}.bias"] = _np(p["bias"])


def _num_layers(enc: Dict) -> int:
    n = 0
    while f"layer_{n}" in enc:
        n += 1
    return n


def _hidden_size(enc: Dict) -> int:
    return int(_np(enc["layer_0"]["output"]["kernel"]).shape[-1])


def flax_encoder_to_hf(enc: Dict, prefix: str = "") -> StateDict:
    """TransformerEncoder params → HF BERT/RoBERTa/ELECTRA `*Model` names
    (inverse of convert.hf_encoder_to_flax; same optional
    ``embeddings_project`` handling for ELECTRA-small/base)."""
    p = prefix
    out: StateDict = {}
    emb = enc["embeddings"]
    out[f"{p}embeddings.word_embeddings.weight"] = _np(
        emb["word_embeddings"]["embedding"])
    out[f"{p}embeddings.position_embeddings.weight"] = _np(
        emb["position_embeddings"]["embedding"])
    out[f"{p}embeddings.token_type_embeddings.weight"] = _np(
        emb["token_type_embeddings"]["embedding"])
    _layer_norm_inv(out, f"{p}embeddings.LayerNorm", emb["layer_norm"])
    if "embeddings_project" in emb:
        _dense_inv(out, f"{p}embeddings_project", emb["embeddings_project"])
    for i in range(_num_layers(enc)):
        lp = f"{p}encoder.layer.{i}."
        layer = enc[f"layer_{i}"]
        attn = layer["attention"]
        _qkv_inv(out, f"{lp}attention.self.query", attn["query"])
        _qkv_inv(out, f"{lp}attention.self.key", attn["key"])
        _qkv_inv(out, f"{lp}attention.self.value", attn["value"])
        _attn_out_inv(out, f"{lp}attention.output.dense", attn["out"])
        _layer_norm_inv(out, f"{lp}attention.output.LayerNorm",
                        layer["attention_layer_norm"])
        _dense_inv(out, f"{lp}intermediate.dense", layer["intermediate"])
        _dense_inv(out, f"{lp}output.dense", layer["output"])
        _layer_norm_inv(out, f"{lp}output.LayerNorm",
                        layer["output_layer_norm"])
    return out


def _synth_pooler(out: StateDict, name: str, hidden: int) -> None:
    # the HF pooler exists in the reference module but its output is never
    # consumed by retrievers (encode_seq reads raw CLS) — zeros satisfy the
    # strict load without inventing weights that look trained
    out[f"{name}.weight"] = np.zeros((hidden, hidden), np.float32)
    out[f"{name}.bias"] = np.zeros((hidden,), np.float32)


def _project_inv(out: StateDict, proj: Dict) -> None:
    # nn.Sequential(Linear, LayerNorm) → project.0 / project.1
    # (mhop_retriever.py:21)
    _dense_inv(out, "project.0", proj["dense"])
    _layer_norm_inv(out, "project.1", proj["layer_norm"])


def retriever_flax_to_ckpt(params: Dict) -> StateDict:
    """MhopRetriever / shared SingleRetriever params → RobertaRetriever
    state dict (also RobertaRetrieverSingle — identical layout,
    retriever.py:43-58).  Loadable with the reference's strict
    ``load_saved(model, path)``."""
    out = flax_encoder_to_hf(params["encoder"], prefix="encoder.")
    _synth_pooler(out, "encoder.pooler.dense",
                  _hidden_size(params["encoder"]))
    _project_inv(out, params["project"])
    return out


def unified_flax_to_ckpt(params: Dict) -> StateDict:
    """UnifiedRetriever params → reference state dict under ``encoder_c.``
    (unified_retriever.py:17-23).  ``project`` is emitted only when present
    (reference constructs it for roberta model names only).

    Unlike the retriever pooler (never consumed there), the reference
    ALWAYS feeds its stop head from the tanh pooler (unified_retriever.py:
    43-44) — a tree trained with our from-scratch default
    (``stop_on_pooled=False``, stop head on raw CLS) has no pooler weights
    and CANNOT be expressed in the reference layout: synthesizing zeros
    would strict-load fine but emit constant stop logits.  Refuse instead;
    train with ``stop_on_pooled=True`` for reference-exportable models."""
    if "pooler" not in params:
        raise ValueError(
            "this UnifiedRetriever was trained with stop_on_pooled=False "
            "(stop head reads raw CLS); the reference's stop head always "
            "reads the tanh pooler, so an exported checkpoint would load "
            "but produce constant stop logits.  Re-train with "
            "stop_on_pooled=True to export for the reference stack.")
    out = flax_encoder_to_hf(params["encoder"], prefix="encoder_c.")
    _dense_inv(out, "encoder_c.pooler.dense", params["pooler"])
    _dense_inv(out, "stop", params["stop_head"])
    if "project" in params:
        _project_inv(out, params["project"])
    return out


def reader_flax_to_ckpt(params: Dict, electra: bool = True) -> StateDict:
    """QAReader params → QAModel state dict (qa_model.py:37-46).

    electra=True: the reference adds its own BertPooler at top-level
    ``pooler.dense`` and ElectraModel has no HF pooler.  electra=False
    (BERT readers): the Flax pooler maps to the HF pooler at
    ``encoder.pooler.dense`` and there is no top-level pooler key."""
    out = flax_encoder_to_hf(params["encoder"], prefix="encoder.")
    pooler_key = "pooler.dense" if electra else "encoder.pooler.dense"
    _dense_inv(out, pooler_key, params["pooler"])
    _dense_inv(out, "qa_outputs", params["qa_outputs"])
    _dense_inv(out, "rank", params["rank"])
    if "sp" in params:
        _dense_inv(out, "sp", params["sp"])
    return out


def save_torch_state_dict(sd: StateDict, path: str) -> None:
    """Write a {name: np.ndarray} dict as a torch .pt state dict.

    bf16 trees are upcast to fp32 first (torch.from_numpy cannot see
    ml_dtypes; reference checkpoints are fp32 anyway)."""
    import torch  # lazy: host-side only

    tensors = {}
    for k, v in sd.items():
        a = np.asarray(v)
        if a.dtype not in (np.float32, np.float64, np.int64, np.int32):
            a = a.astype(np.float32)
        tensors[k] = torch.from_numpy(np.ascontiguousarray(a))
    torch.save(tensors, path)
