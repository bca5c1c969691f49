"""Convert released torch checkpoints to this framework's Flax params.

The reference ships `q_encoder.pt` / `doc_encoder.pt` (state dicts of
RobertaRetriever: HF RoBERTa under the `encoder.` prefix plus a
`project.0/project.1` Sequential head, mhop_retriever.py:20-21) and
`qa_electra.pt` (QAModel: ELECTRA under `encoder.` plus pooler/qa_outputs/
rank/sp heads, qa_model.py:37-46), saved via torch.save(state_dict) with an
optional DataParallel `module.` prefix (utils/utils.py:10-22).

Everything here operates on {name: np.ndarray} dicts so torch is only needed
at the loading boundary (`load_torch_state_dict`).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.config import EncoderConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    """Load a torch .pt state dict into numpy, stripping `module.` prefixes."""
    import torch  # lazy: host-side only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _dense(sd: StateDict, name: str) -> Dict[str, Array]:
    # torch Linear stores weight (out, in); flax Dense kernel is (in, out)
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": sd[f"{name}.bias"]}


def _layer_norm(sd: StateDict, name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _qkv(sd: StateDict, name: str, heads: int, head_dim: int) -> Dict[str, Array]:
    w = sd[f"{name}.weight"]  # (out=h, in=h)
    b = sd[f"{name}.bias"]
    kernel = np.ascontiguousarray(w.T).reshape(w.shape[1], heads, head_dim)
    return {"kernel": kernel, "bias": b.reshape(heads, head_dim)}


def _attn_out(sd: StateDict, name: str, heads: int, head_dim: int) -> Dict[str, Array]:
    w = sd[f"{name}.weight"]  # (out=h, in=h); input is heads-major concat
    kernel = np.ascontiguousarray(w.T).reshape(heads, head_dim, w.shape[0])
    return {"kernel": kernel, "bias": sd[f"{name}.bias"]}


def hf_encoder_to_flax(sd: StateDict, config: EncoderConfig,
                       prefix: str = "") -> Dict:
    """Map an HF BERT/RoBERTa/ELECTRA `*Model` state dict (optionally under
    `prefix`, e.g. 'encoder.') to TransformerEncoder params."""
    p = prefix
    h, d = config.num_heads, config.head_dim
    emb = {
        "word_embeddings": {"embedding": sd[f"{p}embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd[f"{p}embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd[f"{p}embeddings.token_type_embeddings.weight"]},
        "layer_norm": _layer_norm(sd, f"{p}embeddings.LayerNorm"),
    }
    if f"{p}embeddings_project.weight" in sd:
        emb["embeddings_project"] = _dense(sd, f"{p}embeddings_project")
    params = {"embeddings": emb}
    for i in range(config.num_layers):
        lp = f"{p}encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": _qkv(sd, f"{lp}attention.self.query", h, d),
                "key": _qkv(sd, f"{lp}attention.self.key", h, d),
                "value": _qkv(sd, f"{lp}attention.self.value", h, d),
                "out": _attn_out(sd, f"{lp}attention.output.dense", h, d),
            },
            "attention_layer_norm": _layer_norm(sd, f"{lp}attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{lp}intermediate.dense"),
            "output": _dense(sd, f"{lp}output.dense"),
            "output_layer_norm": _layer_norm(sd, f"{lp}output.LayerNorm"),
        }
    return params


def retriever_ckpt_to_flax(sd: StateDict, config: EncoderConfig) -> Dict:
    """RobertaRetriever state dict → MhopRetriever params.

    The projection head is an nn.Sequential, so its torch names are
    `project.0` (Linear) and `project.1` (LayerNorm) (mhop_retriever.py:21).
    """
    return {
        "encoder": hf_encoder_to_flax(sd, config, prefix="encoder."),
        "project": {
            "dense": _dense(sd, "project.0"),
            "layer_norm": _layer_norm(sd, "project.1"),
        },
    }


def unified_ckpt_to_flax(sd: StateDict, config: EncoderConfig) -> Dict:
    """UnifiedRetriever state dict → flax params.

    The reference module (unified_retriever.py:10-30) stores its
    transformer under `encoder_c.` (NOT `encoder.`), creates the
    `project.0/project.1` Sequential only for roberta model names, and
    feeds the stop head from the HF tanh pooler (`encoder_c.pooler.dense`)
    rather than raw CLS.  Construct the model with
    `use_projection="project" in params, stop_on_pooled="pooler" in
    params` (cli/common.py::init_retriever does this)."""
    prefix = ("encoder_c."
              if "encoder_c.embeddings.word_embeddings.weight" in sd
              else "encoder.")
    params = {
        "encoder": hf_encoder_to_flax(sd, config, prefix=prefix),
        "stop_head": _dense(sd, "stop"),
    }
    if "project.0.weight" in sd:
        params["project"] = {
            "dense": _dense(sd, "project.0"),
            "layer_norm": _layer_norm(sd, "project.1"),
        }
    if f"{prefix}pooler.dense.weight" in sd:
        params["pooler"] = _dense(sd, f"{prefix}pooler.dense")
    return params


def reader_ckpt_to_flax(sd: StateDict, config: EncoderConfig,
                        sp_pred: bool = True) -> Dict:
    """QAModel state dict → ElectraReader params (qa_model.py:37-46)."""
    # electra has no HF pooler, so the reference adds its own BertPooler
    # at top-level `pooler.dense` (qa_model.py:39-41); BERT readers reuse
    # the HF pooler at `encoder.pooler.dense` (qa_model.py:53-57).  Both
    # are dense+tanh, so either maps onto QAReader's pooler slot.
    pooler_key = ("pooler.dense" if "pooler.dense.weight" in sd
                  else "encoder.pooler.dense")
    params = {
        "encoder": hf_encoder_to_flax(sd, config, prefix="encoder."),
        "pooler": _dense(sd, pooler_key),
        "qa_outputs": _dense(sd, "qa_outputs"),
        "rank": _dense(sd, "rank"),
    }
    if sp_pred and "sp.weight" in sd:
        params["sp"] = _dense(sd, "sp")
    return params


def hf_model_to_flax(model, config: EncoderConfig) -> Dict:
    """Convert an in-memory HF torch `*Model` (e.g. freshly random-initialized
    in tests) to TransformerEncoder params."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return hf_encoder_to_flax(sd, config)
