"""Flax → reference-torch checkpoint export (models/export.py).

The reference loads checkpoints with a STRICT load_state_dict
(mdr/retrieval/utils/utils.py:10-22), so these tests pin three properties:
round-trips through convert.py are bit-exact, the exported key set strict-
loads into a real HF torch module, and the torch model then reproduces the
flax model's outputs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.models import convert, export
from multihop_dense_retrieval_tpu.models.retriever import (
    MhopRetriever, UnifiedRetriever)


def _cfg(**kw):
    base = dict(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=40,
                type_vocab_size=1, pad_token_id=1, dtype="float32")
    base.update(kw)
    return EncoderConfig(**base)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {sorted(a)} != {sorted(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}")


def _mhop_params(cfg, seed=0):
    model = MhopRetriever(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), ids, ids,
                      method=model.encode_seq)["params"]


def test_mhop_export_roundtrip_bit_exact():
    cfg = _cfg()
    params = _mhop_params(cfg)
    sd = export.retriever_flax_to_ckpt(params)
    # the synthesized (reference-unused) pooler satisfies the strict load
    assert sd["encoder.pooler.dense.weight"].shape == (32, 32)
    assert not sd["encoder.pooler.dense.weight"].any()
    back = convert.retriever_ckpt_to_flax(sd, cfg)
    _tree_equal(params, back)


def test_mhop_export_strict_loads_and_matches_flax():
    """Exported encoder strict-loads into transformers.RobertaModel and the
    torch side reproduces the flax retriever's vectors."""
    torch = pytest.importorskip("torch")
    import transformers

    cfg = _cfg()
    params = _mhop_params(cfg)
    sd = export.retriever_flax_to_ckpt(params)

    hf_cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps)
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=True)
    enc_sd = {k[len("encoder."):]: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in sd.items() if k.startswith("encoder.")}
    hf.load_state_dict(enc_sd, strict=True)          # key-set exactness
    hf.eval()

    lin = torch.nn.Linear(32, 32)
    ln = torch.nn.LayerNorm(32, eps=cfg.layer_norm_eps)
    lin.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in (("weight", sd["project.0.weight"]),
                                      ("bias", sd["project.0.bias"]))})
    ln.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in (("weight", sd["project.1.weight"]),
                                     ("bias", sd["project.1.bias"]))})

    rng = np.random.RandomState(0)
    ids = rng.randint(4, 120, size=(3, 11)).astype(np.int64)
    mask = np.ones((3, 11), np.int64)
    mask[1, 7:] = 0
    ids[1, 7:] = cfg.pad_token_id
    with torch.no_grad():
        h = hf(input_ids=torch.tensor(ids),
               attention_mask=torch.tensor(mask)).last_hidden_state
        expected = ln(lin(h[:, 0])).numpy()
    model = MhopRetriever(cfg)
    vec = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32), method=model.encode_seq)
    np.testing.assert_allclose(np.asarray(vec), expected,
                               atol=1e-4, rtol=1e-4)


def test_unified_export_roundtrip_reference_layout():
    """encoder_c. prefix + stop + project + REAL pooler; re-ingestion must
    auto-detect the layout (convert.unified_ckpt_to_flax:119-132)."""
    cfg = _cfg()
    model = UnifiedRetriever(cfg, use_projection=True, stop_on_pooled=True)
    ids = jnp.ones((1, 8), jnp.int32)
    batch = {k: ids for k in
             ["q_input_ids", "q_mask", "q_sp_input_ids", "q_sp_mask",
              "c1_input_ids", "c1_mask", "c2_input_ids", "c2_mask",
              "neg1_input_ids", "neg1_mask", "neg2_input_ids", "neg2_mask"]}
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    sd = export.unified_flax_to_ckpt(params)
    assert "encoder_c.embeddings.word_embeddings.weight" in sd
    assert "stop.weight" in sd and "project.0.weight" in sd
    back = convert.unified_ckpt_to_flax(sd, cfg)
    _tree_equal(params, back)


def test_unified_export_refuses_stop_on_cls_trees():
    """The reference's stop head ALWAYS reads the tanh pooler
    (unified_retriever.py:43-44); a stop_on_pooled=False tree (our
    from-scratch default) has no pooler, and a zero-synthesized one would
    strict-load fine yet emit constant stop logits — so export must refuse
    loudly rather than produce a silently-broken checkpoint."""
    cfg = _cfg(type_vocab_size=2, pad_token_id=0, roberta_positions=False)
    model = UnifiedRetriever(cfg, use_projection=False, stop_on_pooled=False)
    ids = jnp.ones((1, 8), jnp.int32)
    batch = {k: ids for k in
             ["q_input_ids", "q_mask", "q_sp_input_ids", "q_sp_mask",
              "c1_input_ids", "c1_mask", "c2_input_ids", "c2_mask",
              "neg1_input_ids", "neg1_mask", "neg2_input_ids", "neg2_mask"]}
    params = model.init(jax.random.PRNGKey(2), batch)["params"]
    with pytest.raises(ValueError, match="stop_on_pooled"):
        export.unified_flax_to_ckpt(params)


@pytest.mark.parametrize("electra", [True, False])
def test_reader_export_roundtrip(electra):
    from multihop_dense_retrieval_tpu.models.reader import QAReader

    cfg = _cfg(type_vocab_size=2, pad_token_id=0, roberta_positions=False)
    model = QAReader(cfg, sp_pred=True)
    dummy = {
        "input_ids": jnp.ones((1, 16), jnp.int32),
        "attention_mask": jnp.ones((1, 16), jnp.int32),
        "token_type_ids": jnp.zeros((1, 16), jnp.int32),
        "paragraph_mask": jnp.ones((1, 16), jnp.int32),
        "sent_offsets": jnp.zeros((1, 4), jnp.int32),
        "sent_mask": jnp.ones((1, 4), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(3), dummy)["params"]
    sd = export.reader_flax_to_ckpt(params, electra=electra)
    if electra:
        assert "pooler.dense.weight" in sd           # reference BertPooler
        assert "encoder.pooler.dense.weight" not in sd
    else:
        assert "encoder.pooler.dense.weight" in sd   # HF pooler reused
        assert "pooler.dense.weight" not in sd
    assert "sp.weight" in sd
    back = convert.reader_ckpt_to_flax(sd, cfg, sp_pred=True)
    _tree_equal(params, back)


def test_export_cli_orbax_to_pt(tmp_path):
    pytest.importorskip("torch")
    from multihop_dense_retrieval_tpu.cli import export_ckpt
    from multihop_dense_retrieval_tpu.core import checkpoint as ckpt

    cfg = _cfg()
    params = _mhop_params(cfg, seed=4)
    ckpt_dir = str(tmp_path / "checkpoint_best")
    ckpt.save_pytree(ckpt_dir, {"params": params})
    out = str(tmp_path / "q_encoder.pt")
    export_ckpt.main(["--checkpoint", ckpt_dir, "--arch", "mhop",
                      "--out", out])
    assert os.path.exists(out)
    sd = convert.load_torch_state_dict(out)
    back = convert.retriever_ckpt_to_flax(sd, cfg)
    _tree_equal(params, back)


def test_electra_small_embeddings_project_roundtrip():
    """ELECTRA-small/base style encoders (embedding_size != hidden_size, an
    extra embeddings_project dense) must survive the export→ingest loop."""
    from multihop_dense_retrieval_tpu.models.encoder import TransformerEncoder

    cfg = _cfg(embedding_size=16, type_vocab_size=2, pad_token_id=0,
               roberta_positions=False)
    model = TransformerEncoder(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(5), ids, ids)["params"]
    sd = export.flax_encoder_to_hf(params, prefix="encoder.")
    assert "encoder.embeddings_project.weight" in sd
    assert sd["encoder.embeddings.word_embeddings.weight"].shape[1] == 16
    back = convert.hf_encoder_to_flax(sd, cfg, prefix="encoder.")
    _tree_equal(params, back)
