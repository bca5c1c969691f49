"""Encoder correctness: shapes, masking invariance, and numeric parity of the
torch→flax converter against a randomly-initialized HF torch RoBERTa/BERT.

The parity test is the framework's substitute for downloading released
checkpoints: if a random HF model converts losslessly, the released weights
will too (same tensor layout).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.models.encoder import (
    TransformerEncoder,
    roberta_position_ids,
)
from multihop_dense_retrieval_tpu.models import convert


def test_roberta_position_ids():
    ids = jnp.array([[5, 9, 3, 1, 1], [7, 1, 1, 1, 1]], dtype=jnp.int32)  # pad=1
    pos = roberta_position_ids(ids, pad_id=1)
    np.testing.assert_array_equal(np.asarray(pos),
                                  [[2, 3, 4, 1, 1], [2, 1, 1, 1, 1]])


def test_encoder_shapes_and_padding_invariance():
    cfg = EncoderConfig.tiny()
    model = TransformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jnp.array([[5, 9, 3, 1, 1]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0, 0]], dtype=jnp.int32)
    params = model.init(rng, ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (1, 5, cfg.hidden_size)
    # changing the content of padded positions must not change unpadded outputs
    ids2 = ids.at[0, 3].set(77)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(out2[:, :3]),
                               atol=1e-5)


@pytest.mark.parametrize("kind", ["roberta", "bert"])
def test_hf_torch_parity(kind):
    """Random HF torch model → convert → flax; outputs must match closely."""
    torch = pytest.importorskip("torch")
    import transformers

    torch.manual_seed(0)
    if kind == "roberta":
        hf_cfg = transformers.RobertaConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        hf_model = transformers.RobertaModel(hf_cfg, add_pooling_layer=False)
        cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64,
                            max_position_embeddings=40, type_vocab_size=1,
                            pad_token_id=1, roberta_positions=True,
                            layer_norm_eps=hf_cfg.layer_norm_eps,
                            dtype="float32")
    else:
        hf_cfg = transformers.BertConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, type_vocab_size=2, pad_token_id=0,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        hf_model = transformers.BertModel(hf_cfg, add_pooling_layer=False)
        cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64,
                            max_position_embeddings=40, type_vocab_size=2,
                            pad_token_id=0, roberta_positions=False,
                            layer_norm_eps=hf_cfg.layer_norm_eps,
                            dtype="float32")
    hf_model.eval()

    params = {"params": convert.hf_model_to_flax(hf_model, cfg)}
    model = TransformerEncoder(cfg)

    rng = np.random.RandomState(0)
    B, L = 3, 11
    pad = cfg.pad_token_id
    ids = rng.randint(4, 120, size=(B, L)).astype(np.int64)
    lens = [11, 7, 5]
    mask = np.zeros((B, L), dtype=np.int64)
    for i, n in enumerate(lens):
        mask[i, :n] = 1
        ids[i, n:] = pad

    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32)))
    for i, n in enumerate(lens):
        np.testing.assert_allclose(out[i, :n], hf_out[i, :n], atol=1e-3, rtol=1e-3)


def test_retriever_ckpt_roundtrip():
    """A synthetic RobertaRetriever-style torch state dict loads into
    MhopRetriever and produces finite vectors."""
    torch = pytest.importorskip("torch")
    import transformers
    from multihop_dense_retrieval_tpu.models import MhopRetriever

    torch.manual_seed(0)

    hf_cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf_model = transformers.RobertaModel(hf_cfg, add_pooling_layer=False)
    hf_model.eval()
    sd = {f"module.encoder.{k}": v for k, v in hf_model.state_dict().items()}
    # projection head: Sequential(Linear, LayerNorm) → project.0 / project.1
    lin = torch.nn.Linear(32, 32)
    ln = torch.nn.LayerNorm(32)
    sd.update({f"module.project.0.{k}": v for k, v in lin.state_dict().items()})
    sd.update({f"module.project.1.{k}": v for k, v in ln.state_dict().items()})

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.pt")
        torch.save(sd, path)
        npsd = convert.load_torch_state_dict(path)
    assert not any(k.startswith("module.") for k in npsd)

    cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, dtype="float32")
    params = {"params": convert.retriever_ckpt_to_flax(npsd, cfg)}
    model = MhopRetriever(cfg)
    ids = jnp.ones((2, 8), dtype=jnp.int32) * 5
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    vec = model.apply(params, ids, mask, method=model.encode_seq)
    assert vec.shape == (2, 32)
    assert bool(jnp.all(jnp.isfinite(vec)))

    # parity of the projection head vs torch
    with torch.no_grad():
        h = hf_model(input_ids=torch.ones(2, 8, dtype=torch.long) * 5,
                     attention_mask=torch.ones(2, 8, dtype=torch.long))
        expected = ln(lin(h.last_hidden_state[:, 0])).numpy()
    np.testing.assert_allclose(np.asarray(vec), expected, atol=1e-3, rtol=1e-3)


def test_gelu_exact_fp32_semantics():
    """The serving gelu (fp32 erf, single downcast) is the exact erf gelu:
    identical to flax's exact gelu in fp32 (up to fp32 op-order ulps), and
    for bf16 inputs within 1e-4 of round_to_bf16(gelu_fp32(x)) — i.e. fully
    fp32-accurate, unlike a bf16-computed gelu whose intermediate roundings
    err at the 1e-2 scale (the 5x-slower path it replaces,
    encoder._gelu_exact)."""
    import flax.linen as nn
    from multihop_dense_retrieval_tpu.models.encoder import _gelu_exact

    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(_gelu_exact(x)),
                               np.asarray(nn.gelu(x, approximate=False)),
                               atol=1e-6, rtol=1e-6)
    xb = x.astype(jnp.bfloat16)
    ref = nn.gelu(xb.astype(jnp.float32),
                  approximate=False).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(_gelu_exact(xb)).astype(np.float32),
                               np.asarray(ref).astype(np.float32),
                               atol=1e-4, rtol=0)


def test_cls_only_last_layer_bit_identical():
    """cls_only encoder output position 0 == full encoder's position 0."""
    cfg = EncoderConfig.tiny()
    full = TransformerEncoder(cfg)
    cls_only = TransformerEncoder(cfg, cls_only=True)
    rng = jax.random.PRNGKey(0)
    ids = jnp.array([[5, 9, 3, 7, 2], [8, 4, 1, 1, 1]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 1], [1, 1, 0, 0, 0]], dtype=jnp.int32)
    params = full.init(rng, ids, mask)
    out_full = full.apply(params, ids, mask)
    out_cls = cls_only.apply(params, ids, mask)
    assert out_cls.shape == (2, 1, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(out_cls[:, 0]),
                               np.asarray(out_full[:, 0]), atol=1e-6)


def test_electra_reader_ckpt_parity():
    """Random ELECTRA torch model + reader heads → convert → QAReader; the
    encoder hidden states must match HF to fp32 tolerance (this is the
    qa_electra.pt ingestion path)."""
    torch = pytest.importorskip("torch")
    import transformers
    from multihop_dense_retrieval_tpu.models.reader import QAReader

    torch.manual_seed(0)
    hf_cfg = transformers.ElectraConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, embedding_size=32,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf_model = transformers.ElectraModel(hf_cfg)
    hf_model.eval()

    # build a QAModel-style state dict: encoder.* + pooler/qa_outputs/rank/sp
    sd = {f"encoder.{k}": v.detach().cpu().numpy()
          for k, v in hf_model.state_dict().items()}
    for name, (i, o) in (("pooler.dense", (32, 32)), ("qa_outputs", (32, 2)),
                         ("rank", (32, 1)), ("sp", (32, 1))):
        lin = torch.nn.Linear(i, o)
        sd[f"{name}.weight"] = lin.weight.detach().numpy()
        sd[f"{name}.bias"] = lin.bias.detach().numpy()

    cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=2,
                        pad_token_id=0, roberta_positions=False,
                        layer_norm_eps=hf_cfg.layer_norm_eps, dtype="float32")
    params = {"params": convert.reader_ckpt_to_flax(sd, cfg, sp_pred=True)}
    model = QAReader(cfg, sp_pred=True)

    rng = np.random.RandomState(1)
    B, L = 2, 12
    ids = rng.randint(4, 120, size=(B, L)).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "token_type_ids": jnp.zeros((B, L), jnp.int32),
        "paragraph_mask": jnp.ones((B, L), jnp.int32),
        "sent_offsets": jnp.zeros((B, 3), jnp.int32),
        "sent_mask": jnp.ones((B, 3), jnp.int32),
    }
    out = model.apply(params, batch)
    with torch.no_grad():
        hf_h = hf_model(input_ids=torch.tensor(ids, dtype=torch.long),
                        attention_mask=torch.ones(B, L, dtype=torch.long),
                        token_type_ids=torch.zeros(B, L, dtype=torch.long)
                        ).last_hidden_state.numpy()
        import numpy as _np
        w, b = sd["qa_outputs.weight"], sd["qa_outputs.bias"]
        expected_start = hf_h @ w.T[:, 0] + b[0]
    np.testing.assert_allclose(np.asarray(out["start_logits"]),
                               expected_start, atol=1e-3, rtol=1e-3)
    assert out["rank_score"].shape == (B, 1)
    assert out["sp_score"].shape == (B, 3)


def test_unified_ckpt_reference_layout_parity():
    """A reference-layout UnifiedRetriever state dict (unified_retriever.py:
    10-30: transformer under `encoder_c.`, roberta-only `project`, stop head
    fed by the HF tanh pooler) converts and matches a torch oracle — both
    the projected vector and the stop logits."""
    torch = pytest.importorskip("torch")
    import transformers
    from multihop_dense_retrieval_tpu.models import UnifiedRetriever

    torch.manual_seed(1)
    hf_cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf_model = transformers.RobertaModel(hf_cfg)   # WITH pooling layer
    hf_model.eval()
    sd = {f"encoder_c.{k}": v.detach().numpy()
          for k, v in hf_model.state_dict().items()}
    lin, ln = torch.nn.Linear(32, 32), torch.nn.LayerNorm(32)
    stop = torch.nn.Linear(32, 2)
    for mod, name in ((lin, "project.0"), (ln, "project.1"), (stop, "stop")):
        sd.update({f"{name}.{k}": v.detach().numpy()
                   for k, v in mod.state_dict().items()})

    cfg = EncoderConfig(vocab_size=128, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, dtype="float32")
    params = {"params": convert.unified_ckpt_to_flax(sd, cfg)}
    assert "project" in params["params"] and "pooler" in params["params"]
    model = UnifiedRetriever(cfg, use_projection=True, stop_on_pooled=True)

    ids = jnp.ones((2, 8), jnp.int32) * 5
    mask = jnp.ones((2, 8), jnp.int32)
    vec, stop_logits = model.apply(params, ids, mask,
                                   method=model.encode_qsp)

    with torch.no_grad():
        out = hf_model(input_ids=torch.ones(2, 8, dtype=torch.long) * 5,
                       attention_mask=torch.ones(2, 8, dtype=torch.long))
        exp_vec = ln(lin(out.last_hidden_state[:, 0])).numpy()
        exp_stop = stop(out.pooler_output).numpy()   # tanh pooler feed
    np.testing.assert_allclose(np.asarray(vec), exp_vec,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop_logits), exp_stop,
                               atol=1e-3, rtol=1e-3)

    # non-roberta layout: no project keys -> raw-CLS vectors, same stop path
    sd_bert = {k: v for k, v in sd.items() if not k.startswith("project.")}
    p2 = {"params": convert.unified_ckpt_to_flax(sd_bert, cfg)}
    assert "project" not in p2["params"] and "pooler" in p2["params"]
    m2 = UnifiedRetriever(cfg, use_projection=False, stop_on_pooled=True)
    vec2, stop2 = m2.apply(p2, ids, mask, method=m2.encode_qsp)
    np.testing.assert_allclose(
        np.asarray(vec2), out.last_hidden_state[:, 0].numpy(),
        atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(stop2), exp_stop,
                               atol=1e-3, rtol=1e-3)
