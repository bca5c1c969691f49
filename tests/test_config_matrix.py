"""Cross-feature interaction sweep: the 2-hop engine under combinations of
index dtype x hop-2 buckets x multi-vector x PCA x index sharding must stay
consistent with a brute-force host reference.

Each feature is unit-tested on its own elsewhere; this matrix exists because
the bugs this repo actually hit were INTERACTIONS (pca x lax.cond scheduling,
int8 x small-chunk Mosaic lowering, sharding x padding).  Exact configs must
match the host reference exactly; quantized/prefiltered configs are checked
on their own terms (int8: top-1 doc agreement; pca: certified queries match).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import EncoderConfig, SearchConfig
from multihop_dense_retrieval_tpu.core.mesh import make_mesh
from multihop_dense_retrieval_tpu.data import HashTokenizer, Corpus, TokenizedCorpus
from multihop_dense_retrieval_tpu.index import DenseIndex
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.search import BeamSearcher
from tests import synth


@pytest.fixture(scope="module")
def world():
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(77)
    docs = synth.make_corpus(rng, 2000, empty_every=23)
    corpus = Corpus(docs)
    tc = TokenizedCorpus.build(corpus, tok, max_text_len=48)
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=96)
    model = MhopRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)
    embs = []
    for s in range(0, len(corpus), 500):
        enc = tok.encode_batch_pair(
            [(corpus[i]["title"], corpus.encode_text(i))
             for i in range(s, min(s + 500, len(corpus)))], 64)
        embs.append(np.asarray(model.apply(
            params, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
            method=model.encode_seq), np.float32))
    emb = np.concatenate(embs)
    emb = emb - emb.mean(axis=0, keepdims=True)  # spread (see test_search)

    qs = [f"question about {corpus[i * 11]['title']}" for i in range(8)]
    q_inputs = tok.encode_batch_one(qs, 20)
    raw = [tok.raw_ids_padded(q, 18) for q in qs]
    rid = np.stack([r[0] for r in raw])
    rlen = np.array([r[1] for r in raw])
    return dict(tok=tok, corpus=corpus, tc=tc, model=model, params=params,
                emb=emb, q_inputs=q_inputs, rid=rid, rlen=rlen)


def _build_searcher(world, *, dtype, buckets, pca, shards):
    tok, tc, corpus = world["tok"], world["tc"], world["corpus"]
    mesh = make_mesh(index=shards) if shards > 1 else None
    index = DenseIndex.build(
        world["emb"], chunk_rows=128, n_shards=shards, dtype=dtype,
        mesh=mesh, pca_dims=world["emb"].shape[1] if pca else None,
        pca_cand_rows=128)
    n_pad = index.vectors.shape[0]
    text_ids = np.full((n_pad, 48), tok.spec.pad_id, np.int32)
    text_ids[:len(corpus)] = tc.text_ids
    text_lens = np.zeros(n_pad, np.int32)
    text_lens[:len(corpus)] = tc.text_lens
    empty = np.zeros(n_pad, bool)
    empty[:len(corpus)] = tc.empty
    scfg = SearchConfig(
        beam_size_1=4, beam_size_2=4, topk=4, max_q_len=20,
        max_q_sp_len=80, chunk_rows=128, use_pallas=False,
        hop2_buckets=(32, 48, 64, 80) if buckets else (),
        # 2048 padded rows / 128-row chunks = 16 candidates single-shard
        # (8 per shard when sharded): rescan most of them so flat tiny-
        # encoder scores can still certify (real data needs far less)
        use_pca=pca, pca_k_chunks=14, pca_hops="12" if pca else "auto")
    model, params = world["model"], world["params"]
    return BeamSearcher(
        encode_fn=lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_seq),
        params=params, index=index,
        text_ids=jnp.asarray(text_ids), text_lens=jnp.asarray(text_lens),
        empty=jnp.asarray(empty), spec=tok.spec, config=scfg, mesh=mesh)


@pytest.fixture(scope="module")
def reference(world):
    s = _build_searcher(world, dtype=jnp.float32, buckets=False, pca=False,
                        shards=1)
    return s.search(world["q_inputs"], world["rid"], world["rlen"])


@pytest.mark.parametrize("buckets,pca,shards", [
    (True, False, 1),
    (False, False, 2),
    (True, False, 2),
    (False, True, 1),
    (True, True, 1),    # pca_hops forced "12": certs on both hops
    (False, True, 2),   # sharded pca
])
def test_exact_fp32_configs_match_reference(world, reference, buckets, pca,
                                            shards):
    got = _build_searcher(world, dtype=jnp.float32, buckets=buckets,
                          pca=pca, shards=shards).search(
        dict(world["q_inputs"]), world["rid"], world["rlen"])
    if not pca:
        np.testing.assert_array_equal(got["hop1_ids"],
                                      reference["hop1_ids"])
        np.testing.assert_array_equal(got["hop2_ids"],
                                      reference["hop2_ids"])
        return
    both = np.asarray(got["pca_cert1"]) \
        & np.asarray(got["pca_cert2"]).all(axis=1)
    assert both.sum() >= 2, f"too few certified: {both}"
    for i in np.nonzero(both)[0]:
        np.testing.assert_array_equal(got["hop1_ids"][i],
                                      reference["hop1_ids"][i])
        np.testing.assert_array_equal(got["hop2_ids"][i],
                                      reference["hop2_ids"][i])


@pytest.mark.parametrize("buckets,shards", [(False, 1), (True, 2)])
def test_int8_configs_keep_top1_docs(world, reference, buckets, shards):
    got = _build_searcher(world, dtype=jnp.int8, buckets=buckets,
                          pca=False, shards=shards).search(
        dict(world["q_inputs"]), world["rid"], world["rlen"])
    agree = (np.asarray(got["hop1_ids"][:, 0])
             == np.asarray(reference["hop1_ids"][:, 0])).mean()
    assert agree >= 0.75, f"int8 top-1 hop-1 agreement too low: {agree}"
