"""Tests for the wider component inventory: single-hop/unified/FEVER datasets,
NQ retriever + losses, multi-vector encoder, utils, prep, preemption,
analysis."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.data import HashTokenizer
from multihop_dense_retrieval_tpu.data.sp_datasets import SPDataset, sp_collate
from multihop_dense_retrieval_tpu.data.unified_dataset import (
    UnifiedDataset, FeverDataset, FeverSampler)
from multihop_dense_retrieval_tpu.data import prep
from multihop_dense_retrieval_tpu.eval.analysis import (
    decompose_errors, aggregate_errors)
from multihop_dense_retrieval_tpu.models import (
    NQRetriever, MultiVectorCtxEncoder)
from multihop_dense_retrieval_tpu.train import losses
from multihop_dense_retrieval_tpu.utils import (
    SimpleTokenizer, para_has_answer, AverageMeter, DocDB)
from tests import synth


def _write(tmp_path, name, rows):
    synth.write_jsonl(tmp_path / name, rows)
    return str(tmp_path / name)


def test_sp_dataset(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    rows = [{"question": "who did x?",
             "pos_paras": [{"title": "A", "text": "a text"}],
             "neg_paras": [{"title": "B", "text": "b text"}]},
            {"question": "who did y?",
             "pos_paras": [{"title": "C", "text": "c text"}],
             "neg_paras": []}]
    ds = SPDataset(tok, _write(tmp_path, "sp.jsonl", rows),
                   max_q_len=12, max_c_len=16, train=True)
    batch = sp_collate([ds[0], ds[1]])
    assert batch["q_input_ids"].shape == (2, 12)
    assert batch["c_input_ids"].shape == (2, 16)
    # row 1 has no negatives: train mode borrows another sample's positive
    assert batch["neg_mask"][1].sum() > 0


def test_single_loss_learnable():
    out = {k: jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
           for k in ("q", "c", "neg")}
    l = losses.single_loss(out)
    assert np.isfinite(float(l))
    ev = losses.single_eval(out)
    assert ev["rrs"].shape == (4,)


def test_unified_dataset_stop_targets(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 16)
    rows = synth.make_mhop_rows(rng, docs, n_rows=4)
    rows[1]["type"] = "single"
    rows[1]["pos_paras"] = rows[1]["pos_paras"][:1]
    ds = UnifiedDataset(tok, _write(tmp_path, "u.jsonl", rows),
                        max_q_len=12, max_q_sp_len=32, max_c_len=24)
    assert ds[0]["stop_targets"] == 1
    assert ds[1]["stop_targets"] == 0
    assert ds[1]["c2_input_ids"].shape == (24,)


def test_fever_dataset_and_sampler(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    rows = [{"claim": "claim one",
             "evidence": [[{"title": "A", "text": "ta"},
                           {"title": "B", "text": "tb"}]],
             "tfidf_neg": [{"title": "N1", "text": "tn"}],
             "linked_neg": [{"title": "N2", "text": "tn2"}]},
            {"claim": "claim two",
             "evidence": [[{"title": "C", "text": "tc"}]],  # single-title: dropped
             "tfidf_neg": [], "linked_neg": []}]
    ds = FeverDataset(tok, _write(tmp_path, "f.jsonl", rows),
                      max_q_len=12, max_q_sp_len=32, max_c_len=24)
    assert len(ds) == 1
    item = ds[0]
    assert item["q_input_ids"].shape == (12,)
    sampler = FeverSampler(single_ids=[0, 1, 2, 3], multi_ids=[4, 5], ratio=1)
    idxs = sampler.epoch_indices()
    assert len(idxs) == 4 and {4, 5} <= set(idxs)


def test_nq_retriever_and_loss():
    cfg = EncoderConfig.tiny(vocab_size=256, max_position_embeddings=32)
    model = NQRetriever(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    batch = {f"{k}_input_ids": ids for k in ("q", "c", "neg", "q_neg1")}
    batch.update({f"{k}_mask": ids for k in ("q", "c", "neg", "q_neg1")})
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert set(out) == {"q", "c", "neg", "q_neg1"}
    l = losses.nq_mhop_loss(out)
    assert np.isfinite(float(l))


def test_multi_vector_ctx_encoder():
    cfg = EncoderConfig.tiny(vocab_size=256, max_position_embeddings=32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    for scheme, mv in (("tokenwise", 3), ("layerwise", 2)):
        model = MultiVectorCtxEncoder(cfg, multi_vector=mv, scheme=scheme)
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        out = model.apply(params, ids, mask)
        assert out.shape == (2 * mv, cfg.hidden_size)


def test_simple_tokenizer_and_answer_match():
    tok = SimpleTokenizer()
    assert tok.tokenize("Hello, world-2!") == ["Hello", ",", "world", "-", "2", "!"]
    assert para_has_answer(["world"], "Hello world!", tok)
    assert para_has_answer(["hello world"], "Hello world!", tok)
    # punctuation is a token: a comma between words breaks the subsequence
    # (DrQA semantics, same as the reference matcher)
    assert not para_has_answer(["hello world"], "Hello, world!", tok)
    assert not para_has_answer(["absent"], "Hello world", tok)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0


def test_docdb(tmp_path):
    db = DocDB.create(str(tmp_path / "docs.db"))
    db.insert("Title A", "text of a")
    assert db.get_doc_text("Title A") == "text of a"
    assert db.get_doc_ids() == ["Title A"]
    assert db.get_doc_text("missing") is None


def test_pick_bridge_and_prep():
    title2doc = {"A": "answer lives here", "B": "other text"}
    title2linked = {"A": ["B"], "B": []}
    # answer containment decides
    assert prep.pick_bridge(title2linked, title2doc, ["A", "B"], "answer") == "A"
    # hyperlink direction decides (A links to B → B is second... reference
    # returns titles[0] when t0 ∈ linked(t1); here B links to nothing)
    assert prep.pick_bridge(title2linked, title2doc, ["A", "B"], "zzz") == "B"

    raw = [{"question": "q?", "_id": "1", "type": "bridge",
            "context": [["A", ["answer lives here"]], ["B", ["other text"]]],
            "supporting_facts": [["A", 0], ["B", 0]], "answer": "answer"}]
    rows = prep.hotpot_to_mhop_rows(raw, title2linked)
    assert rows[0]["bridge"] == "A"
    assert rows[0]["pos_paras"][0]["title"] == "A"

    retrieved = [{"question": "q?", "candidate_chains": []}]
    out = prep.add_sp_labels(raw, retrieved, {"A": ["answer lives here"],
                                              "B": ["other text"]})
    assert out[0]["sp"][0]["title"] == "A"
    assert out[0]["sp"][0]["sp_sent_ids"] == [0]


def test_error_decomposition():
    rows = [
        decompose_errors(["A", "B"], "bridge", [["A", "B"]], ["A"]),   # correct
        decompose_errors(["A", "B"], "bridge", [["X", "Y"]], ["X"]),   # start err
        decompose_errors(["A", "B"], "bridge", [["A", "X"]], ["A"]),   # bridge err
        decompose_errors(["A", "B"], "bridge", [["A", "X"], ["B", "Y"]],
                         ["A", "B"]),                                   # ordering
    ]
    agg = aggregate_errors(rows)
    assert agg["overall"]["correct"] == 0.25
    assert agg["overall"]["start_hop_error"] == 0.25
    assert agg["overall"]["bridge_hop_error"] == 0.25
    assert agg["overall"]["ordering_error"] == 0.25

    # bridge label disambiguation: hop-1 found ONLY the bridge passage B —
    # with bridge="B" that is a START failure (the reference keys buckets
    # off item['bridge']); the unlabeled heuristic would call it bridge err
    row = decompose_errors(["A", "B"], "bridge", [["B", "X"]], ["B"],
                           bridge="B")
    assert row["start_hop_error"] == 1 and row["bridge_hop_error"] == 0
    # ...and finding the true start A with the bridge missing stays bridge err
    row = decompose_errors(["A", "B"], "bridge", [["A", "X"]], ["A"],
                           bridge="B")
    assert row["bridge_hop_error"] == 1

    # empty input: a zeroed report, not a ZeroDivisionError
    assert aggregate_errors([])["overall"]["n"] == 0


def test_preemption_roundtrip(tmp_path):
    from multihop_dense_retrieval_tpu.train.preemption import PreemptionCheckpointer
    from multihop_dense_retrieval_tpu.train.trainer import (
        TrainState, make_optimizer)
    from multihop_dense_retrieval_tpu.core.config import RetrieverTrainConfig

    params = {"w": jnp.arange(4.0)}
    tx = make_optimizer(RetrieverTrainConfig(), 10)
    state = TrainState.create(params, tx)
    pc = PreemptionCheckpointer(str(tmp_path / "pc"))
    pc.save(state, epoch=3, best_metric=0.5)
    restored, meta = pc.maybe_restore(state)
    assert meta["epoch"] == 3 and meta["best_metric"] == 0.5
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(4.0))
    # empty dir → (None, None)
    pc2 = PreemptionCheckpointer(str(tmp_path / "nope"))
    assert pc2.maybe_restore(state) == (None, None)


def test_nq_mhop_dataset_and_augmentation(tmp_path):
    from multihop_dense_retrieval_tpu.data.sp_datasets import NQMhopDataset
    from multihop_dense_retrieval_tpu.train.trainer import (
        TrainState, make_optimizer, make_train_step)
    from multihop_dense_retrieval_tpu.core.config import RetrieverTrainConfig
    import jax.numpy as jnp

    tok = HashTokenizer(vocab_size=512)
    rows = [{"question": f"short q {i}",
             "pos_paras": [{"title": f"P{i}", "text": "pos body"}],
             "top_neg": [{"title": f"E{i}", "text": "wrong passage body"},
                         {"title": f"N{i}", "text": "negative body"}]}
            for i in range(4)]
    rows.append({"question": "dropped", "pos_paras": [], "top_neg": []})
    synth.write_jsonl(tmp_path / "nq.jsonl", rows)
    ds = NQMhopDataset(tok, str(tmp_path / "nq.jsonl"),
                       max_q_len=16, max_q_sp_len=32, max_c_len=24)
    assert len(ds) == 4  # <2 top_neg dropped
    item = ds[0]
    # [MASK] augmentation: every non-special slot of q filled, full mask
    assert item["q_mask"].sum() == 16
    assert (item["q_input_ids"] == tok.spec.mask_id).sum() > 0
    # q_neg1 is a (question, error passage) pair
    assert item["q_neg1_input_ids"][0] == tok.spec.cls_id

    # full NQ train step over this batch
    from multihop_dense_retrieval_tpu.data.sp_datasets import sp_collate
    batch = {k: jnp.asarray(v) for k, v in sp_collate([ds[i] for i in range(4)]).items()}
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=40)
    model = NQRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(RetrieverTrainConfig(warmup_ratio=0.0), 10)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, task="nq")
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


def test_profiling_utils(tmp_path):
    from multihop_dense_retrieval_tpu.utils.profiling import (
        StageTimers, device_trace)
    import time as _t

    t = StageTimers()
    with t.span("encode"):
        _t.sleep(0.01)
    with t.span("encode"):
        _t.sleep(0.01)
    with t.span("search"):
        pass
    rep = t.report()
    assert rep["encode"]["count"] == 2
    assert rep["encode"]["mean_ms"] >= 10
    t.dump(str(tmp_path / "t.json"))
    assert json.load(open(tmp_path / "t.json"))["search"]["count"] == 1
    with device_trace(None):  # no-op path
        pass


def test_metric_writer_jsonl(tmp_path):
    from multihop_dense_retrieval_tpu.utils.meters import MetricWriter

    w = MetricWriter(str(tmp_path / "tb"))
    w.add_scalar("loss", 1.5, 3)
    w.close()
    import glob
    files = glob.glob(str(tmp_path / "tb" / "*"))
    assert files  # either tb events or metrics.jsonl


def test_default_hop2_tiling_presets():
    """Row-count thresholds and max_width clipping of the measured hop-2
    tiling presets (core/config.py::default_hop2_tiling)."""
    from multihop_dense_retrieval_tpu.core.config import (
        default_hop2_tiling, HOP2_BUCKETS_5TILE, HOP2_BUCKETS_6TILE,
        HOP2_TILE_FRACS_5TILE, HOP2_TILE_FRACS_6TILE)

    assert default_hop2_tiling(768) == (HOP2_BUCKETS_6TILE,
                                        HOP2_TILE_FRACS_6TILE)
    assert default_hop2_tiling(512) == (HOP2_BUCKETS_6TILE,
                                        HOP2_TILE_FRACS_6TILE)
    assert default_hop2_tiling(192) == (HOP2_BUCKETS_5TILE,
                                        HOP2_TILE_FRACS_5TILE)
    assert default_hop2_tiling(127) == ((), ())
    # wider static pad: the final (full) tile widens with it
    b, f = default_hop2_tiling(4500, max_width=400)
    assert b == HOP2_BUCKETS_6TILE[:-1] + (400,)
    assert f == HOP2_TILE_FRACS_6TILE
    # narrower pad: over-wide buckets drop, their fracs merge into the tail
    b, f = default_hop2_tiling(192, max_width=200)
    assert b == (128, 160, 192, 200)
    assert abs(sum(f) - 1.0) < 1e-9 and len(f) == 4
    # pad too narrow for any useful split
    assert default_hop2_tiling(192, max_width=96) == ((), ())


def test_resolve_hop2_tiling_flags():
    import argparse
    from multihop_dense_retrieval_tpu.cli import common
    from multihop_dense_retrieval_tpu.core.config import HOP2_BUCKETS_5TILE

    p = argparse.ArgumentParser()
    common.add_hop2_tiling_args(p)
    args = p.parse_args([])
    assert common.resolve_hop2_tiling(args, 192, 350)[0] == HOP2_BUCKETS_5TILE
    assert common.resolve_hop2_tiling(args, 24, 350) == ((), ())
    args = p.parse_args(["--hop2-buckets", "off"])
    assert common.resolve_hop2_tiling(args, 4500, 350) == ((), ())
    args = p.parse_args(["--hop2-buckets", "64,96,128",
                         "--hop2-tile-fracs", "0.5,0.25,0.25"])
    assert common.resolve_hop2_tiling(args, 64, 128) == (
        (64, 96, 128), (0.5, 0.25, 0.25))
    # explicit configs the engine would silently discard must fail loud
    # (review r3 finding: a fracs/buckets length mismatch measured the
    # equal-tile fallback while claiming the user's config)
    import pytest
    args = p.parse_args(["--hop2-buckets", "64,96,128",
                         "--hop2-tile-fracs", "0.5,0.5"])
    with pytest.raises(ValueError, match="2 entries for 3 buckets"):
        common.resolve_hop2_tiling(args, 64, 128)
    args = p.parse_args(["--hop2-buckets", "64,96,128"])
    with pytest.raises(ValueError, match="equal tiles"):
        common.resolve_hop2_tiling(args, 64, 128)  # 64 % 3 != 0
    args = p.parse_args(["--hop2-buckets", "64,96,128",
                         "--hop2-tile-fracs", "0.99,0.005,0.005"])
    with pytest.raises(ValueError, match="empty tile"):
        common.resolve_hop2_tiling(args, 64, 128)


def test_enable_compile_cache(tmp_path, monkeypatch):
    """The persistent-compile-cache helper must populate its directory on a
    fresh compile (min_compile_secs=0 forces even trivial entries) and
    respect the "off" sentinel + env-var resolution order."""
    import jax
    import jax.numpy as jnp

    from multihop_dense_retrieval_tpu.core.compile_cache import \
        enable_compile_cache

    assert enable_compile_cache("off") is None
    monkeypatch.setenv("MDRT_COMPILE_CACHE", "off")
    assert enable_compile_cache() is None

    cache = tmp_path / "cc"
    assert enable_compile_cache(str(cache), min_compile_secs=0.0) == str(cache)
    x = jnp.arange(64, dtype=jnp.float32)
    # a fresh lambda each call → new python-level cache key → real compile
    jax.jit(lambda v: (v * 3 + 1).sum())(x).block_until_ready()
    assert cache.exists() and any(cache.iterdir()), \
        "compile cache dir was not populated"
    # restore a harmless default for the rest of the suite
    enable_compile_cache("/tmp/mdrt_jax_cache")
