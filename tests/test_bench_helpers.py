"""Bench-harness helpers are driver-critical: the on-device index build
(bench.py::_make_index) must produce a SOUND PCA prefilter (bounds that
really upper-bound every row quantity) and top-k results that agree with
brute force, or the headline JSON would ride a broken config."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


@pytest.fixture(scope="module")
def built():
    d, n_pad, n_docs = 64, 4096, 4000
    rng = np.random.RandomState(0)
    # anisotropic factor like the real bench (decaying spectrum)
    u, _ = np.linalg.qr(rng.randn(d, d))
    lam = np.exp(-np.arange(d) / 8.0) + 0.01
    factor = jnp.asarray((u * np.sqrt(lam)).astype(np.float32))
    rot = jnp.asarray(np.ascontiguousarray(u[:, :16]).astype(np.float32))
    idx = B._make_index(n_pad, n_docs, d, "int8", factor, rot=rot,
                        cand_rows=128)
    return idx, np.asarray(factor), np.asarray(rot)


def test_make_index_layout(built):
    idx, factor, rot = built
    assert idx.vectors.shape == (4096, 64) and idx.vectors.dtype == jnp.int8
    assert idx.scales.shape == (4096,)
    assert idx.pca_proj.shape == (4096, 16)
    assert idx.pca_bounds.shape == (4, 4096 // 128)
    assert idx.n_docs == 4000


def test_pca_bounds_are_sound(built):
    """Every per-chunk bound must dominate the per-row quantity it claims
    to bound (computed here in float64 from the stored representation) —
    the exactness certificates are only as honest as these bounds."""
    idx, factor, rot = built
    q = np.asarray(idx.vectors, np.float64)
    sc = np.asarray(idx.scales, np.float64)
    xd = q * sc[:, None]
    p = xd @ rot.astype(np.float64)
    pb32 = np.asarray(idx.pca_proj.astype(jnp.float32), np.float64)
    resid = np.sqrt(np.maximum((xd * xd).sum(1) - (p * p).sum(1), 0))
    delta = np.linalg.norm(p - pb32, axis=1)
    pnorm = np.linalg.norm(pb32, axis=1)
    xnorm = np.linalg.norm(xd, axis=1)
    per_row = np.stack([resid, delta, pnorm, xnorm])
    bounds = np.asarray(idx.pca_bounds, np.float64)
    cand = 128
    for c in range(bounds.shape[1]):
        chunk_max = per_row[:, c * cand:(c + 1) * cand].max(1)
        # fp32 device accumulation vs float64 host: the shipped margin
        # (×(1+1e-6)+1e-6) must absorb the difference
        assert (bounds[:, c] + 1e-5 >= chunk_max).all(), c


def test_pca_certified_queries_match_bruteforce(built):
    """mips_topk_pca over the bench-built artifacts: certified queries must
    return the true int8-scored top-1; on this spectrum most queries
    certify (the bench's headline-guard regime)."""
    from multihop_dense_retrieval_tpu.ops.mips import (mips_topk_pca,
                                                       pick_pca_step_rows)

    idx, factor, rot = built
    rng = np.random.RandomState(1)
    queries = jnp.asarray(
        (rng.randn(16, 64) @ factor.T).astype(np.float32))
    step = pick_pca_step_rows(4096, 128)
    vals, rows, cert = mips_topk_pca(
        idx.vectors, idx.pca_proj, idx.pca_rot, idx.pca_bounds, queries, 1,
        k_chunks=8, cand_rows=128, step_rows=step, n_valid=4000,
        doc_scales=idx.scales, interpret=True)
    xd = np.asarray(idx.vectors, np.float32) * np.asarray(idx.scales)[:, None]
    exact = np.asarray(queries) @ xd[:4000].T
    top1 = exact.argmax(1)
    cert = np.asarray(cert)
    # cert RATE depends on the spectrum (the real bench measures it and
    # guards the headline); what must hold unconditionally is soundness
    assert cert.sum() >= 1, "no certified queries on a decaying spectrum"
    for i in range(16):
        if cert[i]:
            assert int(rows[i, 0]) == int(top1[i])


def test_bucketed_score_matches_full_width():
    """_bucketed_score (the e2e bench's length-bucketed read) must produce
    the same total as the fixed full-width read, for a real QAReader score:
    span logits are paragraph-masked and rank pooling is attention-masked,
    so narrowing a tile to its bucket width only drops pad columns.  Both
    cond branches are exercised: generous buckets take the narrow path,
    too-tight buckets must fall back to full width."""
    from multihop_dense_retrieval_tpu.core.config import EncoderConfig
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train.qa import decode_spans

    cfg = EncoderConfig.tiny(vocab_size=128, hidden_size=32, num_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=32)
    reader = QAReader(cfg, sp_pred=True)
    n, full = 16, 24
    rng = np.random.RandomState(7)
    # explicit lengths so the narrow path is deterministically taken for
    # tiles 0-1 under the generous buckets below
    lens = np.array([4, 5, 6, 7, 8, 9, 10, 12, 17, 18, 20, 22,
                     23, 24, 24, 24], np.int32)
    rng.shuffle(lens)
    net = {
        "input_ids": jnp.asarray(rng.randint(5, 127, (n, full), "int32")),
        "attention_mask": jnp.asarray(
            (np.arange(full)[None, :] < lens[:, None]).astype(np.int32)),
        "token_type_ids": jnp.zeros((n, full), jnp.int32),
    }
    rp = reader.init(jax.random.PRNGKey(0), {
        "input_ids": net["input_ids"][:1],
        "attention_mask": net["attention_mask"][:1],
        "token_type_ids": net["token_type_ids"][:1],
        "paragraph_mask": net["attention_mask"][:1],
        "sent_offsets": jnp.zeros((1, 8), jnp.int32)})

    def score_fn(sub, w):
        s = {k: sub[k][:, :w] for k in
             ("input_ids", "attention_mask", "token_type_ids")}
        s["paragraph_mask"] = s["attention_mask"]
        s["sent_offsets"] = jnp.zeros((sub["input_ids"].shape[0], 8),
                                      jnp.int32)
        ro = reader.apply(rp, s)
        _, _, sc = decode_spans(ro["start_logits"], ro["end_logits"], 5)
        return ro["rank_score"].sum() + sc.sum()

    ref = float(score_fn(net, full))
    generous = float(B._bucketed_score(score_fn, net, (16, 16, 24, 24),
                                       full))
    np.testing.assert_allclose(generous, ref, rtol=2e-5)
    # every tile's bucket is too tight -> all conds take the full branch
    fallback = float(B._bucketed_score(score_fn, net, (1, 1, 1, 24), full))
    np.testing.assert_allclose(fallback, ref, rtol=2e-5)


def test_moment_factor_cache_roundtrip(tmp_path, monkeypatch):
    """The disk-cached spectrum must be reused (the driver's bench run
    cannot afford the one-off CPU encode every round)."""
    from multihop_dense_retrieval_tpu.core.config import EncoderConfig
    from multihop_dense_retrieval_tpu.models import MhopRetriever

    monkeypatch.setattr(B, "_CACHE_DIR", str(tmp_path / ".bench_cache"))
    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=40)
    model = MhopRetriever(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32),
                        method=model.encode_seq)
    f1, r1 = B._encoder_moment_factor(model, params, cfg, 32, n=128,
                                      width=16)
    cache_dir = tmp_path / ".bench_cache"
    assert cache_dir.exists() and list(cache_dir.iterdir())
    f2, r2 = B._encoder_moment_factor(model, params, cfg, 32, n=128,
                                      width=16)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_make_index_small_n_adapts_cand_rows():
    """Smoke-sized MDRT_BENCH_N (slice smaller than the default 512-row
    candidate block) must still build: cand_rows halves until it divides
    the slice instead of asserting (review r3 finding — a 4096-doc bf16 or
    int8 build died before the dtype branch)."""
    d, n_pad = 32, 2048          # 16 slices -> 128 rows/slice < 512
    rng = np.random.RandomState(1)
    u, _ = np.linalg.qr(rng.randn(d, d))
    factor = jnp.asarray(u.astype(np.float32))
    rot = jnp.asarray(np.ascontiguousarray(u[:, :8]).astype(np.float32))

    bf = B._make_index(n_pad, 2000, d, "bf16", factor)
    assert bf.vectors.shape == (n_pad, d) and bf.vectors.dtype == jnp.bfloat16

    idx = B._make_index(n_pad, 2000, d, "int8", factor, rot=rot)
    assert idx.pca_cand_rows == 128          # 512 -> 256 -> 128 divides
    assert idx.pca_bounds.shape == (4, n_pad // 128)


def test_min_time_recovers_steady_state_from_a_stall():
    """Every steady-state stage times best-of-N dispatches because the axon
    tunnel can stall for seconds mid-run (observed r4: one pca stage at
    457 ms/batch where two reruns measured ~65 ms).  A stall only ADDS
    latency, so the min must ignore a slow first call, and the stage's
    result payload must still come through."""
    import time as _t

    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] == 1:
            _t.sleep(0.2)          # the stalled dispatch
        return "payload"

    dt, out = B._min_time(fn, n=3)
    assert calls["n"] == 3
    assert out == "payload"
    assert dt < 0.1                # the stall did not poison the estimate


def test_min_time_reps_env_override(monkeypatch):
    monkeypatch.setenv("MDRT_BENCH_TIMED_REPS", "1")
    calls = {"n": 0}

    def fn():
        calls["n"] += 1

    B._min_time(fn)
    assert calls["n"] == 1
