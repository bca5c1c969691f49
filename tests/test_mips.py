"""MIPS engine tests: XLA scan vs brute force, pallas (interpret mode) parity,
and the sharded search on an 8-virtual-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.mesh import make_mesh
from multihop_dense_retrieval_tpu.ops.mips import (
    mips_topk_xla,
    mips_topk_pallas,
    sharded_mips_topk,
)


def _brute(index, queries, k):
    scores = np.asarray(queries, np.float32) @ np.asarray(index, np.float32).T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("n,k,chunk", [(1024, 5, 256), (1000, 7, 256), (512, 64, 128)])
def test_mips_xla_matches_bruteforce(n, k, chunk):
    rng = np.random.RandomState(0)
    index = jnp.asarray(rng.randn(n, 32), jnp.float32)
    q = jnp.asarray(rng.randn(9, 32), jnp.float32)
    vals, idxs = mips_topk_xla(index, q, k, chunk_rows=chunk)
    bv, bi = _brute(index, q, k)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idxs), bi)


def test_mips_pallas_interpret_matches_xla():
    rng = np.random.RandomState(1)
    index = jnp.asarray(rng.randn(2048, 64), jnp.float32)
    q = jnp.asarray(rng.randn(8, 64), jnp.float32)
    v1, i1 = mips_topk_xla(index, q, 8, chunk_rows=512)
    v2, i2 = mips_topk_pallas(index, q, 8, chunk_rows=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_mips_pallas_k_not_multiple_of_8():
    rng = np.random.RandomState(2)
    index = jnp.asarray(rng.randn(1024, 32), jnp.float32)
    q = jnp.asarray(rng.randn(8, 32), jnp.float32)
    v, i = mips_topk_pallas(index, q, 5, chunk_rows=256, interpret=True)
    bv, bi = _brute(index, q, 5)
    np.testing.assert_array_equal(np.asarray(i), bi)


def test_sharded_matches_single_device():
    mesh = make_mesh()  # (1, 8)
    rng = np.random.RandomState(3)
    n, d, b, k = 8 * 512, 64, 16, 5
    index = jnp.asarray(rng.randn(n, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, d), jnp.float32)
    v_ref, i_ref = mips_topk_xla(index, q, k, chunk_rows=512)
    v_sh, i_sh = sharded_mips_topk(index, q, k, mesh, use_pallas=False,
                                   chunk_rows=512)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_sh), rtol=1e-5)


def test_sharded_negative_scores_with_padding():
    """Zero-vector pad rows score 0.0 — they must not evict valid docs with
    negative inner products from the boundary shard's local top-k (the
    exact-search guarantee).  All-negative scores make any eviction visible."""
    mesh = make_mesh()  # (1, 8)
    rng = np.random.RandomState(11)
    n_pad, d, b, k = 8 * 256, 32, 8, 5
    n_valid = n_pad - 700  # padding spills across the last three shards
    # all-positive queries × all-negative index rows → every valid inner
    # product is strictly negative (pads score 0.0 and would win unmasked)
    base = -np.abs(rng.randn(n_valid, d)) - 0.01
    q_np = np.abs(rng.randn(b, d)) + 0.01
    index = np.zeros((n_pad, d), np.float32)
    index[:n_valid] = base
    index = jnp.asarray(index)
    q = jnp.asarray(q_np, jnp.float32)
    bv, bi = _brute(index[:n_valid], q, k)
    v_sh, i_sh = sharded_mips_topk(index, q, k, mesh, use_pallas=False,
                                   chunk_rows=256, n_valid=n_valid)
    assert np.all(np.asarray(v_sh) < 0), "pad rows leaked into top-k"
    np.testing.assert_array_equal(np.asarray(i_sh), bi)
    np.testing.assert_allclose(np.asarray(v_sh), bv, rtol=1e-5)
    # the pallas kernels honour a traced (dynamic) bound too
    v_pl, i_pl = mips_topk_pallas(index, q, k, chunk_rows=256, interpret=True,
                                  n_valid_dyn=jnp.int32(n_valid))
    np.testing.assert_array_equal(np.asarray(i_pl), bi)
    from multihop_dense_retrieval_tpu.ops.mips import (
        quantize_rows, mips_topk_pallas_int8)
    qi, sc = quantize_rows(index)
    v_i8, i_i8 = mips_topk_pallas_int8(qi, sc, q, k, chunk_rows=256,
                                       interpret=True,
                                       n_valid_dyn=jnp.int32(n_valid))
    assert np.all(np.asarray(i_i8) < n_valid), "int8 pad rows leaked"


def test_sharded_2d_mesh():
    mesh = make_mesh(data=2, index=4)
    rng = np.random.RandomState(4)
    n, d, b, k = 4 * 256, 32, 8, 3
    index = jnp.asarray(rng.randn(n, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, d), jnp.float32)
    v_sh, i_sh = sharded_mips_topk(index, q, k, mesh, use_pallas=False,
                                   chunk_rows=256)
    bv, bi = _brute(index, q, k)
    np.testing.assert_array_equal(np.asarray(i_sh), bi)


def test_int8_recall_vs_exact():
    from multihop_dense_retrieval_tpu.ops.mips import (
        quantize_rows, mips_topk_xla_int8, mips_topk_pallas_int8)
    rng = np.random.RandomState(5)
    index = jnp.asarray(rng.randn(2048, 64), jnp.float32)
    q = jnp.asarray(rng.randn(16, 64), jnp.float32)
    qi, sc = quantize_rows(index)
    bv, bi = _brute(index, q, 10)
    v, i = mips_topk_xla_int8(qi, sc, q, 10, chunk_rows=512)
    recall = np.mean([len(set(np.asarray(i)[r]) & set(bi[r])) / 10
                      for r in range(16)])
    assert recall >= 0.9, recall
    # scores close to exact
    np.testing.assert_allclose(np.asarray(v)[:, 0], bv[:, 0], rtol=0.05)
    # pallas interpret path agrees with the xla int8 path exactly
    v2, i2 = mips_topk_pallas_int8(qi, sc, q, 10, chunk_rows=512,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))


def test_int8_dense_index_roundtrip(tmp_path):
    from multihop_dense_retrieval_tpu.index.store import DenseIndex
    from multihop_dense_retrieval_tpu.ops.mips import mips_topk
    rng = np.random.RandomState(6)
    emb = rng.randn(100, 32).astype(np.float32)
    idx = DenseIndex.build(emb, chunk_rows=64, dtype=jnp.int8)
    assert idx.vectors.dtype == jnp.int8 and idx.scales is not None
    p = str(tmp_path / "i8.npz")
    idx.save(p)
    idx2 = DenseIndex.load(p)
    np.testing.assert_array_equal(np.asarray(idx.vectors),
                                  np.asarray(idx2.vectors))
    q = jnp.asarray(rng.randn(8, 32), jnp.float32)
    v, i = mips_topk(idx2.vectors, q, 5, doc_scales=idx2.scales,
                     n_valid=idx2.n_docs, use_pallas=False)
    bv, bi = _brute(emb, q, 5)
    overlap = np.mean([len(set(np.asarray(i)[r]) & set(bi[r])) / 5
                       for r in range(8)])
    assert overlap >= 0.8


def test_sharded_int8_matches_unsharded():
    from multihop_dense_retrieval_tpu.ops.mips import (
        quantize_rows, mips_topk_xla_int8)
    mesh = make_mesh()  # (1, 8)
    rng = np.random.RandomState(9)
    n, d, b, k = 8 * 256, 32, 8, 5
    index = jnp.asarray(rng.randn(n, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, d), jnp.float32)
    qi, sc = quantize_rows(index)
    v_ref, i_ref = mips_topk_xla_int8(qi, sc, q, k, chunk_rows=256)
    v_sh, i_sh = sharded_mips_topk(qi, q, k, mesh, use_pallas=False,
                                   chunk_rows=256, doc_scales=sc)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_sh), rtol=1e-5)



@pytest.mark.parametrize("k", [2, 5, 8])
def test_two_phase_matches_bruteforce(k):
    """Two-phase exact search (chunk-max scan + scalar-prefetch rescan):
    identical results to brute force, including with index padding."""
    from multihop_dense_retrieval_tpu.ops.mips import mips_topk_two_phase

    rng = np.random.RandomState(13)
    n_pad, d, b = 1024, 32, 8
    n_valid = n_pad - 100
    index = np.zeros((n_pad, d), np.float32)
    index[:n_valid] = rng.randn(n_valid, d)
    q = jnp.asarray(rng.randn(b, d), jnp.float32)
    bv, bi = _brute(index[:n_valid], q, k)
    v, i = mips_topk_two_phase(jnp.asarray(index), q, k, chunk_rows=64,
                               interpret=True, n_valid=n_valid)
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(v), bv, rtol=1e-5)


def test_two_phase_int8_matches_single_pass():
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_two_phase, mips_topk_xla_int8, quantize_rows)

    rng = np.random.RandomState(14)
    n, d, b, k = 2048, 64, 8, 5
    emb = rng.randn(n, d).astype(np.float32)
    qi, sc = quantize_rows(jnp.asarray(emb))
    q = jnp.asarray(rng.randn(b, d), jnp.float32)
    v1, i1 = mips_topk_xla_int8(qi, sc, q, k, chunk_rows=512)
    v2, i2 = mips_topk_two_phase(qi, q, k, chunk_rows=128, interpret=True,
                                 doc_scales=sc)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-4)


def test_two_phase_dynamic_bound():
    from multihop_dense_retrieval_tpu.ops.mips import mips_topk_two_phase

    rng = np.random.RandomState(15)
    n, d, b, k = 512, 16, 8, 3
    index = np.zeros((n, d), np.float32)
    index[:300] = -np.abs(rng.randn(300, d)) - 0.01
    q = jnp.asarray(np.abs(rng.randn(b, d)) + 0.01, jnp.float32)
    v, i = mips_topk_two_phase(jnp.asarray(index), q, k, chunk_rows=64,
                               interpret=True, n_valid_dyn=jnp.int32(300))
    assert np.asarray(i).max() < 300
    assert np.all(np.asarray(v) < 0)


# ---- PCA-prefiltered search with exactness certificates -------------------


def _make_anisotropic(rng, n, d, r0=12, noise=0.02):
    """Low-rank-dominated rows: the spectrum concentration real encoder
    embeddings exhibit (CLS cone), which is what makes the prefilter pay."""
    basis = np.linalg.qr(rng.randn(d, d))[0]
    z = rng.randn(n, r0) * np.linspace(3.0, 0.8, r0)
    return (z @ basis[:, :r0].T + noise * rng.randn(n, d)).astype(np.float32)


def test_pca_certified_rows_match_bruteforce():
    """Soundness at k=4 on hard flat-spectrum-of-scores data (certified ⇒
    exact, whatever the rate), and a >=90% certification rate at k=1 with
    planted matches (the retrieval regime: top scores well separated)."""
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_pca, train_pca_rotation, build_pca_prefilter)

    rng = np.random.RandomState(21)
    n, d, b = 4096, 64, 16
    emb = _make_anisotropic(rng, n, d)
    rot = train_pca_rotation(emb[:1024], 32)
    proj, bounds = build_pca_prefilter(emb, rot, cand_rows=128)
    index = jnp.asarray(emb, jnp.bfloat16)
    bf = np.asarray(index, np.float32)

    def run(q, k):
        v, i, cert = mips_topk_pca(index, jnp.asarray(proj, jnp.bfloat16),
                                   jnp.asarray(rot), jnp.asarray(bounds),
                                   q, k, k_chunks=4, cand_rows=128,
                                   step_rows=512, interpret=True)
        # exact comparator with the SAME scoring (bf16 rows x bf16 queries)
        bv, bi = _brute(bf, np.asarray(q.astype(jnp.bfloat16), np.float32), k)
        cert = np.asarray(cert)
        for row in np.nonzero(cert)[0]:
            np.testing.assert_array_equal(np.asarray(i)[row], bi[row])
            np.testing.assert_allclose(np.asarray(v)[row], bv[row],
                                       rtol=1e-2, atol=1e-3)
        return cert

    run(jnp.asarray(_make_anisotropic(rng, b, d), jnp.float32), 4)
    planted = emb[rng.choice(n, b, replace=False)] \
        + 0.05 * rng.randn(b, d).astype(np.float32)
    cert = run(jnp.asarray(planted, jnp.float32), 1)
    assert cert.mean() >= 0.9, f"certification rate too low: {cert.mean()}"


def test_pca_full_rank_is_exact_everywhere():
    """R == D: zero residual, so every query certifies and matches exactly
    even on isotropic data."""
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_pca, train_pca_rotation, build_pca_prefilter)

    rng = np.random.RandomState(22)
    n, d, b, k = 2048, 32, 8, 2
    emb = rng.randn(n, d).astype(np.float32)
    rot = train_pca_rotation(emb, d)
    proj, bounds = build_pca_prefilter(emb, rot, cand_rows=128,
                                       store_dtype="float32")
    index = jnp.asarray(emb, jnp.float32)
    q = jnp.asarray(rng.randn(b, d), jnp.float32)
    v, i, cert = mips_topk_pca(index, jnp.asarray(proj, jnp.bfloat16),
                               jnp.asarray(rot), jnp.asarray(bounds),
                               q, k, k_chunks=8, cand_rows=128,
                               step_rows=512, interpret=True)
    for row in np.nonzero(np.asarray(cert))[0]:
        bv, bi = _brute(emb, np.asarray(q), k)
        np.testing.assert_array_equal(np.asarray(i)[row], bi[row])
    assert np.asarray(cert).mean() >= 0.8


def test_pca_isotropic_data_is_honestly_uncertified():
    """Isotropic gaussian rows at R << D: the prefilter CANNOT certify —
    the op must say so rather than silently degrade."""
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_pca, train_pca_rotation, build_pca_prefilter)

    rng = np.random.RandomState(23)
    n, d, b, k = 4096, 64, 8, 2
    emb = rng.randn(n, d).astype(np.float32)
    rot = train_pca_rotation(emb[:1024], 8)
    proj, bounds = build_pca_prefilter(emb, rot, cand_rows=128,
                                       store_dtype="float32")
    v, i, cert = mips_topk_pca(jnp.asarray(emb), jnp.asarray(proj, jnp.bfloat16),
                               jnp.asarray(rot), jnp.asarray(bounds),
                               jnp.asarray(rng.randn(b, d), jnp.float32),
                               k, k_chunks=4, cand_rows=128,
                               step_rows=512, interpret=True)
    assert np.asarray(cert).mean() <= 0.5


def test_pca_int8_certified_matches_int8_exact():
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_pca, mips_topk_xla_int8, quantize_rows,
        train_pca_rotation, build_pca_prefilter)

    rng = np.random.RandomState(24)
    n, d, b, k = 4096, 64, 8, 3
    emb = _make_anisotropic(rng, n, d)
    qi, sc = quantize_rows(jnp.asarray(emb))
    rot = train_pca_rotation(emb[:1024], 32)
    proj, bounds = build_pca_prefilter(emb, rot, cand_rows=128,
                                       scales=np.asarray(sc))
    k = 1  # planted-match regime (int8 query error needs real separation)
    planted = emb[rng.choice(n, b, replace=False)] \
        + 0.05 * rng.randn(b, d).astype(np.float32)
    q = jnp.asarray(planted, jnp.float32)
    v, i, cert = mips_topk_pca(qi, jnp.asarray(proj, jnp.bfloat16),
                               jnp.asarray(rot), jnp.asarray(bounds),
                               q, k, k_chunks=4, cand_rows=128,
                               step_rows=512, interpret=True, doc_scales=sc)
    bv, bi = mips_topk_xla_int8(qi, sc, q, k, chunk_rows=512)
    cert = np.asarray(cert)
    assert cert.mean() >= 0.75, f"certification rate too low: {cert.mean()}"
    for row in np.nonzero(cert)[0]:
        np.testing.assert_array_equal(np.asarray(i)[row],
                                      np.asarray(bi)[row])


def test_pca_padding_rows_never_returned():
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk_pca, train_pca_rotation, build_pca_prefilter)

    rng = np.random.RandomState(25)
    n_pad, d, b, k = 2048, 32, 8, 3
    n_valid = n_pad - 300
    emb = np.zeros((n_pad, d), np.float32)
    emb[:n_valid] = -np.abs(_make_anisotropic(rng, n_valid, d)) - 0.01
    rot = train_pca_rotation(emb[:n_valid], 16)
    proj, bounds = build_pca_prefilter(emb[:n_valid], rot, cand_rows=128,
                                       n_pad=n_pad, store_dtype="float32")
    q = jnp.asarray(np.abs(rng.randn(b - 1, d)) + 0.01, jnp.float32)
    # b-1 = 7 queries: the op pads the batch to a multiple of 8 internally
    v, i, cert = mips_topk_pca(jnp.asarray(emb), jnp.asarray(proj, jnp.bfloat16),
                               jnp.asarray(rot), jnp.asarray(bounds),
                               q, k, k_chunks=4, cand_rows=128,
                               step_rows=512, interpret=True,
                               n_valid=n_valid)
    assert v.shape == (b - 1, k) and cert.shape == (b - 1,)
    assert np.asarray(i).max() < n_valid
    assert np.all(np.asarray(v) < 0)


def test_pca_online_updates_keep_certificates_sound():
    """append/replace/delete_swap on an index with a prefilter: bounds only
    grow (max-in), so certificates issued afterwards remain sound — any
    certified query must still match brute force over the updated index."""
    from multihop_dense_retrieval_tpu.index import DenseIndex
    from multihop_dense_retrieval_tpu.ops.mips import mips_topk_pca

    rng = np.random.RandomState(26)
    n, d = 2048, 64
    emb = _make_anisotropic(rng, n, d)
    idx = DenseIndex.build(emb, chunk_rows=128, dtype=jnp.float32,
                           pca_dims=32, pca_cand_rows=128)
    # append planted rows into the tail padding region, then mutate
    new_rows = _make_anisotropic(rng, 8, d) * 2.0
    idx = idx.append(new_rows, chunk_rows=128)
    idx = idx.replace(5, _make_anisotropic(rng, 1, d)[0:1] * 1.5)
    idx, moved = idx.delete_swap(2)
    assert moved == idx.n_docs  # last doc moved into slot 2

    host = np.asarray(idx.vectors[: idx.n_docs], np.float32)
    # queries planted on the APPENDED rows (they live near the tail now)
    q = jnp.asarray(host[-6:] + 0.02 * rng.randn(6, d).astype(np.float32))
    q = jnp.concatenate([q, jnp.asarray(_make_anisotropic(rng, 2, d))])
    v, i, cert = mips_topk_pca(idx.vectors, idx.pca_proj, idx.pca_rot,
                               idx.pca_bounds, q, 2, k_chunks=4,
                               cand_rows=128, step_rows=128, interpret=True,
                               n_valid=idx.n_docs)
    bv, bi = _brute(host, np.asarray(q), 2)
    cert = np.asarray(cert)
    assert cert.any(), "no certificates at all after updates"
    for row in np.nonzero(cert)[0]:
        np.testing.assert_array_equal(np.asarray(i)[row], bi[row])


def test_sharded_pca_certified_matches_bruteforce():
    """sharded_mips_topk_pca on the 8-device mesh: per-shard prefilters,
    global ids, certificate = AND over shards — certified queries must
    match brute force; planted queries certify at high rate."""
    from multihop_dense_retrieval_tpu.ops.mips import (
        sharded_mips_topk_pca, train_pca_rotation, build_pca_prefilter)

    mesh = make_mesh()  # (1, 8)
    rng = np.random.RandomState(27)
    n, d, b, k = 8 * 512, 64, 16, 2
    emb = _make_anisotropic(rng, n, d)
    rot = train_pca_rotation(emb[:1024], 32)
    proj, bounds = build_pca_prefilter(emb, rot, cand_rows=128)
    planted = emb[rng.choice(n, b, replace=False)] \
        + 0.05 * rng.randn(b, d).astype(np.float32)
    q = jnp.asarray(planted, jnp.float32)
    index = jnp.asarray(emb, jnp.bfloat16)
    v, i, cert = sharded_mips_topk_pca(
        index, jnp.asarray(proj, jnp.bfloat16), jnp.asarray(rot),
        jnp.asarray(bounds), q, k, mesh, k_chunks=3, cand_rows=128,
        interpret=True)
    bf = np.asarray(index, np.float32)
    bv, bi = _brute(bf, np.asarray(q.astype(jnp.bfloat16), np.float32), k)
    cert = np.asarray(cert)
    assert cert.mean() >= 0.75, f"certification rate too low: {cert.mean()}"
    for row in np.nonzero(cert)[0]:
        np.testing.assert_array_equal(np.asarray(i)[row], bi[row])

    # padded tail + dynamic bound: pad rows must never surface
    n_valid = n - 300
    emb2 = emb.copy(); emb2[n_valid:] = 0.0
    proj2, bounds2 = build_pca_prefilter(emb2[:n_valid], rot, cand_rows=128,
                                         n_pad=n)
    v2, i2, _ = sharded_mips_topk_pca(
        jnp.asarray(emb2, jnp.bfloat16), jnp.asarray(proj2, jnp.bfloat16),
        jnp.asarray(rot), jnp.asarray(bounds2), q, k, mesh, k_chunks=3,
        cand_rows=128, n_valid_dyn=jnp.int32(n_valid), interpret=True)
    assert np.asarray(i2).max() < n_valid


def test_pallas_k_exceeding_chunk_fails_loud_and_dispatcher_falls_back():
    """k > chunk_rows used to silently return chunk_rows columns (review
    r3); the kernels now raise and the dispatcher routes to the XLA tier."""
    import pytest
    from multihop_dense_retrieval_tpu.ops.mips import (
        mips_topk, mips_topk_pallas, mips_topk_pallas_int8, quantize_rows)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1024, 32).astype(np.float32))
    q = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    with pytest.raises(ValueError, match="exceeds chunk_rows"):
        mips_topk_pallas(x, q, k=600, chunk_rows=512, interpret=True)
    xi, sc = quantize_rows(x)
    with pytest.raises(ValueError, match="exceeds chunk_rows"):
        mips_topk_pallas_int8(xi, sc, q, k=600, chunk_rows=512,
                              interpret=True)
    # dispatcher: same request routes to the exact XLA tier instead
    vals, idx = mips_topk(x, q, k=600, chunk_rows=512, interpret=True)
    assert idx.shape == (4, 600)
    ref_i = np.argsort(-np.asarray(x @ q.T).T, axis=1, kind="stable")[:, :600]
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_make_mesh_rejects_oversized_axes():
    import pytest
    from multihop_dense_retrieval_tpu.core.mesh import make_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="does not fit"):
        make_mesh(index=n * 2)          # floor-divided data to 0 before
    with pytest.raises(ValueError, match="does not fit"):
        make_mesh(data=n, index=2)
    m = make_mesh(data=2, index=1)      # strict subset stays allowed
    assert m.shape == {"data": 2, "index": 1}
