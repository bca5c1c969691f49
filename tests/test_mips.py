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
