"""Native HNSW index tests: build, recall vs exact, persistence."""

import numpy as np
import pytest

from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex


@pytest.fixture(scope="module")
def built():
    rng = np.random.RandomState(0)
    n, d = 2000, 64
    data = rng.randn(n, d).astype(np.float32)
    idx = HNSWIndex(d, M=16, ef_construction=100, seed=0)
    idx.add(data)
    return idx, data


def test_build_and_size(built):
    idx, data = built
    assert len(idx) == 2000


def test_recall_vs_exact(built):
    idx, data = built
    rng = np.random.RandomState(1)
    q = rng.randn(50, 64).astype(np.float32)
    scores, ids = idx.search(q, k=10, ef_search=128)
    exact = q @ data.T
    exact_ids = np.argsort(-exact, axis=1)[:, :10]
    recall = np.mean([len(set(ids[i]) & set(exact_ids[i])) / 10
                      for i in range(50)])
    assert recall >= 0.85, f"HNSW recall@10 too low: {recall}"
    # scores are true inner products of the returned ids
    for i in range(5):
        for j in range(10):
            assert scores[i, j] == pytest.approx(exact[i, ids[i, j]], rel=1e-4)
    # results sorted best-first
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_self_retrieval(built):
    idx, data = built
    scores, ids = idx.search(data[:20] * 10.0, k=1, ef_search=64)
    assert (ids[:, 0] == np.arange(20)).mean() >= 0.9


def test_save_load_roundtrip(built, tmp_path):
    idx, data = built
    path = str(tmp_path / "test.hnsw")
    idx.save(path)
    idx2 = HNSWIndex.load(path)
    assert len(idx2) == len(idx)
    rng = np.random.RandomState(2)
    q = rng.randn(5, 64).astype(np.float32)
    s1, i1 = idx.search(q, k=5)
    s2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)
