"""Online DenseIndex updates (index/store.py append/replace/delete_swap):
the FAISS `index.add` / `remove_ids` serving story
(eval_mhop_retrieval.py:121-122), TPU-native via donated slice updates.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.index.store import DenseIndex
from multihop_dense_retrieval_tpu.ops.mips import mips_topk

D = 16


def _vecs(rng, n):
    x = rng.randn(n, D).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _top1(idx, queries):
    _, ids = mips_topk(idx.vectors, jnp.asarray(queries), 1,
                       use_pallas=False, n_valid=idx.n_docs,
                       doc_scales=idx.scales)
    return np.asarray(ids)[:, 0]


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_append_within_padding_and_growth(dtype):
    rng = np.random.RandomState(0)
    base = _vecs(rng, 20)
    idx = DenseIndex.build(base, chunk_rows=16,
                           dtype=jnp.dtype(dtype))  # pad 32
    assert idx.vectors.shape[0] == 32

    extra = _vecs(rng, 8)
    idx = idx.append(extra, chunk_rows=16)
    assert idx.n_docs == 28
    assert idx.vectors.shape[0] == 32          # landed in existing padding
    # every appended doc retrieves itself
    np.testing.assert_array_equal(_top1(idx, extra), np.arange(20, 28))
    # the original docs are untouched
    np.testing.assert_array_equal(_top1(idx, base[:5]), np.arange(5))

    more = _vecs(rng, 10)                      # 28 + 10 > 32: must grow
    idx = idx.append(more, chunk_rows=16)
    assert idx.n_docs == 38
    assert idx.vectors.shape[0] == 48
    np.testing.assert_array_equal(_top1(idx, more), np.arange(28, 38))
    if dtype == "int8":
        assert idx.scales.shape[0] == 48


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_replace_and_delete_swap(dtype):
    rng = np.random.RandomState(1)
    base = _vecs(rng, 12)
    idx = DenseIndex.build(base, chunk_rows=16, dtype=jnp.dtype(dtype))

    new3 = _vecs(rng, 1)
    idx = idx.replace(3, new3)
    assert _top1(idx, new3)[0] == 3
    assert _top1(idx, base[3:4])[0] != 3 or np.allclose(base[3], new3)

    # delete doc 2: the last doc (11) moves into slot 2
    idx, moved = idx.delete_swap(2)
    assert moved == 11
    assert idx.n_docs == 11
    assert _top1(idx, base[11:12])[0] == 2     # swapped doc at its new id
    # deleted doc's vector is unreachable (slot now holds doc 11)
    assert _top1(idx, base[2:3])[0] != 2 or np.allclose(base[2], base[11])

    # deleting the (new) last doc moves nothing
    idx, moved = idx.delete_swap(idx.n_passages - 1)
    assert moved is None
    assert idx.n_docs == 10


def test_multivector_group_updates():
    rng = np.random.RandomState(2)
    base = _vecs(rng, 8)                       # 4 docs x 2 vectors
    idx = DenseIndex.build(base, chunk_rows=16, multi_vector=2)
    assert idx.n_passages == 4

    extra = _vecs(rng, 2)                      # one new doc (2 rows)
    idx = idx.append(extra, chunk_rows=16)
    assert idx.n_passages == 5
    # row-level top1 of each new vector is its own row
    np.testing.assert_array_equal(_top1(idx, extra), [8, 9])

    idx, moved = idx.delete_swap(0)            # doc 4's rows move to rows 0-1
    assert moved == 4
    assert idx.n_passages == 4
    np.testing.assert_array_equal(_top1(idx, extra), [0, 1])

    with pytest.raises(AssertionError):
        idx.append(_vecs(rng, 3), chunk_rows=16)   # not whole documents
