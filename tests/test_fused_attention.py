"""Fused short-sequence attention (ops/fused_attention.py): kernel parity
vs the einsum reference, and whole-encoder equivalence of
attention_impl="fused" vs the default XLA path (interpret mode on CPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.models.encoder import TransformerEncoder
from multihop_dense_retrieval_tpu.ops.fused_attention import fused_attention


def _ref(q, k, v, mask, nh):
    b, wq, h = q.shape
    w = k.shape[1]
    d = h // nh
    qh = q.reshape(b, wq, nh, d)
    kh = k.reshape(b, w, nh, d)
    vh = v.reshape(b, w, nh, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(d)
    bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, -1e9)
    p = jax.nn.softmax(s + bias, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, wq, h)


@pytest.mark.parametrize("b,wq,w,nh,d,bb", [
    (4, 24, 24, 4, 8, 0),    # square self-attention, auto block
    (4, 1, 24, 4, 8, 0),     # cls_only last layer (q_len=1)
    (8, 16, 16, 2, 8, 2),    # explicit batch block
    (3, 8, 8, 2, 8, 0),      # batch not divisible by 2 → bb=1
    (2, 16, 16, 2, 64, 0),   # head-pair kernel (2*d == 128 lanes)
    (2, 1, 16, 4, 64, 0),    # head-pair kernel, cls_only q_len=1
])
def test_fused_attention_matches_einsum(b, wq, w, nh, d, bb):
    h = nh * d
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, wq, h), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, w, h), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, w, h), jnp.float32)
    lens = np.arange(b) % w + max(1, w // 2)
    mask = jnp.asarray((np.arange(w)[None] < lens[:, None]).astype(np.int32))
    out = fused_attention(q, k, v, mask, nh, interpret=True, block_b=bb)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref(q, k, v, mask, nh)),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cls_only", [False, True])
def test_encoder_fused_matches_xla(cls_only):
    cfg_x = EncoderConfig.tiny()
    cfg_f = EncoderConfig.tiny(attention_impl="fused")
    ids = jnp.array([[5, 9, 3, 7, 2, 11, 4, 6], [8, 4, 9, 1, 1, 1, 1, 1]],
                    jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0, 0, 0]],
                     jnp.int32)
    xla = TransformerEncoder(cfg_x, cls_only=cls_only)
    fused = TransformerEncoder(cfg_f, cls_only=cls_only)
    params = xla.init(jax.random.PRNGKey(0), ids, mask)
    out_x = np.asarray(xla.apply(params, ids, mask))
    out_f = np.asarray(fused.apply(params, ids, mask))
    assert out_f.shape == out_x.shape
    # compare only non-pad positions (pad rows are never consumed)
    np.testing.assert_allclose(out_f[0], out_x[0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out_f[1, :3], out_x[1, :3],
                               atol=1e-5, rtol=1e-5)


def test_explicit_block_b_must_divide_batch():
    """A hand-tuned non-divisor block_b used to floor the grid and leave
    the last B % block_b output rows unwritten (uninitialized memory)."""
    import pytest
    from multihop_dense_retrieval_tpu.ops.fused_attention import fused_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(10, 16, 128).astype(np.float32))
    kv = jnp.asarray(rng.randn(10, 16, 128).astype(np.float32))
    mask = jnp.ones((10, 16), jnp.int32)
    with pytest.raises(ValueError, match="block_b"):
        fused_attention(q, kv, kv, mask, num_heads=2, block_b=4,
                        interpret=True)
