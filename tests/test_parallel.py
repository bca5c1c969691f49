"""Tensor-parallel sharding tests: TP train step matches unsharded math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import (
    EncoderConfig, RetrieverTrainConfig)
from multihop_dense_retrieval_tpu.core.mesh import make_mesh
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.parallel.sharding import (
    encoder_param_specs, shard_params)
from multihop_dense_retrieval_tpu.train import trainer as T
from tests import synth


def _model_and_batch():
    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4,
                             intermediate_size=64, max_position_embeddings=40)
    model = MhopRetriever(cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 250, size=(8, 16)).astype(np.int32)
    batch = {}
    for k in ("q", "q_sp", "c1", "c2", "neg1", "neg2"):
        batch[f"{k}_input_ids"] = jnp.asarray(ids)
        batch[f"{k}_mask"] = jnp.ones((8, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_param_specs_shapes():
    model, params, _ = _model_and_batch()
    mesh = make_mesh(data=2, index=4)
    specs = encoder_param_specs(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    # at least the FFN + qkv kernels must be sharded over `index`
    sharded = [p for p, s in flat if "index" in str(s.spec)]
    assert len(sharded) >= 2 * 4  # 2 layers x (qkv, out, ffn-in, ffn-out)...
    sharded_params = shard_params(params, mesh)
    # shapes unchanged
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(sharded_params)):
        assert a.shape == b.shape


def test_tp_train_step_matches_unsharded():
    model, params, batch = _model_and_batch()
    cfg_t = RetrieverTrainConfig(warmup_ratio=0.0, learning_rate=1e-3)
    tx = T.make_optimizer(cfg_t, 10)

    # Attention KEY biases have an exactly-zero true gradient (a constant
    # shift of every key is softmax-invariant) — prove it rather than assume
    # it (computed BEFORE the steps: they donate+delete the param buffers).
    from multihop_dense_retrieval_tpu.train import losses

    def loss_fn(p):
        return losses.mhop_loss(model.apply(p, batch))

    grads = jax.grad(loss_fn)(params)
    grad_leaves = jax.tree_util.tree_leaves_with_path(grads)
    gmax = max(float(jnp.max(jnp.abs(g))) for _, g in grad_leaves)
    key_bias_seen = 0
    for path, g in grad_leaves:
        if "key" in jax.tree_util.keystr(path) and "bias" in \
                jax.tree_util.keystr(path):
            key_bias_seen += 1
            assert float(jnp.max(jnp.abs(g))) < 1e-6 * max(gmax, 1.0), \
                f"key bias grad not ~0: {jax.tree_util.keystr(path)}"
    assert key_bias_seen >= 2  # one per layer in the tiny config

    s0 = T.TrainState.create(params, tx)
    base_step = T.make_train_step(model, tx)
    s1, loss1 = base_step(s0, batch)

    mesh = make_mesh(data=2, index=4)
    s0tp = T.TrainState.create(params, tx)
    tp_step = T.make_train_step(model, tx, mesh=mesh, tensor_parallel=True)
    s2, loss2 = tp_step(s0tp, batch)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)

    # Compare ALL leaves (no exclusions): key biases with an atol bounded by
    # the Adam update magnitude (Adam normalizes ulp-sized grads of a
    # zero-gradient leaf to ±lr steps — proven zero above), the rest tightly.
    lr = 1e-3
    for (path, x), (_, y) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params)):
        is_key_bias = ("key" in jax.tree_util.keystr(path)
                       and "bias" in jax.tree_util.keystr(path))
        atol = 2.5 * lr if is_key_bias else 2e-4
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=atol,
                                   err_msg=jax.tree_util.keystr(path))
