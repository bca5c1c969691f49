"""Training loop tests: loss decreases on a learnable synthetic task, the
momentum stage maintains its queue correctly, data-parallel steps match
single-device, and checkpoints roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import (
    EncoderConfig, RetrieverTrainConfig)
from multihop_dense_retrieval_tpu.core.mesh import make_mesh
from multihop_dense_retrieval_tpu.data import HashTokenizer, MhopDataset, BatchLoader
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.train import trainer as T
from tests import synth


def _make_loaders(tmp_path, tok, n_rows=16, bs=4):
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 64)
    rows = synth.make_mhop_rows(rng, docs, n_rows=n_rows)
    synth.write_jsonl(tmp_path / "train.jsonl", rows)
    synth.write_jsonl(tmp_path / "dev.jsonl", rows[:8])
    kw = dict(max_q_len=16, max_q_sp_len=48, max_c_len=32)
    train_ds = MhopDataset(tok, str(tmp_path / "train.jsonl"), train=True, **kw)
    eval_ds = MhopDataset(tok, str(tmp_path / "dev.jsonl"), **kw)
    return (BatchLoader(train_ds, bs, shuffle=True, seed=1, num_workers=1),
            BatchLoader(eval_ds, bs, shuffle=False, num_workers=1))


def _tiny_model_and_params():
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64)
    model = MhopRetriever(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids, method=model.encode_seq)
    return cfg, model, params


def test_training_reduces_loss_and_saves_best(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    train_loader, eval_loader = _make_loaders(tmp_path, tok)
    cfg_t = RetrieverTrainConfig(batch_size=4, num_epochs=4,
                                 learning_rate=1e-3, warmup_ratio=0.1)
    _, model, params = _tiny_model_and_params()
    out_dir = str(tmp_path / "out")
    tr = T.RetrieverTrainer(model, cfg_t, train_loader, eval_loader,
                            init_params=params, output_dir=out_dir,
                            log_fn=lambda *_: None)

    # capture first-epoch loss trajectory
    first_losses = []
    orig_step = tr.train_step
    def wrapped(state, batch):
        state, loss = orig_step(state, batch)
        first_losses.append(float(loss))
        return state, loss
    tr.train_step = wrapped
    result = tr.run()

    assert np.mean(first_losses[-4:]) < np.mean(first_losses[:4])
    assert result["best_mrr"] > 0
    from multihop_dense_retrieval_tpu.core import checkpoint as ckpt
    restored = ckpt.restore_pytree(f"{out_dir}/checkpoint_best")
    chex_like = jax.tree_util.tree_structure(restored)
    assert chex_like == jax.tree_util.tree_structure(tr.state.params)


def test_data_parallel_step_matches_single_device(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    train_loader, _ = _make_loaders(tmp_path, tok, n_rows=8, bs=8)
    _, model, params = _tiny_model_and_params()
    cfg_t = RetrieverTrainConfig(batch_size=8, num_epochs=1)
    tx = T.make_optimizer(cfg_t, 10)
    batch = next(iter(train_loader))
    batch.pop("valid")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    s0 = T.TrainState.create(params, tx)
    step_single = T.make_train_step(model, tx)
    s1, loss1 = step_single(s0, batch)

    mesh = make_mesh(data=8, index=1)
    s0m = T.TrainState.create(params, tx)
    step_dp = T.make_train_step(model, tx, mesh=mesh)
    s2, loss2 = step_dp(s0m, batch)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)


def test_momentum_step_queue_and_frozen_key_encoder(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    train_loader, _ = _make_loaders(tmp_path, tok, n_rows=8, bs=4)
    cfg, model, params = _tiny_model_and_params()
    cfg_t = RetrieverTrainConfig(batch_size=4, momentum=True, queue_size=32,
                                 warmup_ratio=0.0)
    tx = T.make_optimizer(cfg_t, 10)
    state = T.MomentumTrainState.create(params, tx, queue_size=32,
                                        hidden=cfg.hidden_size)
    step = T.make_momentum_train_step(model, tx)
    batch = next(iter(train_loader))
    batch.pop("valid")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    q0 = np.asarray(state.queue)
    new_state, loss = step(state, batch)
    assert np.isfinite(float(loss))
    # queue rows 0..7 replaced by the batch's c1;c2 key-encoder embeddings
    q1 = np.asarray(new_state.queue)
    assert int(new_state.queue_ptr) == 8
    assert not np.allclose(q1[:8], q0[:8])
    np.testing.assert_array_equal(q1[8:], q0[8:])
    # key encoder unchanged (EMA disabled, matching the shipped reference)
    for x, y in zip(jax.tree_util.tree_leaves(state.params_k),
                    jax.tree_util.tree_leaves(new_state.params_k)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # query encoder DID update
    diffs = [not np.allclose(np.asarray(x), np.asarray(y))
             for x, y in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(new_state.params))]
    assert any(diffs)


def test_unified_train_step(tmp_path):
    tok = HashTokenizer(vocab_size=512)
    from multihop_dense_retrieval_tpu.models import UnifiedRetriever
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64)
    model = UnifiedRetriever(cfg)
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 32)
    rows = synth.make_mhop_rows(rng, docs, n_rows=4)
    synth.write_jsonl(tmp_path / "t.jsonl", rows)
    ds = MhopDataset(tok, str(tmp_path / "t.jsonl"), max_q_len=16,
                     max_q_sp_len=48, max_c_len=32)
    loader = BatchLoader(ds, 4, num_workers=1)
    batch = next(iter(loader))
    batch.pop("valid")
    batch["stop_targets"] = np.array([1, 0, 1, 1], np.int32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch)
    cfg_t = RetrieverTrainConfig(batch_size=4, unified=True)
    tx = T.make_optimizer(cfg_t, 10)
    state = T.TrainState.create(params, tx)
    step = T.make_train_step(model, tx, unified=True)
    new_state, loss = step(state, batch)
    assert np.isfinite(float(loss))
    ev = T.make_eval_step(model, unified=True)
    out = ev(new_state.params, batch)
    assert out["stop_acc"].shape == (4,)


def test_gradient_accumulation(tmp_path):
    """N micro-batches with accumulation == params unchanged until step N."""
    tok = HashTokenizer(vocab_size=512)
    train_loader, _ = _make_loaders(tmp_path, tok, n_rows=8, bs=4)
    _, model, params = _tiny_model_and_params()
    cfg_t = RetrieverTrainConfig(batch_size=4, gradient_accumulation=2,
                                 warmup_ratio=0.0, learning_rate=1e-3)
    tx = T.make_optimizer(cfg_t, 10)
    state = T.TrainState.create(params, tx)
    step = T.make_train_step(model, tx)
    it = iter(train_loader)
    b1 = next(it); b1.pop("valid")
    b2 = next(it); b2.pop("valid")
    b1 = {k: jnp.asarray(v) for k, v in b1.items()}
    b2 = {k: jnp.asarray(v) for k, v in b2.items()}
    state1, _ = step(state, b1)
    # after micro-step 1: params must be UNCHANGED
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    state2, _ = step(state1, b2)
    # after micro-step 2: params updated
    changed = any(not np.allclose(np.asarray(x), np.asarray(y))
                  for x, y in zip(jax.tree_util.tree_leaves(params),
                                  jax.tree_util.tree_leaves(state2.params)))
    assert changed
