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


def test_token_queue_momentum_step():
    """Single-hop token-queue momentum (MomentumRetriever parity): the queue
    stores raw context TOKENS, is re-encoded with the CURRENT encoder under
    stop_gradient each step, and the batch's context tokens are enqueued
    after the update."""
    from multihop_dense_retrieval_tpu.models import SingleRetriever
    from multihop_dense_retrieval_tpu.train import losses

    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4,
                             intermediate_size=64, max_position_embeddings=40)
    model = SingleRetriever(cfg, shared=True)
    rng = np.random.RandomState(0)
    b, lb, lq = 4, 12, 20

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        out = {}
        for k in ("q", "c", "neg"):
            out[f"{k}_input_ids"] = jnp.asarray(
                r.randint(5, 250, size=(b, lb)).astype(np.int32))
            out[f"{k}_mask"] = jnp.ones((b, lb), jnp.int32)
        return out

    batch = mk_batch(1)
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = T.make_optimizer(RetrieverTrainConfig(warmup_ratio=0.0,
                                               learning_rate=1e-3), 20)
    state = T.TokenQueueTrainState.create(params, tx, queue_size=8,
                                          max_c_len=lq, cls_id=0, sep_id=2)
    step = T.make_single_momentum_train_step(model, tx)

    # bit-check the first step's loss against a manual replication
    queue_c = model.apply(params, state.queue_ids, state.queue_mask,
                          state.queue_type, method=model.encode_ctx)
    expected = float(losses.single_loss(model.apply(params, batch),
                                        queue_c=queue_c))
    state1, loss1 = step(state, batch)
    assert float(loss1) == pytest.approx(expected, rel=1e-6)

    # enqueue semantics: rows 0..3 now hold the batch c tokens, width-padded
    assert int(state1.queue_ptr) == b
    got_ids = np.asarray(state1.queue_ids[:b])
    np.testing.assert_array_equal(got_ids[:, :lb],
                                  np.asarray(batch["c_input_ids"]))
    assert (got_ids[:, lb:] == 0).all()
    np.testing.assert_array_equal(np.asarray(state1.queue_mask[:b, lb:]), 0)

    # training progresses (re-encoded queue as negatives, loss finite + down)
    losses_seen = [float(loss1)]
    for i in range(5):
        state1, loss = step(state1, mk_batch(1))
        losses_seen.append(float(loss))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0]
    # queue wrapped (8 slots, 4 enqueued per step)
    assert int(state1.queue_ptr) == (b * 6) % 8


def test_nq_momentum_composition():
    """BertNQMomentumRetriever parity by composition
    (unified_retriever.py:114-180): NQRetriever + MomentumTrainState +
    make_momentum_train_step(task='nq') — queries through the trained
    encoder, contexts through the FROZEN key encoder, embedding-queue
    negatives in the recovery loss, c embeddings enqueued."""
    from multihop_dense_retrieval_tpu.models import NQRetriever
    from multihop_dense_retrieval_tpu.train import losses

    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4,
                             intermediate_size=64, max_position_embeddings=40)
    model = NQRetriever(cfg)
    rng = np.random.RandomState(0)
    b, l = 4, 12
    batch = {}
    for k in ("q", "q_neg1", "c", "neg"):
        batch[f"{k}_input_ids"] = jnp.asarray(
            rng.randint(5, 250, size=(b, l)).astype(np.int32))
        batch[f"{k}_mask"] = jnp.ones((b, l), jnp.int32)
    params = model.init(jax.random.PRNGKey(0),
                        batch["q_input_ids"], batch["q_mask"],
                        method=model.encode_seq)
    tx = T.make_optimizer(RetrieverTrainConfig(warmup_ratio=0.0,
                                               learning_rate=1e-3), 20)
    state = T.MomentumTrainState.create(
        jax.tree_util.tree_map(jnp.copy, params), tx, queue_size=16,
        hidden=cfg.hidden_size)
    step = T.make_momentum_train_step(model, tx, task="nq")

    # bit-check the loss against a manual replication
    ctx = {k: model.apply(state.params_k, batch[f"{k}_input_ids"],
                          batch[f"{k}_mask"], method=model.encode_seq)
           for k in ("c", "neg")}
    qs = {k: model.apply(state.params, batch[f"{k}_input_ids"],
                         batch[f"{k}_mask"], method=model.encode_seq)
          for k in ("q", "q_neg1")}
    expected = float(losses.nq_mhop_loss({**ctx, **qs}, queue=state.queue))
    expected_c = np.asarray(ctx["c"])

    state1, loss = step(state, batch)
    assert float(loss) == pytest.approx(expected, rel=1e-5)
    # key encoder frozen (no EMA by default)
    for a, bb in zip(jax.tree_util.tree_leaves(params),
                     jax.tree_util.tree_leaves(state1.params_k)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    # c embeddings (from the KEY encoder) enqueued at ptr 0
    assert int(state1.queue_ptr) == b
    np.testing.assert_allclose(np.asarray(state1.queue[:b]), expected_c,
                               rtol=1e-4, atol=1e-5)
    # second step trains (params moved, loss finite)
    state2, loss2 = step(state1, batch)
    assert np.isfinite(float(loss2))
    moved = any(not np.array_equal(np.asarray(x), np.asarray(y))
                for x, y in zip(jax.tree_util.tree_leaves(state1.params),
                                jax.tree_util.tree_leaves(state2.params)))
    assert moved


def test_gradient_accumulation_with_remat_matches_averaged_grads():
    """optax.MultiSteps(k) + --remat (the one-chip reference-budget recipe,
    train_mhop.py:168-190 parity): k micro-steps must produce exactly ONE
    optimizer update from the AVERAGE of the k micro-gradients, with params
    frozen until the k-th call."""
    from multihop_dense_retrieval_tpu.train.losses import mhop_loss

    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4,
                             intermediate_size=64, max_position_embeddings=40)
    rng = np.random.RandomState(0)

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        b = {}
        for k in ("q", "q_sp", "c1", "c2", "neg1", "neg2"):
            b[f"{k}_input_ids"] = jnp.asarray(
                r.randint(5, 250, size=(4, 16)).astype(np.int32))
            b[f"{k}_mask"] = jnp.ones((4, 16), jnp.int32)
        return b

    micro = [mk_batch(s) for s in range(3)]
    model = MhopRetriever(cfg, remat=True)
    params = model.init(jax.random.PRNGKey(0), micro[0])

    tcfg = RetrieverTrainConfig(warmup_ratio=0.0, learning_rate=1e-3,
                                gradient_accumulation=3)
    tx = T.make_optimizer(tcfg, 10)
    state = T.TrainState.create(params, tx)
    step = T.make_train_step(model, tx)
    for i, b in enumerate(micro):
        prev = state
        state, loss = step(state, b)
        assert np.isfinite(float(loss))
        if i < 2:  # params must not move before the k-th micro step
            for x, y in zip(jax.tree_util.tree_leaves(prev.params),
                            jax.tree_util.tree_leaves(state.params)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # oracle: one plain-optimizer update from the mean micro-gradient
    plain_tx = T.make_optimizer(
        RetrieverTrainConfig(warmup_ratio=0.0, learning_rate=1e-3), 10)
    grads = [jax.grad(lambda p: mhop_loss(model.apply(p, b)))(params)
             for b in micro]
    mean_g = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *grads)
    import optax
    upd, _ = plain_tx.update(mean_g, plain_tx.init(params), params)
    expect = optax.apply_updates(params, upd)
    # where the true mean gradient is ~0 (key biases exactly, by softmax
    # shift-invariance), Adam's first step is ±lr·sign(ulp noise) and the
    # two paths may disagree by up to 2·lr — bound those ELEMENTS by the
    # update magnitude, compare everything else tightly (same treatment as
    # test_remat_train_step_matches_plain)
    lr = 1e-3
    for (path, a), (_, b), g in zip(
            jax.tree_util.tree_leaves_with_path(expect),
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves(mean_g)):
        a, b, g = np.asarray(a), np.asarray(b), np.abs(np.asarray(g))
        tiny = g < 1e-6
        name = jax.tree_util.keystr(path)
        assert np.abs(a - b)[tiny].max(initial=0.0) <= 2.5 * lr, name
        np.testing.assert_allclose(np.where(tiny, 0.0, a),
                                   np.where(tiny, 0.0, b),
                                   rtol=2e-4, atol=2e-6, err_msg=name)


def test_remat_train_step_matches_plain():
    """--remat (per-layer jax.checkpoint) changes memory, not math: same
    loss and same updated params as the plain step."""
    cfg = EncoderConfig.tiny(vocab_size=256, hidden_size=32, num_heads=4,
                             intermediate_size=64, max_position_embeddings=40)
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 250, size=(4, 16)).astype(np.int32)
    batch = {}
    for k in ("q", "q_sp", "c1", "c2", "neg1", "neg2"):
        batch[f"{k}_input_ids"] = jnp.asarray(ids)
        batch[f"{k}_mask"] = jnp.ones((4, 16), jnp.int32)
    tx = T.make_optimizer(RetrieverTrainConfig(warmup_ratio=0.0,
                                               learning_rate=1e-3), 10)
    results = []
    for remat in (False, True):
        model = MhopRetriever(cfg, remat=remat)
        params = model.init(jax.random.PRNGKey(0), batch)
        state = T.TrainState.create(params, tx)
        state, loss = T.make_train_step(model, tx)(state, batch)
        results.append((float(loss), state.params, model, params))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    # Adam's FIRST step moves every parameter by ~±lr·sign(g): where the
    # true gradient is ~0 (key biases exactly, by softmax shift-invariance;
    # scattered elements elsewhere), remat-vs-plain jit fusion ulps can flip
    # the sign and shift the update by up to 2·lr.  Gradients themselves
    # agree bitwise outside jit (verified), so bound those ELEMENTS by the
    # update magnitude and stay tight everywhere else.
    from multihop_dense_retrieval_tpu.train.losses import mhop_loss
    model0, params0 = results[0][2], results[0][3]
    ref_grads = jax.grad(lambda p: mhop_loss(model0.apply(p, batch)))(params0)
    lr = 1e-3
    for (path, a), (_, b), g in zip(
            jax.tree_util.tree_leaves_with_path(results[0][1]),
            jax.tree_util.tree_leaves_with_path(results[1][1]),
            jax.tree_util.tree_leaves(ref_grads)):
        a, b, g = np.asarray(a), np.asarray(b), np.abs(np.asarray(g))
        diff = np.abs(a - b)
        tiny = g < 1e-6
        name = jax.tree_util.keystr(path)
        assert diff[tiny].max(initial=0.0) <= 2.5 * lr, name
        np.testing.assert_allclose(np.where(tiny, 0.0, a),
                                   np.where(tiny, 0.0, b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_no_decay_mask_excludes_every_bias_and_norm_scale():
    """_no_decay_mask matches norms by NAME substring (train/trainer.py) —
    this pins it structurally instead: in flax, 'scale' leaves only come
    from normalization layers and 'bias' leaves never get decay
    (reference no-decay groups, train_mhop.py:125).  A future module whose
    norm isn't named *layer_norm* would silently get weight decay; its
    'scale' leaf fails here."""
    import jax
    from multihop_dense_retrieval_tpu.models import (MhopRetriever,
                                                     UnifiedRetriever)
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train.trainer import _no_decay_mask

    def check(model, init_kwargs):
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, **init_kwargs)
        mask = _no_decay_mask(params)
        flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_m = jax.tree_util.tree_leaves(mask)
        assert len(flat_p) == len(flat_m)
        n_scale = n_bias = 0
        for (path, _), decays in zip(flat_p, flat_m):
            name = str(getattr(path[-1], "key", getattr(path[-1], "name",
                                                        path[-1])))
            if name == "bias":
                n_bias += 1
                assert not decays, f"bias got weight decay: {path}"
            elif name == "scale":
                n_scale += 1
                assert not decays, f"norm scale got weight decay: {path}"
            else:
                assert decays, f"non-bias/non-norm leaf excluded: {path}"
        # the walk must have actually seen norms and biases
        assert n_scale >= 4 and n_bias >= 4, (n_scale, n_bias)

    ids = jnp.ones((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    enc = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64)
    m = MhopRetriever(enc)
    check(m, dict(input_ids=ids, mask=mask, method=m.encode_seq))
    u = UnifiedRetriever(enc)
    check(u, dict(input_ids=ids, mask=mask, method=u.encode_seq))
    bert = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=64,
                              type_vocab_size=2, pad_token_id=0,
                              roberta_positions=False)
    check(QAReader(bert, sp_pred=True),
          dict(batch={"input_ids": ids, "attention_mask": mask,
                      "token_type_ids": jnp.zeros((2, 16), jnp.int32),
                      "paragraph_mask": mask, "sent_offsets":
                          jnp.zeros((2, 4), jnp.int32)}))
