"""Preemption resume: a trainer killed after epoch 0 resumes at epoch 1 with
identical state."""

import numpy as np
import jax.numpy as jnp

from multihop_dense_retrieval_tpu.core.config import (
    EncoderConfig, RetrieverTrainConfig)
from multihop_dense_retrieval_tpu.data import HashTokenizer, MhopDataset, BatchLoader
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.train.trainer import RetrieverTrainer
from tests import synth


def _setup(tmp_path, num_epochs):
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(0)
    docs = synth.make_corpus(rng, 32)
    rows = synth.make_mhop_rows(rng, docs, n_rows=8)
    synth.write_jsonl(tmp_path / "t.jsonl", rows)
    kw = dict(max_q_len=12, max_q_sp_len=32, max_c_len=24)
    ds = MhopDataset(tok, str(tmp_path / "t.jsonl"), train=True, **kw)
    ev = MhopDataset(tok, str(tmp_path / "t.jsonl"), **kw)
    import jax
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=48)
    model = MhopRetriever(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids,
                        method=model.encode_seq)
    tcfg = RetrieverTrainConfig(batch_size=4, num_epochs=num_epochs,
                                learning_rate=1e-4, warmup_ratio=0.0)
    return model, tcfg, params, \
        BatchLoader(ds, 4, shuffle=True, seed=1, num_workers=1), \
        BatchLoader(ev, 4, num_workers=1)


def test_resume_after_interrupt(tmp_path):
    out = str(tmp_path / "out")
    model, tcfg, params, tl, el = _setup(tmp_path, num_epochs=1)
    t1 = RetrieverTrainer(model, tcfg, tl, el, init_params=params,
                          output_dir=out, log_fn=lambda *_: None)
    t1.run()  # completes epoch 0, saves preempt state
    step_after_e0 = int(t1.state.step)

    # new process equivalent: fresh trainer with 2 epochs resumes at epoch 1
    model, tcfg2, params, tl, el = _setup(tmp_path, num_epochs=2)
    logs = []
    t2 = RetrieverTrainer(model, tcfg2, tl, el, init_params=params,
                          output_dir=out, log_fn=logs.append)
    t2.run()
    assert any("resumed from epoch 0" in l for l in logs)
    # ran exactly one more epoch on top of the restored state
    assert int(t2.state.step) == 2 * step_after_e0
