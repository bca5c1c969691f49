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


def test_resume_replays_data_order(tmp_path):
    """The preempt meta carries the loader's RNG state: a resumed run sees
    the SAME epoch-1 shuffle an uninterrupted 2-epoch run sees (not the
    epoch-0 order a fresh seed would produce)."""
    # uninterrupted reference: consume epoch 0's shuffle, record epoch 1's
    _, _, _, tl_ref, _ = _setup(tmp_path, num_epochs=2)
    list(tl_ref)
    ref_epoch1 = [np.asarray(b["q_input_ids"]).copy() for b in tl_ref]

    out = str(tmp_path / "out")
    model, tcfg, params, tl, el = _setup(tmp_path, num_epochs=1)
    t1 = RetrieverTrainer(model, tcfg, tl, el, init_params=params,
                          output_dir=out, log_fn=lambda *_: None)
    t1.run()

    model, tcfg2, params, tl2, el2 = _setup(tmp_path, num_epochs=2)
    t2 = RetrieverTrainer(model, tcfg2, tl2, el2, init_params=params,
                          output_dir=out, log_fn=lambda *_: None)
    t2.run()  # resumes: must restore tl2's RNG to the post-epoch-0 state
    # both loaders have now consumed exactly two shuffles (epoch 0 + 1);
    # identical RNG positions prove the resumed run replayed the reference
    # data order rather than restarting from the seed
    assert tl2.rng.randint(1 << 30) == tl_ref.rng.randint(1 << 30)
    del ref_epoch1


def test_loader_rng_state_roundtrip():
    from multihop_dense_retrieval_tpu.data import BatchLoader

    class _DS(list):
        pass

    ds = _DS(range(37))
    a = BatchLoader(ds, 5, shuffle=True, seed=3, num_workers=1,
                    collate=lambda x: {"v": np.asarray(x)})
    b = BatchLoader(ds, 5, shuffle=True, seed=999, num_workers=1,
                    collate=lambda x: {"v": np.asarray(x)})
    list(a)  # advance
    b.set_rng_state(a.rng_state())
    oa = [x["v"] for x in a]
    ob = [x["v"] for x in b]
    for x, y in zip(oa, ob):
        np.testing.assert_array_equal(x, y)


def test_save_keeps_previous_state_until_new_one_lands(tmp_path):
    """A kill during the state save must never destroy the only resumable
    checkpoint (review r3 — orbax force=True rmtrees the target BEFORE
    serializing; the save now lands in a sibling and swaps atomically,
    with a .old fallback for the between-renames window)."""
    import os
    import shutil
    import jax.numpy as jnp
    from multihop_dense_retrieval_tpu.train.preemption import (
        PreemptionCheckpointer)

    pc = PreemptionCheckpointer(str(tmp_path))
    s1 = {"w": jnp.arange(4.0)}
    pc.save(s1, epoch=0, best_metric=0.1)
    s2 = {"w": jnp.arange(4.0) + 10}
    pc.save(s2, epoch=1, best_metric=0.2)
    state, meta = pc.maybe_restore({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(state["w"]),
                                  np.asarray(s2["w"]))
    assert meta["epoch"] == 1
    # no stale siblings after a clean save
    assert not os.path.isdir(str(tmp_path / "trainer_state.new"))
    assert not os.path.isdir(str(tmp_path / "trainer_state.old"))

    # simulate a kill between the two swap renames: main dir gone, .old
    # holds the previous state — restore must fall back, not start over
    os.rename(str(tmp_path / "trainer_state"),
              str(tmp_path / "trainer_state.old"))
    state, meta = pc.maybe_restore({"w": jnp.zeros(4)})
    assert state is not None and meta["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(state["w"]),
                                  np.asarray(s2["w"]))


def test_resume_on_device_mesh(tmp_path):
    """Resuming under a dp>1 mesh must re-place the restored arrays (orbax
    commits them to the save-time devices; the sharded step rejected them
    with 'incompatible devices' — found by the round-3 verify drive)."""
    from multihop_dense_retrieval_tpu.core.mesh import make_mesh

    out = str(tmp_path / "out")
    mesh = make_mesh(data=2, index=1)
    model, tcfg, params, tl, el = _setup(tmp_path, num_epochs=1)
    t1 = RetrieverTrainer(model, tcfg, tl, el, init_params=params,
                          output_dir=out, mesh=mesh, log_fn=lambda *_: None)
    t1.run()

    model, tcfg2, params, tl, el = _setup(tmp_path, num_epochs=2)
    logs = []
    t2 = RetrieverTrainer(model, tcfg2, tl, el, init_params=params,
                          output_dir=out, mesh=mesh, log_fn=logs.append)
    res = t2.run()
    assert any("resumed from epoch 0" in l for l in logs)
    assert res["best_mrr"] > 0


def test_save_after_crash_between_renames_never_loses_state(tmp_path):
    """Advisor r3: after a crash between the two swap renames (state at
    .old, trainer_state absent), the NEXT save used to rmtree .old before
    promoting — a kill between those calls left only .new, which restore
    never checked, silently restarting from scratch.  Now: (a) save() only
    displaces .old when trainer_state exists; (b) maybe_restore falls back
    to .new (orbax writes are atomic, so a present .new is complete)."""
    import os
    from multihop_dense_retrieval_tpu.core import checkpoint as ckpt
    from multihop_dense_retrieval_tpu.train.preemption import (
        PreemptionCheckpointer)

    pc = PreemptionCheckpointer(str(tmp_path))
    s2 = {"w": jnp.arange(4.0) + 10}
    pc.save(s2, epoch=1, best_metric=0.2)
    # crash #1: between the two swap renames
    os.rename(str(tmp_path / "trainer_state"),
              str(tmp_path / "trainer_state.old"))
    # crash #2: the next save dies right after writing .new, before any
    # promote — exactly the window the old leading rmtree made fatal
    s3 = {"w": jnp.arange(4.0) + 20}
    ckpt.save_pytree(str(tmp_path / "trainer_state.new"), s3)
    state, meta = pc.maybe_restore({"w": jnp.zeros(4)})
    assert state is not None, "double-crash lost the only checkpoint"
    np.testing.assert_array_equal(np.asarray(state["w"]), np.asarray(s2["w"]))

    # with .old also gone (first crash happened on the very first save),
    # the fully-written .new must be restorable
    import shutil
    shutil.rmtree(str(tmp_path / "trainer_state.old"))
    state, meta = pc.maybe_restore({"w": jnp.zeros(4)})
    assert state is not None
    np.testing.assert_array_equal(np.asarray(state["w"]), np.asarray(s3["w"]))

    # and a subsequent clean save() recovers: promotes, cleans siblings
    s4 = {"w": jnp.arange(4.0) + 30}
    pc.save(s4, epoch=2, best_metric=0.3)
    state, meta = pc.maybe_restore({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(state["w"]), np.asarray(s4["w"]))
    assert meta["epoch"] == 2
    assert not os.path.isdir(str(tmp_path / "trainer_state.new"))
    assert not os.path.isdir(str(tmp_path / "trainer_state.old"))
