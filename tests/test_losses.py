"""Bit-tests of the contrastive loss math against an independent torch oracle.

The hop-1 eye-masking (criterions.py:129-130) is subtle; the oracle below
re-derives the reference formula in torch from the paper/readme description
and must match our jax implementation to float tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.train import losses


def _random_outputs(B=6, h=16, seed=0, with_stop=False):
    rng = np.random.RandomState(seed)
    out = {k: rng.randn(B, h).astype(np.float32)
           for k in ["q", "q_sp1", "c1", "c2", "neg_1", "neg_2"]}
    if with_stop:
        out["stop_logits"] = rng.randn(B, 2).astype(np.float32)
    return out


def _torch_oracle_scores(out, queue=None):
    import torch

    q = torch.tensor(out["q"])
    q_sp = torch.tensor(out["q_sp1"])
    all_ctx = torch.cat([torch.tensor(out["c1"]), torch.tensor(out["c2"])], dim=0)
    neg_ctx = torch.stack([torch.tensor(out["neg_1"]), torch.tensor(out["neg_2"])], dim=1)
    B = q.shape[0]
    s1 = q @ all_ctx.t()
    s2 = q_sp @ all_ctx.t()
    mask = torch.cat([torch.zeros(B, B), torch.eye(B)], dim=1).bool()
    s1 = s1.masked_fill(mask, float("-inf"))
    ns1 = torch.bmm(q.unsqueeze(1), neg_ctx.transpose(1, 2)).squeeze(1)
    ns2 = torch.bmm(q_sp.unsqueeze(1), neg_ctx.transpose(1, 2)).squeeze(1)
    s1 = torch.cat([s1, ns1], dim=1)
    s2 = torch.cat([s2, ns2], dim=1)
    if queue is not None:
        qt = torch.tensor(queue)
        s1 = torch.cat([s1, q @ qt.t()], dim=1)
        s2 = torch.cat([s2, q_sp @ qt.t()], dim=1)
    t1 = torch.arange(B)
    t2 = t1 + B
    return s1, s2, t1, t2


def test_mhop_loss_matches_torch_oracle():
    import torch.nn.functional as F

    out = _random_outputs()
    s1, s2, t1, t2 = _torch_oracle_scores(out)
    expected = (F.cross_entropy(s1, t1) + F.cross_entropy(s2, t2)).item()
    got = float(losses.mhop_loss({k: jnp.asarray(v) for k, v in out.items()}))
    assert got == pytest.approx(expected, rel=1e-5)


def test_mhop_loss_with_queue():
    import torch.nn.functional as F

    out = _random_outputs(seed=1)
    queue = np.random.RandomState(2).randn(20, 16).astype(np.float32)
    s1, s2, t1, t2 = _torch_oracle_scores(out, queue)
    expected = (F.cross_entropy(s1, t1) + F.cross_entropy(s2, t2)).item()
    got = float(losses.mhop_loss({k: jnp.asarray(v) for k, v in out.items()},
                                 queue=jnp.asarray(queue)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_mhop_eval_reciprocal_ranks():
    out = _random_outputs(seed=3)
    s1, s2, t1, t2 = _torch_oracle_scores(out)
    # oracle: rank via argsort-descending position of target
    def rr(scores, targets):
        order = scores.argsort(dim=1, descending=True)
        pos = order.argsort(dim=1)
        return np.array([1.0 / (pos[i, t].item() + 1) for i, t in enumerate(targets)])

    exp1, exp2 = rr(s1, t1), rr(s2, t2)
    got = losses.mhop_eval({k: jnp.asarray(v) for k, v in out.items()})
    np.testing.assert_allclose(np.asarray(got["rrs_1"]), exp1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["rrs_2"]), exp2, rtol=1e-6)


def test_unified_loss_masks_single_hop_samples():
    import torch
    import torch.nn.functional as F

    out = _random_outputs(seed=4, with_stop=True)
    stop = np.array([1, 0, 1, 1, 0, 1], dtype=np.int32)
    s1, s2, t1, t2 = _torch_oracle_scores(out)
    expected = (
        F.cross_entropy(s1, t1, reduction="sum")
        + (F.cross_entropy(s2, t2, reduction="none") * torch.tensor(stop)).sum()
        + F.cross_entropy(torch.tensor(out["stop_logits"]), torch.tensor(stop).long(),
                          reduction="sum")
    ).item()
    got = float(losses.unified_loss({k: jnp.asarray(v) for k, v in out.items()},
                                    jnp.asarray(stop)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_enqueue_wraps_and_advances_ptr():
    queue = jnp.zeros((8, 4), dtype=jnp.float32)
    emb = jnp.arange(5 * 4, dtype=jnp.float32).reshape(5, 4) + 1
    q1, ptr = losses.enqueue(queue, jnp.int32(6), emb)
    # rows 6,7 then wrap to 0,1,2
    np.testing.assert_array_equal(np.asarray(q1[6]), np.asarray(emb[0]))
    np.testing.assert_array_equal(np.asarray(q1[7]), np.asarray(emb[1]))
    np.testing.assert_array_equal(np.asarray(q1[0]), np.asarray(emb[2]))
    np.testing.assert_array_equal(np.asarray(q1[2]), np.asarray(emb[4]))
    assert int(ptr) == (6 + 5) % 8
    # untouched row stays zero
    np.testing.assert_array_equal(np.asarray(q1[4]), np.zeros(4))


def test_momentum_update_ema():
    pq = {"w": jnp.ones((2, 2)) * 2.0}
    pk = {"w": jnp.zeros((2, 2))}
    new = losses.momentum_update(pq, pk, m=0.999)
    np.testing.assert_allclose(np.asarray(new["w"]), 0.002 * np.ones((2, 2)), rtol=1e-6)
