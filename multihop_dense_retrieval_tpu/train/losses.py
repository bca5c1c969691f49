"""Contrastive losses and in-batch eval for retriever training.

Functional JAX re-design of mdr/retrieval/criterions.py.  The reference
computes these with torch mm/bmm on encoder outputs (criterions.py:114-250);
here they are pure functions over the encoder-output dict so they can live
inside a single jitted train step, with all score math in fp32.

Score construction (criterions.py:119-132), for batch size B:

  all_ctx       = concat([c1; c2])                          (2B, h)
  hop-1 scores  = q     · all_ctxᵀ                          (B, 2B)
                  with column B+i masked to -inf for row i  (own c2 is not
                  a valid hop-1 target; criterions.py:129-130)
  hop-2 scores  = q_sp1 · all_ctxᵀ                          (B, 2B), unmasked
  both get per-sample hard-negative columns [q·neg1, q·neg2] appended
  targets: hop-1 → i (own c1), hop-2 → B+i (own c2)
  loss = CE(hop1) + CE(hop2)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  reduction: str = "mean") -> jnp.ndarray:
    """CE over rows of `logits` (fp32)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    nll = logz - gold
    if reduction == "mean":
        return nll.mean()
    if reduction == "sum":
        return nll.sum()
    return nll


def _mhop_scores(
    outputs: Dict[str, jnp.ndarray],
    queue: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Builds (scores_1, scores_2, target_1, target_2) per criterions.py:119-147."""
    q = outputs["q"].astype(jnp.float32)
    q_sp1 = outputs["q_sp1"].astype(jnp.float32)
    c1 = outputs["c1"].astype(jnp.float32)
    c2 = outputs["c2"].astype(jnp.float32)
    neg1 = outputs["neg_1"].astype(jnp.float32)
    neg2 = outputs["neg_2"].astype(jnp.float32)

    B = q.shape[0]
    all_ctx = jnp.concatenate([c1, c2], axis=0)              # (2B, h)
    neg_ctx = jnp.stack([neg1, neg2], axis=1)                # (B, 2, h)

    s1 = q @ all_ctx.T                                       # (B, 2B)
    s2 = q_sp1 @ all_ctx.T
    ns1 = jnp.einsum("bh,bnh->bn", q, neg_ctx)               # (B, 2)
    ns2 = jnp.einsum("bh,bnh->bn", q_sp1, neg_ctx)

    # mask own-c2 column in hop-1 scores (criterions.py:129-130)
    eye = jnp.eye(B, dtype=bool)
    mask1 = jnp.concatenate([jnp.zeros((B, B), dtype=bool), eye], axis=1)
    s1 = jnp.where(mask1, NEG_INF, s1)

    s1 = jnp.concatenate([s1, ns1], axis=1)
    s2 = jnp.concatenate([s2, ns2], axis=1)

    if queue is not None:
        qf = jax.lax.stop_gradient(queue.astype(jnp.float32))
        s1 = jnp.concatenate([s1, q @ qf.T], axis=1)
        s2 = jnp.concatenate([s2, q_sp1 @ qf.T], axis=1)

    t1 = jnp.arange(B, dtype=jnp.int32)
    t2 = t1 + B
    return s1, s2, t1, t2


def mhop_loss(outputs: Dict[str, jnp.ndarray],
              queue: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Contrastive 2-hop loss (criterions.py:114-151).

    `queue` is the (K, h) memory bank for the momentum stage
    (criterions.py:134-142); pass None for stage-1 training.
    """
    s1, s2, t1, t2 = _mhop_scores(outputs, queue)
    return cross_entropy(s1, t1) + cross_entropy(s2, t2)


def _reciprocal_ranks(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """rank of target under descending sort → 1/rank (criterions.py:172-180)."""
    gold = jnp.take_along_axis(scores, targets[:, None], axis=-1)
    rank = jnp.sum(scores > gold, axis=-1) + 1
    return 1.0 / rank.astype(jnp.float32)


def mhop_eval(outputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """In-batch MRR per hop (criterions.py:153-182), vectorized."""
    s1, s2, t1, t2 = _mhop_scores(outputs)
    return {"rrs_1": _reciprocal_ranks(s1, t1),
            "rrs_2": _reciprocal_ranks(s2, t2)}


def unified_loss(outputs: Dict[str, jnp.ndarray],
                 stop_targets: jnp.ndarray) -> jnp.ndarray:
    """Variable-hop loss (criterions.py:185-210): sum-reduced CE for both hops
    plus stop-classifier CE; hop-2 CE only for multi-hop samples
    (stop_targets==1 means a second hop exists).
    """
    s1, s2, t1, t2 = _mhop_scores(outputs)
    stop = stop_targets.reshape(-1)
    retrieve = (cross_entropy(s1, t1, reduction="sum")
                + (cross_entropy(s2, t2, reduction="none")
                   * stop.astype(jnp.float32)).sum())
    stop_loss = cross_entropy(outputs["stop_logits"], stop, reduction="sum")
    return retrieve + stop_loss


def unified_eval(outputs: Dict[str, jnp.ndarray],
                 stop_targets: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """MRRs bucketed into multi-hop vs single-hop + stop accuracy
    (criterions.py:212-250).  Returns per-sample arrays plus the stop mask so
    the host can bucket (jit-friendly: no data-dependent list lengths).
    """
    s1, s2, t1, t2 = _mhop_scores(outputs)
    stop = stop_targets.reshape(-1)
    stop_pred = jnp.argmax(outputs["stop_logits"].astype(jnp.float32), axis=1)
    return {
        "rrs_1": _reciprocal_ranks(s1, t1),
        "rrs_2": _reciprocal_ranks(s2, t2),
        "stop_acc": (stop_pred == stop).astype(jnp.float32),
        "is_mhop": stop.astype(bool),
    }


def single_loss(outputs: Dict[str, jnp.ndarray],
                queue_c: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Single-hop DPR loss: in-batch positives + per-sample hard negative.

    The reference's `loss_single` was deleted (criterions.py:10-110 commented
    out; train_single.py:106 imports it and crashes) — this is the standard
    formulation its surviving callers expect: scores = q · [c; neg]ᵀ with
    target i.  `queue_c` (K, h) appends memory-bank negatives re-encoded
    from the token queue (the momentum branch, criterions.py:19-23).
    """
    q = outputs["q"].astype(jnp.float32)
    c = outputs["c"].astype(jnp.float32)
    neg = outputs["neg"].astype(jnp.float32)
    cols = [q @ c.T, q @ neg.T]
    if queue_c is not None:
        cols.append(q @ queue_c.astype(jnp.float32).T)
    scores = jnp.concatenate(cols, axis=1)  # (B, 2B [+K])
    targets = jnp.arange(q.shape[0], dtype=jnp.int32)
    return cross_entropy(scores, targets)


def single_eval(outputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    q = outputs["q"].astype(jnp.float32)
    c = outputs["c"].astype(jnp.float32)
    neg = outputs["neg"].astype(jnp.float32)
    scores = jnp.concatenate([q @ c.T, q @ neg.T], axis=1)
    targets = jnp.arange(q.shape[0], dtype=jnp.int32)
    return {"rrs": _reciprocal_ranks(scores, targets)}


def nq_mhop_loss(outputs: Dict[str, jnp.ndarray],
                 queue: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Error-recovery objective for the NQ variants (reconstruction of the
    dead `loss_nq_mhop`, criterions.py:10-110 / unified_retriever.py:59-111):
    both the original query and the recovery query q_neg1 (question ⊕ wrong
    passage) must rank the gold passage first against in-batch + dense
    negatives.  `queue` (K, h) appends memory-bank negatives
    (BertNQMomentumRetriever, unified_retriever.py:114-180)."""
    q = outputs["q"].astype(jnp.float32)
    q_neg1 = outputs["q_neg1"].astype(jnp.float32)
    c = outputs["c"].astype(jnp.float32)
    neg = outputs["neg"].astype(jnp.float32)
    ctx = [c.T, neg.T]
    for k in ("dense_neg1", "dense_neg2"):
        if k in outputs:
            ctx.append(outputs[k].astype(jnp.float32).T)
    if queue is not None:
        ctx.append(queue.astype(jnp.float32).T)
    ctx = jnp.concatenate(ctx, axis=1)  # (h, >=2B [+K])
    targets = jnp.arange(q.shape[0], dtype=jnp.int32)
    return (cross_entropy(q @ ctx, targets)
            + cross_entropy(q_neg1 @ ctx, targets))


def enqueue(queue: jnp.ndarray, ptr: jnp.ndarray,
            embeddings: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bank update (mhop_retriever.py:85-106), static-shape.

    The reference truncates the batch at the queue end; here we wrap around
    with a scatter (strictly a superset of the reference behavior, and
    jit-friendly: no dynamic slice sizes).
    """
    k = queue.shape[0]
    if embeddings.shape[0] > k:
        # batch larger than the whole queue: keep the LAST k rows — with
        # duplicate scatter indices the surviving row would be unspecified
        # (same guard as trainer._enqueue_tokens)
        embeddings = embeddings[-k:]
    n = embeddings.shape[0]
    idx = (ptr + jnp.arange(n, dtype=jnp.int32)) % k
    queue = queue.at[idx].set(jax.lax.stop_gradient(embeddings.astype(queue.dtype)))
    return queue, (ptr + n) % k


def momentum_update(params_q, params_k, m: float):
    """EMA key-encoder update (mhop_retriever.py:77-83).

    NOTE: the reference never actually invokes this during training (the call
    is commented out at criterions.py:144) — stage-2 is frozen-key finetuning.
    Provided for completeness; the trainer exposes a flag to enable it.
    """
    return jax.tree_util.tree_map(
        lambda pk, pq: pk * m + pq.astype(pk.dtype) * (1.0 - m), params_k, params_q)
