"""QA reader loss, jitted steps, and span decoding.

Functional re-design of the training/eval math in mdr/qa/qa_model.py:73-102
and scripts/train_qa.py:244-253.

Loss = rank BCE (sum) + marginal span NLL + sp_weight · sp BCE:

  * span supervision is a padded set of answer-occurrence slots per chain
    (starts/ends with -1 padding); the span loss marginalizes over all
    occurrences: -log Σ_slots exp(-(CE_start + CE_end)) per row, summed over
    rows that have ≥1 valid slot (qa_model.py:85-96);
  * rows with no covered answer (ans_covered=0 → all slots -1) contribute 0;
  * sp BCE over sentence-marker slots, masked to real slots and gold chains.
    NOTE deviation: the reference multiplies each sentence's BCE by its
    *token offset value* (qa_model.py:78, `sp_loss * batch["sent_offsets"]`),
    an apparent bug whose intent is masking offset-0 padding; we implement
    the masking intent via an explicit sent_mask.

Span decode (train_qa.py:244-253): argmax over start⊕end scores band-masked
to 0 ≤ end-start ≤ max_ans_len, entirely in-jit; text reconstruction stays
host-side (data/qa_dataset.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from .trainer import TrainState

NEG_INF = -1e30


def _ce_with_ignore(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-row CE; rows with target == -1 get 0 (torch ignore_index=-1)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe_t = jnp.maximum(targets, 0)
    gold = jnp.take_along_axis(logits, safe_t[:, None], axis=-1)[:, 0]
    nll = logz - gold
    return jnp.where(targets == -1, 0.0, nll)


def qa_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
            *, sp_weight: float = 0.05, sp_pred: bool = True) -> jnp.ndarray:
    start_logits = outputs["start_logits"].astype(jnp.float32)  # (B, L)
    end_logits = outputs["end_logits"].astype(jnp.float32)
    label = batch["label"].reshape(-1).astype(jnp.float32)      # (B,)

    # rank loss: BCE-with-logits, sum reduction (qa_model.py:83)
    rank = outputs["rank_score"].reshape(-1)
    rank_loss = jnp.sum(optax.sigmoid_binary_cross_entropy(rank, label))

    # marginal span loss over answer-occurrence slots (qa_model.py:85-96)
    starts = batch["starts"]                                    # (B, A)
    ends = batch["ends"]
    ce_s = jax.vmap(_ce_with_ignore, in_axes=(None, 1), out_axes=1)(
        start_logits, starts)                                   # (B, A)
    ce_e = jax.vmap(_ce_with_ignore, in_axes=(None, 1), out_axes=1)(
        end_logits, ends)
    loss_tensor = ce_s + ce_e
    log_prob = jnp.where(loss_tensor == 0.0, NEG_INF, -loss_tensor)
    marginal = jnp.sum(jnp.exp(log_prob), axis=1)               # (B,)
    has_span = marginal > 0
    span_loss = -jnp.sum(jnp.where(has_span, jnp.log(jnp.where(has_span,
                                                               marginal, 1.0)),
                                   0.0))

    total = rank_loss + span_loss
    if sp_pred and outputs["sp_score"] is not None:
        # The reference weights each sentence's BCE by its TOKEN OFFSET
        # (qa_model.py:78 `sp_loss * batch["sent_offsets"]` — positions
        # ~70-500 used as loss weights), which reads as an accidental
        # stand-in for a 0/1 valid-slot mask; we use the explicit mask.
        # MAGNITUDE NOTE: that bug inflates the reference's effective sp
        # term by ~the mean marker offset (~2 orders of magnitude), and
        # its default sp_weight=0.05 was tuned WITH the inflation — runs
        # chasing the reference's sp_em/sp_f1 should sweep --sp-weight
        # upward (e.g. 1-10), not assume 0.05 transfers.
        sp_bce = optax.sigmoid_binary_cross_entropy(
            outputs["sp_score"], batch["sent_labels"].astype(jnp.float32))
        sp_bce = sp_bce * batch["sent_mask"].astype(jnp.float32)
        sp_bce = sp_bce * label[:, None]  # only gold chains supervise sp
        total = total + sp_weight * jnp.sum(sp_bce)
    return total


def decode_spans(start_logits, end_logits, max_ans_len: int):
    """Band-masked best span per row (train_qa.py:244-253).

    Returns (start_pos, end_pos, span_score), each (B,).
    """
    span = start_logits[:, :, None] + end_logits[:, None, :]   # (B, L, L)
    L = span.shape[1]
    i = jnp.arange(L)
    band = (i[None, :, None] <= i[None, None, :]) & \
           (i[None, None, :] - i[None, :, None] <= max_ans_len)
    span = jnp.where(band, span, -1e10)
    best_end_for_start = jnp.max(span, axis=2)                 # (B, L)
    start_pos = jnp.argmax(best_end_for_start, axis=1)         # (B,)
    end_idx = jnp.argmax(span, axis=2)                         # (B, L)
    end_pos = jnp.take_along_axis(end_idx, start_pos[:, None], axis=1)[:, 0]
    span_score = jnp.max(best_end_for_start, axis=1)
    return start_pos, end_pos, span_score


def make_qa_train_step(model, tx, *, sp_weight: float = 0.05,
                       sp_pred: bool = True,
                       mesh: Optional[Mesh] = None) -> Callable:
    def step(state: TrainState, batch):
        def loss_fn(params):
            outputs = model.apply(params, batch)
            return qa_loss(outputs, batch, sp_weight=sp_weight, sp_pred=sp_pred)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    if mesh is None:
        return jax.jit(step)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(None, shard), donate_argnums=(0,))


def make_qa_rank_step(model, *, mesh: Optional[Mesh] = None) -> Callable:
    """(params, batch) → rank scores only — the cheap first pass of the
    two-stage read (eval/qa_eval.py::predict rank_topm): chains are ranked
    at a NARROW truncated width, then only the top-m per question pay the
    full-width span/sp pass.  The reference reads every chain fully at 512
    (scripts/train_qa.py:380-481); ranking is CLS-based, so truncation only
    perturbs scores through the encoder's view of the chain tail."""

    def step(params, batch):
        return model.apply(params, batch)["rank_score"].reshape(-1)

    if mesh is None:
        return jax.jit(step)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(None, shard))


def make_qa_predict_step(model, *, max_ans_len: int = 30,
                         mesh: Optional[Mesh] = None) -> Callable:
    """(params, batch) → rank score, sp sigmoid scores, best span + score."""

    def step(params, batch):
        outputs = model.apply(params, batch)
        start_pos, end_pos, span_score = decode_spans(
            outputs["start_logits"], outputs["end_logits"], max_ans_len)
        res = {
            "rank_score": outputs["rank_score"].reshape(-1),
            "start_pos": start_pos,
            "end_pos": end_pos,
            "span_score": span_score,
        }
        if outputs["sp_score"] is not None:
            sp = jnp.where(batch["sent_mask"].astype(bool),
                           outputs["sp_score"], NEG_INF)
            res["sp_prob"] = jax.nn.sigmoid(sp)
        return res

    if mesh is None:
        return jax.jit(step)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(None, shard))
