"""Retriever training: optimizer, jitted steps, and the epoch loop.

Functional re-design of scripts/train_mhop.py / train_momentum.py:

  * Adam with no-decay param groups (train_mhop.py:125-132) → optax chain
    with a masked additive weight decay;
  * grad clip 2.0 *before* the update (train_mhop.py:181-186) → clip first
    in the chain;
  * linear warmup + linear decay to zero (train_mhop.py:159-163);
  * periodic in-batch MRR eval, best checkpoint by mrr_avg
    (train_mhop.py:198-225);
  * bf16 forward / fp32 params+optimizer replaces apex amp O1;
  * data parallelism: the batch is sharded over the mesh `data` axis inside
    one jitted step — XLA inserts the gradient psum (replaces
    DataParallel/DDP+NCCL, train_mhop.py:144-148).  NOTE: in-batch negatives
    make the loss non-separable across devices, so the six encoder passes run
    data-parallel and the (B, 2B) score matrix is computed on replicated
    gathered vectors — same math as the reference's single-process
    DataParallel, at every scale.

Momentum stage (train_momentum.py): `MomentumTrainState` carries the frozen
key-encoder params and the (K, h) queue + pointer as functional state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import RetrieverTrainConfig
from ..core.mesh import DATA_AXIS
from . import losses


# --------------------------------------------------------------------------
# Optimizer
# --------------------------------------------------------------------------


def _no_decay_mask(params) -> Any:
    """True for params that DO get weight decay (reference excludes bias and
    LayerNorm weights, train_mhop.py:125)."""
    def decay(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_bias = names and names[-1] == "bias"
        is_ln = any("layer_norm" in str(n) for n in names)
        return not (is_bias or is_ln)

    return jax.tree_util.tree_map_with_path(decay, params)


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int):
    if warmup_steps <= 0:
        return optax.linear_schedule(lr, 0.0, max(total_steps, 1))
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        [warmup_steps])


def make_optimizer(cfg: RetrieverTrainConfig, total_steps: int,
                   params=None) -> optax.GradientTransformation:
    sched = linear_warmup_schedule(cfg.learning_rate,
                                   int(total_steps * cfg.warmup_ratio),
                                   total_steps)
    chain = [optax.clip_by_global_norm(cfg.max_grad_norm)]
    if cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.weight_decay,
                                               mask=_no_decay_mask))
    chain += [optax.scale_by_adam(eps=cfg.adam_eps),
              optax.scale_by_learning_rate(sched)]
    tx = optax.chain(*chain)
    if cfg.gradient_accumulation > 1:
        # reference --gradient_accumulation_steps (train_mhop.py:168-190):
        # grads averaged over N micro-batches, one optimizer step per N
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation)
    return tx


# --------------------------------------------------------------------------
# Train states
# --------------------------------------------------------------------------


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


@flax.struct.dataclass
class MomentumTrainState:
    params: Any          # encoder_q (trained)
    params_k: Any        # encoder_k (frozen copy / optional EMA)
    queue: jnp.ndarray   # (K, h) memory bank
    queue_ptr: jnp.ndarray
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx, queue_size: int, hidden: int, seed: int = 0):
        # reference initializes the queue with randn (mhop_retriever.py:66)
        queue = jax.random.normal(jax.random.PRNGKey(seed),
                                  (queue_size, hidden), jnp.float32)
        return cls(params=params,
                   params_k=jax.tree_util.tree_map(jnp.copy, params),
                   queue=queue,
                   queue_ptr=jnp.zeros((), jnp.int32),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


# --------------------------------------------------------------------------
# Steps
# --------------------------------------------------------------------------


def _batch_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P(DATA_AXIS))


def make_train_step(model, tx, *, unified: bool = False, task: str = None,
                    mesh: Optional[Mesh] = None,
                    tensor_parallel: bool = False) -> Callable:
    """Returns jitted (state, batch) -> (state, loss).

    task: "mhop" (default) | "unified" | "single" (DPR, train_single.py
    parity) | "nq" (error-recovery variants).

    tensor_parallel=True additionally shards attention heads + FFN over the
    mesh `index` axis (parallel/sharding.py) — dp × tp in one step.
    """
    task = task or ("unified" if unified else "mhop")

    def loss_fn(params, batch):
        if tensor_parallel and mesh is not None:
            from ..parallel.sharding import constrain_params

            params = constrain_params(params, mesh)
        outputs = model.apply(params, batch)
        if task == "unified":
            return losses.unified_loss(outputs, batch["stop_targets"])
        if task == "single":
            return losses.single_loss(outputs)
        if task == "nq":
            return losses.nq_mhop_loss(outputs)
        return losses.mhop_loss(outputs)

    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    shard = _batch_sharding(mesh)
    if shard is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(None, shard), donate_argnums=(0,))


def make_momentum_train_step(model, tx, *, enable_ema: bool = False,
                             momentum_m: float = 0.999,
                             mesh: Optional[Mesh] = None,
                             task: str = "mhop") -> Callable:
    """Stage-2 memory-bank step (train_momentum.py + criterions.py:134-143).

    Queue scores use the PRE-update queue; the batch contexts are enqueued
    after.  `enable_ema=False` matches the shipped reference (the EMA call is
    commented out at criterions.py:144).

    task="nq" is the BertNQMomentumRetriever composition
    (unified_retriever.py:114-180): queries (q, q_neg1) through the trained
    encoder, contexts (c, neg) through the frozen/EMA key encoder, queue
    negatives in the recovery loss; `model` is then an NQRetriever.
    """

    def encode(params, batch, keys):
        return {name: model.apply(
            params, batch[f"{pref}input_ids"], batch[f"{pref}mask"],
            method=model.encode_seq)
            for name, pref in keys}

    if task == "nq":
        q_keys = [("q", "q_"), ("q_neg1", "q_neg1_")]
        ctx_keys = [("c", "c_"), ("neg", "neg_")]
        loss_of = losses.nq_mhop_loss
        enqueue_of = lambda ctx: ctx["c"]
    else:
        q_keys = [("q", "q_"), ("q_sp1", "q_sp_")]
        ctx_keys = [("c1", "c1_"), ("c2", "c2_"), ("neg_1", "neg1_"),
                    ("neg_2", "neg2_")]
        loss_of = losses.mhop_loss
        enqueue_of = lambda ctx: jnp.concatenate([ctx["c1"], ctx["c2"]],
                                                 axis=0)

    def step(state: MomentumTrainState, batch):
        ctx = jax.lax.stop_gradient(encode(state.params_k, batch, ctx_keys))

        def loss_fn(params):
            outputs = dict(ctx)
            outputs.update(encode(params, batch, q_keys))
            return loss_of(outputs, queue=state.queue)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        all_ctx = enqueue_of(ctx)
        queue, ptr = losses.enqueue(state.queue, state.queue_ptr, all_ctx)
        params_k = state.params_k
        if enable_ema:
            params_k = losses.momentum_update(params, params_k, momentum_m)
        return MomentumTrainState(
            params=params, params_k=params_k, queue=queue, queue_ptr=ptr,
            opt_state=opt_state, step=state.step + 1), loss

    shard = _batch_sharding(mesh)
    if shard is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(None, shard), donate_argnums=(0,))


@flax.struct.dataclass
class TokenQueueTrainState:
    """Single-hop momentum state: a memory bank of raw TOKEN triples that is
    re-encoded with the CURRENT encoder every step (the reference's
    MomentumRetriever, models/retriever.py:76-141) — embeddings never go
    stale, unlike the (K, h) embedding queue of the mhop momentum stage."""

    params: Any
    queue_ids: jnp.ndarray    # (K, L) int32
    queue_mask: jnp.ndarray   # (K, L) int32
    queue_type: jnp.ndarray   # (K, L) int32
    queue_ptr: jnp.ndarray
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx, queue_size: int, max_c_len: int,
               cls_id: int = 101, sep_id: int = 102):
        # slots start as empty-but-valid [CLS][SEP] rows: the reference's
        # all-zero-mask init rows are softmax-over-nothing UB in fp16 —
        # a minimal valid sequence keeps the warm-up numerics defined
        ids = jnp.zeros((queue_size, max_c_len), jnp.int32)
        ids = ids.at[:, 0].set(cls_id).at[:, 1].set(sep_id)
        mask = jnp.zeros((queue_size, max_c_len), jnp.int32).at[:, :2].set(1)
        return cls(params=params,
                   queue_ids=ids, queue_mask=mask,
                   queue_type=jnp.zeros_like(ids),
                   queue_ptr=jnp.zeros((), jnp.int32),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def _enqueue_tokens(state: TokenQueueTrainState, ids, mask, type_ids):
    """Write the batch's context token rows into the queue at ptr (wrap
    semantics, same rationale as losses.enqueue), width-aligned to the
    queue's static max_c_len.  Batches larger than the queue keep their
    LAST K rows — with duplicate scatter indices the winner would be
    unspecified (the reference instead truncates to the remaining slots,
    retriever.py:114-141)."""
    K, L = state.queue_ids.shape
    if ids.shape[0] > K:
        ids, mask, type_ids = ids[-K:], mask[-K:], type_ids[-K:]
    n, lb = ids.shape

    def fit(x):
        if lb >= L:
            return x[:, :L]
        return jnp.pad(x, ((0, 0), (0, L - lb)))

    idx = (state.queue_ptr + jnp.arange(n, dtype=jnp.int32)) % K
    return state.replace(
        queue_ids=state.queue_ids.at[idx].set(fit(ids)),
        queue_mask=state.queue_mask.at[idx].set(fit(mask)),
        queue_type=state.queue_type.at[idx].set(fit(type_ids)),
        queue_ptr=(state.queue_ptr + n) % K)


def make_single_momentum_train_step(model, tx,
                                    mesh: Optional[Mesh] = None) -> Callable:
    """Single-hop momentum step (MomentumRetriever + the loss_single
    momentum branch, criterions.py:10-23): the token queue is re-encoded
    with the current encoder under stop_gradient (encode_queue_ctx,
    retriever.py:98-112), its vectors appended as extra negatives, and the
    batch's context TOKENS enqueued afterwards (dequeue_and_enqueue,
    retriever.py:114-141).  `model` is a SingleRetriever."""

    def step(state: TokenQueueTrainState, batch):
        def loss_fn(params):
            outputs = model.apply(params, batch)
            queue_c = jax.lax.stop_gradient(model.apply(
                params, state.queue_ids, state.queue_mask, state.queue_type,
                method=model.encode_ctx))
            return losses.single_loss(outputs, queue_c=queue_c)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        tt = batch.get("c_type_ids")
        if tt is None:
            tt = jnp.zeros_like(batch["c_input_ids"])
        state = _enqueue_tokens(state, batch["c_input_ids"],
                                batch["c_mask"], tt)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), loss

    shard = _batch_sharding(mesh)
    if shard is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(None, shard), donate_argnums=(0,))


def make_momentum_eval_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Momentum-stage eval: queries via encoder_q, contexts via encoder_k —
    matching the reference's eval-mode forward (mhop_retriever.py:120-126)."""

    def step(params_q, params_k, batch):
        outputs = {}
        for name, pref, params in (
                ("q", "q_", params_q), ("q_sp1", "q_sp_", params_q),
                ("c1", "c1_", params_k), ("c2", "c2_", params_k),
                ("neg_1", "neg1_", params_k), ("neg_2", "neg2_", params_k)):
            outputs[name] = model.apply(
                params, batch[f"{pref}input_ids"], batch[f"{pref}mask"],
                method=model.encode_seq)
        return losses.mhop_eval(outputs)

    shard = _batch_sharding(mesh)
    if shard is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(None, None, shard))


def make_eval_step(model, *, unified: bool = False, task: str = None,
                   mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted (params, batch) -> per-sample rr arrays."""
    task = task or ("unified" if unified else "mhop")

    def step(params, batch):
        outputs = model.apply(params, batch)
        if task == "unified":
            return losses.unified_eval(outputs, batch["stop_targets"])
        if task == "single":
            rrs = losses.single_eval(outputs)["rrs"]
            return {"rrs_1": rrs, "rrs_2": rrs}
        return losses.mhop_eval(outputs)

    shard = _batch_sharding(mesh)
    if shard is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(None, shard))


# --------------------------------------------------------------------------
# Loop
# --------------------------------------------------------------------------


@dataclasses.dataclass
class EpochStats:
    train_loss: float
    mrr_1: float
    mrr_2: float

    @property
    def mrr_avg(self):
        return (self.mrr_1 + self.mrr_2) / 2


def evaluate_mrr(eval_step, params, loader) -> Dict[str, float]:
    """In-batch MRR over an eval loader (train_mhop.py predict(), :233-250).

    Unified task: single-hop rows carry a random negative/dummy as the
    unused c2 (data/unified_dataset.py), so their hop-2 ranks are noise —
    unified_eval returns `is_mhop` exactly so the host can bucket, and
    mrr_2 averages only the multi-hop rows (unified eval upstream keys
    metrics by q_type the same way); stop-head accuracy is reported too."""
    rrs1, rrs2, stop_accs = [], [], []
    for batch in loader:
        valid = batch.pop("valid", None)
        out = eval_step(params, {k: jnp.asarray(v) for k, v in batch.items()})
        r1 = np.asarray(out["rrs_1"])
        r2 = np.asarray(out["rrs_2"])
        mhop = (np.asarray(out["is_mhop"]) if "is_mhop" in out
                else np.ones_like(r1, bool))
        sacc = (np.asarray(out["stop_acc"]) if "stop_acc" in out else None)
        if valid is not None:
            r1, r2, mhop = r1[valid], r2[valid], mhop[valid]
            sacc = None if sacc is None else sacc[valid]
        rrs1.extend(r1.tolist())
        rrs2.extend(r2[mhop].tolist())
        if sacc is not None:
            stop_accs.extend(sacc.tolist())
    mrr_1 = float(np.mean(rrs1)) if rrs1 else 0.0
    mrr_2 = float(np.mean(rrs2)) if rrs2 else 0.0
    out = {"mrr_1": mrr_1, "mrr_2": mrr_2, "mrr_avg": (mrr_1 + mrr_2) / 2}
    if stop_accs:
        out["stop_acc"] = float(np.mean(stop_accs))
    return out


class RetrieverTrainer:
    """Epoch loop with periodic eval + best-checkpoint tracking.

    Deliberately thin: steps are the jitted functions above; this class only
    sequences them and talks to the host (loader, logging, orbax).

    With cfg.momentum=True this is the stage-2 memory-bank trainer
    (scripts/train_momentum.py): the state carries encoder_k + queue, and
    only encoder_q params are checkpointed (train_momentum.py:186-189).
    """

    def __init__(self, model, cfg: RetrieverTrainConfig, train_loader,
                 eval_loader, *, init_params, total_steps: Optional[int] = None,
                 mesh: Optional[Mesh] = None, output_dir: Optional[str] = None,
                 log_fn=print, hidden_size: Optional[int] = None,
                 enable_ema: bool = False):
        from ..core import checkpoint as ckpt

        self.cfg = cfg
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.output_dir = output_dir
        self.log = log_fn
        self._ckpt = ckpt
        # optimizer steps, not micro-batches (reference t_total divides by
        # gradient_accumulation_steps, train_mhop.py:159)
        total = total_steps or (len(train_loader) * cfg.num_epochs
                                // max(cfg.gradient_accumulation, 1))
        self.tx = make_optimizer(cfg, total)
        if cfg.momentum and cfg.unified:
            raise ValueError("momentum training drives the mhop contrastive "
                             "loss; unified (stop-head) training has no "
                             "momentum variant — pick one (the reference "
                             "has no such combination either)")
        if cfg.momentum:
            hidden = hidden_size or model.config.hidden_size
            self.state = MomentumTrainState.create(
                init_params, self.tx, queue_size=cfg.queue_size, hidden=hidden,
                seed=cfg.seed)
            self.train_step = make_momentum_train_step(
                model, self.tx, enable_ema=enable_ema,
                momentum_m=cfg.momentum_m, mesh=mesh)
        else:
            self.state = TrainState.create(init_params, self.tx)
            self.train_step = make_train_step(model, self.tx,
                                              unified=cfg.unified, mesh=mesh)
        if cfg.momentum:
            mstep = make_momentum_eval_step(model, mesh=mesh)
            self.eval_step = lambda params, batch: mstep(
                params, self.state.params_k, batch)
        else:
            self.eval_step = make_eval_step(model, unified=cfg.unified,
                                            mesh=mesh)
        self.best_mrr = 0.0

    def run(self, resume: bool = True) -> Dict[str, float]:
        writer = None
        checkpointer = None
        start_epoch = 0
        if self.output_dir:
            from ..utils.meters import MetricWriter
            from .preemption import PreemptionCheckpointer

            writer = MetricWriter(f"{self.output_dir}/tb")
            checkpointer = PreemptionCheckpointer(
                f"{self.output_dir}/preempt")
            try:
                checkpointer.install_signal_handler()
            except ValueError:
                pass  # not on the main thread (tests)
            if resume:
                state, meta = checkpointer.maybe_restore(self.state)
                if state is not None:
                    # orbax restores arrays committed to the device(s) the
                    # checkpoint was SAVED on (often device 0 only); pull
                    # to host so the mesh-sharded train step can place
                    # them per its in_shardings — resuming a dp>1 run
                    # otherwise fails with "incompatible devices"
                    self.state = jax.tree_util.tree_map(
                        lambda x: np.asarray(x)
                        if hasattr(x, "dtype") else x, state)
                    start_epoch = meta["epoch"] + 1
                    self.best_mrr = meta["best_metric"]
                    if meta.get("rng_state"):
                        # replay the data order an uninterrupted run would
                        # see (the reference saves rng_state the same way,
                        # mhop_trainer.py:41-117)
                        self.train_loader.set_rng_state(meta["rng_state"])
                    self.log(f"resumed from epoch {meta['epoch']} "
                             f"(best_mrr={self.best_mrr:.4f})")
        smoothed = None
        history = []
        # continue the scalar x-axis across preemption resumes (the state's
        # optimizer step is restored; re-logging from 0 would overwrite the
        # pre-preemption TensorBoard points)
        step_no = start_epoch * len(self.train_loader)
        for epoch in range(start_epoch, self.cfg.num_epochs):
            losses_seen = []
            for batch in self.train_loader:
                batch.pop("valid", None)
                self.state, loss = self.train_step(
                    self.state, {k: jnp.asarray(v) for k, v in batch.items()})
                # keep the DEVICE array: float() here would sync the host
                # into every step and block async dispatch of the next one
                losses_seen.append(loss)
                step_no += 1
                if writer:
                    # same scalars the reference logs (train_mhop.py:193-196)
                    # — the writer path pays the one sync it needs
                    lval = float(loss)
                    smoothed = (lval if smoothed is None
                                else 0.99 * smoothed + 0.01 * lval)
                    writer.add_scalar("batch_train_loss", lval, step_no)
                    writer.add_scalar("smoothed_train_loss", smoothed, step_no)
            losses_seen = [float(l) for l in losses_seen]
            mrrs = evaluate_mrr(self.eval_step, self.state.params,
                                self.eval_loader)
            stats = EpochStats(float(np.mean(losses_seen)),
                               mrrs["mrr_1"], mrrs["mrr_2"])
            history.append(stats)
            if writer:
                writer.add_scalar("dev_mrr", stats.mrr_avg, epoch)
            self.log(f"epoch {epoch}: loss={stats.train_loss:.4f} "
                     f"mrr1={stats.mrr_1:.4f} mrr2={stats.mrr_2:.4f}")
            if self.output_dir:
                self._ckpt.save_pytree(f"{self.output_dir}/checkpoint_last",
                                       self.state.params)
                if stats.mrr_avg > self.best_mrr:
                    self.best_mrr = stats.mrr_avg
                    self._ckpt.save_pytree(f"{self.output_dir}/checkpoint_best",
                                           self.state.params)
            else:
                self.best_mrr = max(self.best_mrr, stats.mrr_avg)
            if checkpointer:
                checkpointer.save(self.state, epoch=epoch,
                                  best_metric=self.best_mrr,
                                  rng_state=self.train_loader.rng_state())
                if checkpointer.preempted:
                    self.log("preemption signal received — state saved, "
                             "exiting for requeue")
                    break
        if writer:
            writer.close()
        return {"best_mrr": self.best_mrr,
                "final_loss": history[-1].train_loss if history else 0.0}
