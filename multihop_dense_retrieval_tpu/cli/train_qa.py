"""CLI: train/evaluate the QA reader (equivalent of scripts/train_qa.py).

Train rows are retriever outputs with gold sp chains (see data/qa_dataset.py).

Usage:
  python -m multihop_dense_retrieval_tpu.cli.train_qa \
      --train-file train.jsonl --predict-file dev.jsonl --output-dir out \
      --tokenizer hash --model-name tiny --num-epochs 2
  python -m multihop_dense_retrieval_tpu.cli.train_qa --do-predict \
      --predict-file dev.jsonl --checkpoint out/checkpoint_best ...
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EncoderConfig, ReaderConfig, RetrieverTrainConfig
from ..core import checkpoint as ckpt
from ..data.qa_dataset import QADataset, QAGroupSampler, qa_collate
from ..eval.qa_eval import predict
from ..models.reader import QAReader
from ..train import qa as TQA
from ..train.trainer import TrainState, make_optimizer
from . import common


READER_PRESETS = {
    "electra-large": EncoderConfig.electra_large,
    "bert-base-uncased": EncoderConfig.bert_base_uncased,
    "tiny": lambda **kw: EncoderConfig.tiny(
        vocab_size=50265, max_position_embeddings=514, type_vocab_size=2,
        pad_token_id=0, roberta_positions=False, **kw),
    # 4-layer/64-wide CPU-fast preset (see cli/common.py MODEL_PRESETS):
    # deep enough to learn token-matching circuits the 2-layer tiny cannot
    "mini": lambda **kw: EncoderConfig.tiny(
        vocab_size=50265, max_position_embeddings=514, type_vocab_size=2,
        pad_token_id=0, roberta_positions=False, hidden_size=64,
        num_layers=4, intermediate_size=128, **kw),
}


def init_reader(model_name: str, checkpoint: str, sp_pred: bool, seed: int = 0,
                scores_dtype: str = "float32", remat: bool = False):
    """scores_dtype="bfloat16" keeps attention scores/softmax in bf16 —
    measured on-chip at +1.5%/+5%/+11% reader throughput for widths
    256/384/512 (PERF.md), and validated with TRAINED weights: a reader
    trained in-repo on synthetic data (eval chain-EM 1.0, answer EM 0.97)
    produces 100% answer agreement and identical metrics under bf16
    scores (scripts_dev/fidelity_trained.py).  Serving CLIs default to
    bf16 (--reader-fp32-scores reverts)."""
    cfg = READER_PRESETS[model_name](attention_scores_dtype=scores_dtype)
    model = QAReader(cfg, sp_pred=sp_pred, remat=remat)
    if checkpoint.endswith(".pt"):
        from ..models import convert
        sd = convert.load_torch_state_dict(checkpoint)
        params = {"params": convert.reader_ckpt_to_flax(sd, cfg, sp_pred=sp_pred)}
    elif checkpoint:
        params = ckpt.restore_pytree(checkpoint)
    else:
        dummy = {
            "input_ids": jnp.ones((1, 16), jnp.int32),
            "attention_mask": jnp.ones((1, 16), jnp.int32),
            "token_type_ids": jnp.zeros((1, 16), jnp.int32),
            "paragraph_mask": jnp.ones((1, 16), jnp.int32),
            "sent_offsets": jnp.zeros((1, 4), jnp.int32),
            "sent_mask": jnp.ones((1, 4), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(seed), dummy)
    return cfg, model, params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-file", default="")
    p.add_argument("--predict-file", required=True)
    p.add_argument("--output-dir", default="")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--model-name", default="electra-large")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--do-predict", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--predict-batch-size", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=5e-5)
    p.add_argument("--num-epochs", type=int, default=5)
    p.add_argument("--warmup-ratio", type=float, default=0.1)
    p.add_argument("--max-seq-len", type=int, default=512)
    p.add_argument("--max-q-len", type=int, default=64)
    p.add_argument("--max-ans-len", type=int, default=30)
    p.add_argument("--num-answer-slots", type=int, default=10)
    p.add_argument("--max-sents", type=int, default=40)
    p.add_argument("--neg-num", type=int, default=5)
    p.add_argument("--sp-weight", type=float, default=0.05,
                   help="sp BCE weight.  NOTE: the reference's 0.05 was "
                        "tuned with its offset-multiply inflation (~100x, "
                        "train/qa.py) — sweep upward (1-10) when chasing "
                        "its sp_em/sp_f1")
    p.add_argument("--no-sp", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder layers in the backward pass "
                        "(ELECTRA-large at 512 tokens on one chip needs it; "
                        "replaces the reference's fp16+grad-accum recipe)")
    p.add_argument("--fixed-lambda", type=float, default=None)
    common.add_rank_args(p)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    logger = common.setup_logging(args.output_dir or None)
    sp_pred = not args.no_sp
    tok = common.resolve_tokenizer(args.tokenizer, roberta_style=False)
    _, model, params = init_reader(args.model_name, args.checkpoint, sp_pred,
                                   args.seed, remat=args.remat)
    kw = dict(max_seq_len=args.max_seq_len, max_q_len=args.max_q_len,
              num_answer_slots=args.num_answer_slots, max_sents=args.max_sents)
    eval_ds = QADataset(tok, args.predict_file, train=False, **kw)
    pred_step = TQA.make_qa_predict_step(model, max_ans_len=args.max_ans_len)
    rank_kw = {}
    if args.rank_topm:
        rank_kw = dict(rank_step=TQA.make_qa_rank_step(model),
                       rank_topm=args.rank_topm, rank_width=args.rank_width)
    lambdas = [args.fixed_lambda] if args.fixed_lambda is not None else None

    if args.do_predict or not args.train_file:
        res = predict(pred_step, params, eval_ds,
                      batch_size=args.predict_batch_size, sp_pred=sp_pred,
                      lambdas=lambdas, **rank_kw)
        logger.info("chain ranking em: %.4f", res["chain_em"])
        best = {k: v for k, v in res["best"].items()
                if k not in ("answers", "sp")}
        logger.info("best: %s", json.dumps(best))
        print(json.dumps({"chain_em": res["chain_em"], **best}))
        return res

    train_ds = QADataset(tok, args.train_file, train=True, **kw)
    sampler = QAGroupSampler(train_ds, neg_num=args.neg_num, seed=args.seed)
    steps_per_epoch = max(len(sampler) // args.batch_size, 1)
    tcfg = RetrieverTrainConfig(learning_rate=args.learning_rate,
                                warmup_ratio=args.warmup_ratio)
    tx = make_optimizer(tcfg, steps_per_epoch * args.num_epochs)
    state = TrainState.create(params, tx)
    train_step = TQA.make_qa_train_step(model, tx, sp_weight=args.sp_weight,
                                        sp_pred=sp_pred)

    best_metric, result = -1.0, None
    for epoch in range(args.num_epochs):
        idxs = sampler.epoch_indices()
        if len(idxs) < args.batch_size:
            raise ValueError(
                f"epoch has {len(idxs)} sampled rows < batch size "
                f"{args.batch_size}: zero optimizer steps would run (and "
                "untrained weights would be saved) — shrink --batch-size "
                "or add training data")
        losses = []
        for s in range(0, len(idxs) - args.batch_size + 1, args.batch_size):
            batch = qa_collate([train_ds[i] for i in idxs[s:s + args.batch_size]])
            net = {k: jnp.asarray(v) for k, v in batch["net_inputs"].items()}
            state, loss = train_step(state, net)
            losses.append(float(loss))
        res = predict(pred_step, state.params, eval_ds,
                      batch_size=args.predict_batch_size, sp_pred=sp_pred,
                      lambdas=lambdas)
        # best-ckpt selection follows predict's own sweep metric: joint F1
        # when sp gold is live, answer F1 otherwise (a --no-sp run or an
        # sp-gold-less dev file pins joint_f1 at 0.0 — selecting on it
        # would freeze checkpoint_best at epoch 0)
        sel = res["best"]["selection_metric"]
        logger.info("epoch %d: loss=%.4f chain_em=%.4f em=%.4f f1=%.4f "
                    "joint_f1=%.4f", epoch, float(np.mean(losses)),
                    res["chain_em"], res["best"]["em"], res["best"]["f1"],
                    res["best"]["joint_f1"])
        if res["best"][sel] > best_metric:
            best_metric = res["best"][sel]
            result = res
            if args.output_dir:
                ckpt.save_pytree(f"{args.output_dir}/checkpoint_best",
                                 state.params)
        if args.output_dir:
            ckpt.save_pytree(f"{args.output_dir}/checkpoint_last", state.params)
    logger.info("training finished, best %s=%.4f",
                result["best"]["selection_metric"] if result else "metric",
                best_metric)
    return result


if __name__ == "__main__":
    main()
