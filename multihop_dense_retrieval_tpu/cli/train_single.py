"""CLI: single-hop (DPR-style) retriever training.

Working replacement for the reference's broken mdr/retrieval/train_single.py
(its `loss_single` import was deleted upstream, train_single.py:106 —
SURVEY.md §2.4).  Uses SingleRetriever + the in-batch DPR loss.

Usage:
  python -m multihop_dense_retrieval_tpu.cli.train_single \
      --train-file t.jsonl --predict-file d.jsonl --tokenizer hash \
      --model-name tiny --num-epochs 2 [--fever] [--separate-encoders]
"""

import argparse

import jax

from ..core.config import RetrieverTrainConfig
from ..core.mesh import make_mesh
from ..data import BatchLoader
from ..data.sp_datasets import SPDataset, sp_collate
from ..models import SingleRetriever
from ..train.trainer import RetrieverTrainer
from . import common


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-file", required=True)
    p.add_argument("--predict-file", required=True)
    p.add_argument("--output-dir", default="")
    p.add_argument("--tokenizer", default="hash")
    p.add_argument("--model-name", default="roberta-base")
    p.add_argument("--init-checkpoint", default="")
    p.add_argument("--train-batch-size", type=int, default=128)
    p.add_argument("--predict-batch-size", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=2e-5)
    p.add_argument("--num-epochs", type=int, default=40)
    p.add_argument("--warmup-ratio", type=float, default=0.1)
    p.add_argument("--max-q-len", type=int, default=50)
    p.add_argument("--max-c-len", type=int, default=300)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--fever", action="store_true")
    p.add_argument("--separate-encoders", action="store_true",
                   help="separate q/ctx towers (BertRetrieverSingle parity)")
    p.add_argument("--momentum", action="store_true",
                   help="token-queue memory bank re-encoded with the "
                        "current encoder each step (MomentumRetriever "
                        "parity, models/retriever.py:76-141)")
    p.add_argument("--queue-size", type=int, default=256)
    p.add_argument("--data-parallel", type=int, default=None)
    args = p.parse_args(argv)

    logger = common.setup_logging(args.output_dir or None)
    enc_cfg = common.resolve_encoder_config(args.model_name)
    tok = common.resolve_tokenizer(args.tokenizer)
    model = SingleRetriever(enc_cfg, shared=not args.separate_encoders)
    import jax.numpy as jnp
    ids = jnp.ones((1, 8), jnp.int32)
    batch0 = {"q_input_ids": ids, "q_mask": ids, "c_input_ids": ids,
              "c_mask": ids, "neg_input_ids": ids, "neg_mask": ids}
    params = model.init(jax.random.PRNGKey(args.seed), batch0)
    if args.init_checkpoint:
        # the loaded tree holds one {encoder, project} tower; merge it
        # OVER the init tree so --separate-encoders' q tower (encoder_q /
        # project_q, absent from the checkpoint) is seeded from it too —
        # wholesale replacement left those params missing and the first
        # apply raised
        loaded = common.load_retriever_params(args.init_checkpoint, enc_cfg)
        lp, ip = loaded["params"], dict(params["params"])
        ip.update(lp)
        if args.separate_encoders:
            ip["encoder_q"] = lp["encoder"]
            if "project" in lp and "project_q" in ip:
                ip["project_q"] = lp["project"]
        params = {"params": ip}

    kw = dict(max_q_len=args.max_q_len, max_c_len=args.max_c_len,
              fever=args.fever)
    train_ds = SPDataset(tok, args.train_file, train=True, seed=args.seed, **kw)
    eval_ds = SPDataset(tok, args.predict_file, **kw)
    train_loader = BatchLoader(train_ds, args.train_batch_size, shuffle=True,
                               seed=args.seed, collate=sp_collate)
    eval_loader = BatchLoader(eval_ds, args.predict_batch_size,
                              collate=sp_collate)
    cfg = RetrieverTrainConfig(
        batch_size=args.train_batch_size,
        eval_batch_size=args.predict_batch_size,
        learning_rate=args.learning_rate, num_epochs=args.num_epochs,
        warmup_ratio=args.warmup_ratio, seed=args.seed,
        max_q_len=args.max_q_len, max_c_len=args.max_c_len)
    mesh = make_mesh(data=args.data_parallel or len(jax.devices()), index=1)

    from ..train import trainer as T
    trainer = RetrieverTrainer(model, cfg, train_loader, eval_loader,
                               init_params=params, mesh=mesh,
                               output_dir=args.output_dir or None,
                               log_fn=logger.info)
    # swap in single-hop steps
    if args.momentum:
        trainer.state = T.TokenQueueTrainState.create(
            params, trainer.tx, queue_size=args.queue_size,
            max_c_len=args.max_c_len, cls_id=tok.spec.cls_id,
            sep_id=tok.spec.sep_id)
        trainer.train_step = T.make_single_momentum_train_step(
            model, trainer.tx, mesh=mesh)
    else:
        trainer.train_step = T.make_train_step(model, trainer.tx,
                                               task="single", mesh=mesh)
    trainer.eval_step = T.make_eval_step(model, task="single", mesh=mesh)
    result = trainer.run()
    logger.info("single-hop training finished: %s", result)
    return result


if __name__ == "__main__":
    main()
