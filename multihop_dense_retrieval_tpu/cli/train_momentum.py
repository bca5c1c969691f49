"""CLI: stage-2 memory-bank finetuning (equivalent of scripts/train_momentum.py).

Initializes both encoders from a stage-1 checkpoint (--init-checkpoint, cf.
train_momentum.py --init-retriever) and trains encoder_q against the frozen
encoder_k with a (K, h) embedding queue of extra negatives.  `--enable-ema`
turns on the MoCo EMA update the reference ships commented out
(criterions.py:144).
"""

import argparse

import jax

from ..train.trainer import RetrieverTrainer
from . import common
from .train_retriever import add_train_args, build
import dataclasses


def main(argv=None):
    p = argparse.ArgumentParser()
    add_train_args(p)
    p.add_argument("--queue-size", type=int, default=76800)
    p.add_argument("--momentum-m", type=float, default=0.999)
    p.add_argument("--enable-ema", action="store_true")
    p.add_argument("--fever", action="store_true",
                   help="FEVER multi-hop claims (the reference auto-detects "
                        "'fever' in the path, train_momentum.py:86-91)")
    args = p.parse_args(argv)
    logger = common.setup_logging(args.output_dir or None)
    make_datasets = None
    if args.fever or "fever" in args.train_file.lower():
        from ..data.unified_dataset import FeverDataset

        def make_datasets(tok, kw):
            return (FeverDataset(tok, args.train_file, train=True,
                                 seed=args.seed, **kw),
                    FeverDataset(tok, args.predict_file, **kw))
    cfg, model, params, train_loader, eval_loader, mesh = build(
        args, make_datasets=make_datasets)
    cfg = dataclasses.replace(cfg, momentum=True, queue_size=args.queue_size,
                              momentum_m=args.momentum_m)
    trainer = RetrieverTrainer(model, cfg, train_loader, eval_loader,
                               init_params=params, mesh=mesh,
                               output_dir=args.output_dir or None,
                               log_fn=logger.info, enable_ema=args.enable_ema)
    result = trainer.run()
    logger.info("momentum training finished: %s", result)
    return result


if __name__ == "__main__":
    main()
