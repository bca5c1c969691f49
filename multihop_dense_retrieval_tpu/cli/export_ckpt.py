"""CLI: export a TPU-trained checkpoint to a reference torch state dict.

Closes the interop loop that convert.py opens: convert.py ingests the
reference's released ``*.pt`` files; this emits ``*.pt`` files the reference
loads back with its strict ``load_saved`` (mdr/retrieval/utils/utils.py:10-22)
— so a model trained here drops into the reference's eval scripts (e.g.
``eval_mhop_retrieval.py --model-path exported.pt``) unchanged.

    python -m multihop_dense_retrieval_tpu.cli.export_ckpt \
        --checkpoint runs/mhop/checkpoint_best --arch mhop \
        --out q_encoder.pt

Arches map to reference modules: mhop → RobertaRetriever (also the momentum
trainer's encoder_q and RobertaRetrieverSingle — same layout), unified →
UnifiedRetriever, reader → ELECTRA QAModel, reader-bert → BERT QAModel
(HF-pooler layout, qa_model.py:53-57).  Round-trips are bit-exact
(tests/test_export.py).
"""

import argparse

import numpy as np

from ..models import export as ex


def _load_params(checkpoint: str) -> dict:
    if checkpoint.endswith(".pt"):
        raise SystemExit(
            "--checkpoint is already a torch state dict; export reads the "
            "orbax directories this framework trains into")
    import jax

    from ..core import checkpoint as ckpt

    tree = ckpt.restore_pytree(checkpoint)
    tree = jax.tree_util.tree_map(np.asarray, tree)
    # trainers save model.init output: variables under a "params" collection
    while isinstance(tree, dict) and set(tree) == {"params"}:
        tree = tree["params"]
    if "encoder" not in tree:
        raise SystemExit(
            f"checkpoint tree has keys {sorted(tree)} — expected a model "
            "params tree with an 'encoder' (is this a full TrainState dir? "
            "export the checkpoint_best/checkpoint_last params directory)")
    return tree


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax params directory (checkpoint_best/_last)")
    p.add_argument("--arch", required=True,
                   choices=["mhop", "unified", "reader", "reader-bert"])
    p.add_argument("--out", required=True, help="output .pt path")
    args = p.parse_args(argv)

    params = _load_params(args.checkpoint)
    if args.arch == "mhop":
        sd = ex.retriever_flax_to_ckpt(params)
    elif args.arch == "unified":
        sd = ex.unified_flax_to_ckpt(params)
    else:
        sd = ex.reader_flax_to_ckpt(params, electra=args.arch == "reader")
    ex.save_torch_state_dict(sd, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
