"""CLI: multi-host (TPU pod) process runner.

The reference scales across hosts with submitit/SLURM + torch DDP
(mdr/retrieval/train_mhop.py:66-77, submitit jobs in scripts/); the
TPU-native equivalent is one JAX process per host joined into a single
global device mesh via `jax.distributed.initialize`.  After initialization,
`jax.devices()` returns every chip in the pod and the framework's existing
`make_mesh(data=..., index=...)` + jit `in_shardings` paths work unchanged
— XLA routes collectives (gradient psum, index all-gather) over ICI.

Usage — run the SAME command on every host of the pod:

  # on a Cloud TPU pod slice, coordination is auto-detected from the
  # TPU metadata (no flags needed):
  python -m multihop_dense_retrieval_tpu.cli.pod train_retriever \
      --train-file ... --output-dir gs://.../run1

  # on generic multi-host clusters, pass the rendezvous explicitly,
  # varying --process-id per host:
  python -m multihop_dense_retrieval_tpu.cli.pod \
      --coordinator host0:8476 --num-processes 2 --process-id 0 \
      train_retriever --train-file ...

Host-local responsibilities follow the JAX multi-process model: every
process runs the same program over its local shard of the batch; orbax
checkpointing is multi-process-aware (all processes participate in save);
only process 0 should write logs/metrics (the trainer already keys its
writers on `jax.process_index() == 0` via utils/meters.py).
"""

import argparse
import importlib
import sys

ENTRY_POINTS = [
    "train_retriever", "train_momentum", "train_single", "train_qa",
    "encode_corpus", "eval_mhop_retrieval", "eval_mhop_fever",
    "eval_retrieval", "eval_reranked", "end2end", "launch",
]


def main(argv=None):
    p = argparse.ArgumentParser(
        description="initialize jax.distributed, then run a framework CLI")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (omit on Cloud TPU "
                        "pods: auto-detected from metadata)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--local-device-ids", default=None,
                   help="comma-separated local device ids (advanced)")
    p.add_argument("entry", choices=ENTRY_POINTS,
                   help="framework CLI to run across the pod")
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="arguments forwarded to the entry point")
    args = p.parse_args(argv)

    import jax

    kw = {}
    if args.coordinator is not None:
        kw["coordinator_address"] = args.coordinator
    if args.num_processes is not None:
        kw["num_processes"] = args.num_processes
    if args.process_id is not None:
        kw["process_id"] = args.process_id
    if args.local_device_ids is not None:
        kw["local_device_ids"] = [int(x) for x
                                  in args.local_device_ids.split(",")]
    jax.distributed.initialize(**kw)
    print(f"# pod: process {jax.process_index()}/{jax.process_count()}, "
          f"{len(jax.local_devices())} local / {len(jax.devices())} global "
          f"devices", file=sys.stderr)

    mod = importlib.import_module(
        f"multihop_dense_retrieval_tpu.cli.{args.entry}")
    return mod.main(args.rest)


if __name__ == "__main__":
    main()
