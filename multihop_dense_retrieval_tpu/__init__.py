"""multihop_dense_retrieval_tpu — a TPU-native multi-hop dense retrieval framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
facebookresearch/multihop_dense_retrieval (MDR, ICLR'21 "Answering Complex
Open-Domain Questions with Multi-Hop Dense Retrieval"):

  * shared bi-encoder retrievers (multi-hop, single-hop, momentum/memory-bank,
    unified variable-hop) — `models/`
  * exact MIPS over an HBM-resident sharded index (Pallas fused matmul+top-k,
    XLA chunked fallback) — `ops/`, `index/`
  * single-jit 2-hop beam search pipeline — `search/`
  * contrastive training (in-batch negatives + memory bank) — `train/`
  * ELECTRA span-extraction reader with chain ranking + supporting-fact
    prediction — `models/reader.py`, `train/qa.py`
  * retrieval + HotpotQA metrics — `eval/`

Where the reference leans on external native libraries (FAISS C++/CUDA, apex,
NCCL), this framework is TPU-first: bf16 on the MXU, `jax.sharding.Mesh` +
`shard_map` over ICI, and static-shape jit programs end to end.
"""

__version__ = "0.1.0"
