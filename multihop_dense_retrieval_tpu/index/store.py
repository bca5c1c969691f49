"""Device-resident dense index: layout, padding, save/load, sharding.

Replaces the reference's `np.load(wiki_index.npy)` + FAISS `index.add`
(eval_mhop_retrieval.py:94,121-122) with an HBM-native layout:

  * rows padded to a multiple of (n_index_shards × chunk_rows) so both the
    Pallas grid and the shard_map split are exact;
  * bf16 storage (halves HBM vs the reference's fp32 FAISS index — the
    "equal index memory" budget in BASELINE.md is met with room to spare);
  * `n_docs` remembered so padded rows are masked inside the search kernels
    (ops/mips.py n_valid).

On disk: .npz with a uint16 view of the bf16 payload (numpy has no bf16).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import INDEX_AXIS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class DenseIndex:
    vectors: jnp.ndarray  # (N_pad, D): bf16, fp32 (CPU tests), or int8
    n_docs: int           # true row count
    scales: Optional[jnp.ndarray] = None  # (N_pad,) f32, int8 indexes only
    # rows per document (MultiVectorCtxEncoder output is grouped per
    # passage: doc_id = row // multi_vector — the reference's idx→id map,
    # utils/gen_index_id_map.py:6-14, by layout instead of a table)
    multi_vector: int = 1

    @property
    def n_passages(self) -> int:
        """Distinct documents in the index (= n_docs / multi_vector)."""
        return self.n_docs // self.multi_vector

    @classmethod
    def build(cls, embeddings: np.ndarray, *, chunk_rows: int = 4096,
              n_shards: int = 1, dtype=jnp.bfloat16,
              mesh: Optional[Mesh] = None,
              multi_vector: int = 1) -> "DenseIndex":
        n, d = embeddings.shape
        assert n % max(multi_vector, 1) == 0, \
            "embedding rows must be a whole number of documents"
        n_pad = _round_up(n, chunk_rows * n_shards)
        out = np.zeros((n_pad, d), dtype=np.float32)
        out[:n] = np.asarray(embeddings, np.float32)
        scales = None
        if jnp.dtype(dtype) == jnp.int8:
            # symmetric per-row int8: halves HBM vs bf16, quarter of the
            # reference's fp32 FAISS index; recall parity tested
            from ..ops.mips import quantize_rows

            arr, scales = quantize_rows(jnp.asarray(out))
        else:
            arr = jnp.asarray(out, dtype=dtype)
        if mesh is not None:
            sh = NamedSharding(mesh, P(INDEX_AXIS, None))
            arr = jax.device_put(arr, sh)
            if scales is not None:
                scales = jax.device_put(scales, NamedSharding(mesh, P(INDEX_AXIS)))
        return cls(vectors=arr, n_docs=n, scales=scales,
                   multi_vector=max(multi_vector, 1))

    def shard(self, mesh: Mesh) -> "DenseIndex":
        arr = jax.device_put(self.vectors, NamedSharding(mesh, P(INDEX_AXIS, None)))
        scales = None if self.scales is None else jax.device_put(
            self.scales, NamedSharding(mesh, P(INDEX_AXIS)))
        return DenseIndex(vectors=arr, n_docs=self.n_docs, scales=scales,
                          multi_vector=self.multi_vector)

    # ---- persistence -----------------------------------------------------

    def save(self, path: str):
        extra = {"multi_vector": self.multi_vector}
        if self.scales is not None:
            extra["scales"] = np.asarray(jax.device_get(self.scales))
        if self.vectors.dtype == jnp.bfloat16:
            payload = np.asarray(jax.device_get(
                jax.lax.bitcast_convert_type(self.vectors, jnp.uint16)))
            np.savez(path, payload=payload, dtype="bfloat16",
                     n_docs=self.n_docs, **extra)
        else:
            host = np.asarray(jax.device_get(self.vectors))
            np.savez(path, payload=host, dtype=str(host.dtype),
                     n_docs=self.n_docs, **extra)

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None) -> "DenseIndex":
        z = np.load(path)
        payload, dtype = z["payload"], str(z["dtype"])
        if dtype == "bfloat16":
            arr = jax.lax.bitcast_convert_type(jnp.asarray(payload), jnp.bfloat16)
        else:
            arr = jnp.asarray(payload)
        scales = jnp.asarray(z["scales"]) if "scales" in z.files else None
        mv = int(z["multi_vector"]) if "multi_vector" in z.files else 1
        idx = cls(vectors=arr, n_docs=int(z["n_docs"]), scales=scales,
                  multi_vector=mv)
        return idx.shard(mesh) if mesh is not None else idx

    @classmethod
    def from_reference_npy(cls, npy_path: str, **kw) -> "DenseIndex":
        """Ingest the reference's wiki_index.npy (fp32 (N,768), README.md:41)."""
        return cls.build(np.load(npy_path, mmap_mode="r"), **kw)
