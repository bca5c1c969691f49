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
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import INDEX_AXIS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Donated updaters: on TPU the buffer is updated in place (no multi-GB
# copy per append/replace); donation is ignored (plain copy) on CPU.
@functools.partial(jax.jit, donate_argnums=0)
def _update_rows(buf, rows, start):
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype),
                                        (start, 0))


@functools.partial(jax.jit, donate_argnums=0)
def _update_scales(buf, scales, start):
    return jax.lax.dynamic_update_slice(buf, scales.astype(buf.dtype),
                                        (start,))


@dataclasses.dataclass
class DenseIndex:
    vectors: jnp.ndarray  # (N_pad, D): bf16, fp32 (CPU tests), or int8
    n_docs: int           # true row count
    scales: Optional[jnp.ndarray] = None  # (N_pad,) f32, int8 indexes only
    # rows per document (MultiVectorCtxEncoder output is grouped per
    # passage: doc_id = row // multi_vector — the reference's idx→id map,
    # utils/gen_index_id_map.py:6-14, by layout instead of a table)
    multi_vector: int = 1
    # LAYOUT granularity: the padded row count stays a multiple of this
    # (× n_shards).  Distinct from SearchConfig.chunk_rows (the XLA scan
    # tile) — growing by the scan tile (131072 default) would add up to
    # ~1M zero rows on a one-document append.
    chunk_rows: int = 4096
    # Optional PCA prefilter (ops/mips.py::mips_topk_pca): rotation,
    # projected rows, and per-chunk certificate bounds.  Built with
    # `build(..., pca_dims=R)`; online updates keep the bounds SOUND
    # (upper bounds never shrink — see _pca_ingest) at some loss of
    # tightness after many replaces/deletes.
    pca_rot: Optional[jnp.ndarray] = None      # (D, R) f32
    pca_proj: Optional[jnp.ndarray] = None     # (N_pad, R) bf16
    pca_bounds: Optional[jnp.ndarray] = None   # (4, N_pad/cand_rows) f32
    pca_cand_rows: int = 512

    @property
    def n_passages(self) -> int:
        """Distinct documents in the index (= n_docs / multi_vector)."""
        return self.n_docs // self.multi_vector

    @classmethod
    def build(cls, embeddings: np.ndarray, *, chunk_rows: int = 4096,
              n_shards: int = 1, dtype=jnp.bfloat16,
              mesh: Optional[Mesh] = None,
              multi_vector: int = 1,
              pca_dims: Optional[int] = None,
              pca_cand_rows: int = 512,
              pca_sample: int = 131072) -> "DenseIndex":
        n, d = embeddings.shape
        assert n % max(multi_vector, 1) == 0, \
            "embedding rows must be a whole number of documents"
        n_pad = _round_up(n, chunk_rows * n_shards)
        out = np.zeros((n_pad, d), dtype=np.float32)
        out[:n] = np.asarray(embeddings, np.float32)
        scales = None
        if jnp.dtype(dtype) == jnp.int8:
            # symmetric per-row int8: halves HBM vs bf16, quarter of the
            # reference's fp32 FAISS index; recall parity tested.
            # Quantize HOST-side in chunks (same arithmetic as
            # ops/mips.py::quantize_rows): the eager device path put the
            # full padded fp32 corpus (16 GB at 5.2M×768) plus elementwise
            # temporaries in HBM for an output that is only ~4 GB.
            q = np.empty((n_pad, d), np.int8)
            sc = np.empty((n_pad,), np.float32)
            for s0 in range(0, n_pad, 65536):
                e0 = min(s0 + 65536, n_pad)
                x = out[s0:e0]
                s_chunk = np.maximum(np.max(np.abs(x), axis=1) / 127.0,
                                     1e-10).astype(np.float32)
                q[s0:e0] = np.clip(np.round(x / s_chunk[:, None]),
                                   -127, 127).astype(np.int8)
                sc[s0:e0] = s_chunk
            arr, scales = jnp.asarray(q), jnp.asarray(sc)
        else:
            # convert host-side too: transferring fp32 then casting on
            # device doubles the peak HBM of a bf16 build
            arr = jnp.asarray(out.astype(jnp.dtype(dtype)))
        rot = proj = bounds = None
        if pca_dims:
            from ..ops.mips import build_pca_prefilter, train_pca_rotation

            assert n_pad % pca_cand_rows == 0, \
                "pca_cand_rows must divide the padded row count"
            rot_np = train_pca_rotation(out[:min(n, pca_sample)],
                                        min(pca_dims, d))
            proj_np, bounds_np = build_pca_prefilter(
                out, rot_np, cand_rows=pca_cand_rows,
                scales=None if scales is None else np.asarray(scales),
                store_dtype=str(jnp.dtype(dtype)))
            rot = jnp.asarray(rot_np)
            proj = jnp.asarray(proj_np, jnp.bfloat16)
            bounds = jnp.asarray(bounds_np)
        if mesh is not None:
            sh = NamedSharding(mesh, P(INDEX_AXIS, None))
            arr = jax.device_put(arr, sh)
            if scales is not None:
                scales = jax.device_put(scales, NamedSharding(mesh, P(INDEX_AXIS)))
            if proj is not None:
                # same placements as shard()/load(mesh=) — leaving the
                # (N, R) projection unsharded would redistribute it to
                # match shard_map's in_spec on every search call
                proj = jax.device_put(proj, sh)
                bounds = jax.device_put(
                    bounds, NamedSharding(mesh, P(None, INDEX_AXIS)))
                rot = jax.device_put(rot, NamedSharding(mesh, P(None, None)))
        return cls(vectors=arr, n_docs=n, scales=scales,
                   multi_vector=max(multi_vector, 1),
                   pca_rot=rot, pca_proj=proj, pca_bounds=bounds,
                   pca_cand_rows=pca_cand_rows, chunk_rows=chunk_rows)

    def shard(self, mesh: Mesh) -> "DenseIndex":
        arr = jax.device_put(self.vectors, NamedSharding(mesh, P(INDEX_AXIS, None)))
        scales = None if self.scales is None else jax.device_put(
            self.scales, NamedSharding(mesh, P(INDEX_AXIS)))
        pca = {}
        if self.pca_proj is not None:
            # rows of the projection follow the index shards; per-chunk
            # bounds shard along their chunk axis; the rotation replicates
            pca = dict(
                pca_proj=jax.device_put(
                    self.pca_proj, NamedSharding(mesh, P(INDEX_AXIS, None))),
                pca_bounds=jax.device_put(
                    self.pca_bounds, NamedSharding(mesh, P(None, INDEX_AXIS))),
                pca_rot=jax.device_put(
                    self.pca_rot, NamedSharding(mesh, P(None, None))))
        return dataclasses.replace(self, vectors=arr, scales=scales, **pca)

    # ---- online updates (serving) ----------------------------------------
    #
    # FAISS-parity `add` (eval_mhop_retrieval.py:121-122) plus the
    # `remove_ids` story a production serving index needs, TPU-native:
    # updates are donated jitted dynamic_update_slice calls, so appends
    # into existing padding and in-place replacements never copy the
    # multi-GB buffer on TPU (donation is a no-op copy on CPU tests).
    # Consequence: the PREVIOUS index object is consumed — use only the
    # returned index afterwards.  All row arithmetic is in DOCUMENT units
    # of `multi_vector` rows.

    def _quantize_like(self, rows: np.ndarray):
        rows32 = jnp.asarray(np.asarray(rows, np.float32))
        if self.scales is not None:
            from ..ops.mips import quantize_rows

            return quantize_rows(rows32)
        return rows32.astype(self.vectors.dtype), None

    def _pca_ingest(self, proj, bounds, rows, scales_new, start: int):
        """Project newly stored rows and MAX-IN their certificate bounds.

        Bounds only ever grow, so every certificate issued afterwards
        remains a true upper bound (sound); stale contributions from
        replaced/deleted rows just cost tightness.  `rows` is the stored
        representation (int8 values / bf16 rows)."""
        if self.scales is not None:
            xd = rows.astype(jnp.float32) * scales_new.reshape(-1, 1)
        else:
            xd = rows.astype(jnp.float32)
        p = xd @ self.pca_rot
        pb = p.astype(proj.dtype)
        pb32 = pb.astype(jnp.float32)
        quant = jnp.stack([
            jnp.sqrt(jnp.maximum(jnp.sum(xd * xd, 1) - jnp.sum(p * p, 1), 0)),
            jnp.linalg.norm(p - pb32, axis=1),
            jnp.linalg.norm(pb32, axis=1),
            jnp.linalg.norm(xd, axis=1),
        ]) * (1 + 1e-6) + 1e-6          # fp32-accumulation safety margin
        proj = _update_rows(proj, pb, start)
        cols = (start + jnp.arange(rows.shape[0])) // self.pca_cand_rows
        bounds = bounds.at[:, cols].max(quant)
        return proj, bounds

    def append(self, embeddings: np.ndarray, *,
               chunk_rows: Optional[int] = None,
               n_shards: int = 1) -> "DenseIndex":
        """Add documents; returns the updated index.  New rows land in the
        existing tail padding when they fit (in-place slice update); the
        buffer grows to the next (chunk_rows × n_shards) multiple otherwise
        (default: the index's own layout granularity).
        """
        chunk_rows = chunk_rows or self.chunk_rows
        rows, scales_new = self._quantize_like(embeddings)
        m = rows.shape[0]
        assert m % self.multi_vector == 0, \
            "appended rows must be whole documents"
        n_pad = self.vectors.shape[0]
        proj, bounds = self.pca_proj, self.pca_bounds
        if self.n_docs + m > n_pad:
            grow_to = _round_up(self.n_docs + m, chunk_rows * n_shards)
            pad = grow_to - n_pad
            vec = jnp.concatenate(
                [self.vectors,
                 jnp.zeros((pad, self.vectors.shape[1]),
                           self.vectors.dtype)], axis=0)
            scales = None if self.scales is None else jnp.concatenate(
                [self.scales, jnp.zeros((pad,), self.scales.dtype)])
            if proj is not None:
                assert grow_to % self.pca_cand_rows == 0
                proj = jnp.concatenate(
                    [proj, jnp.zeros((pad, proj.shape[1]), proj.dtype)])
                bounds = jnp.concatenate(
                    [bounds,
                     jnp.zeros((4, pad // self.pca_cand_rows),
                               bounds.dtype)], axis=1)
        else:
            vec, scales = self.vectors, self.scales
        vec = _update_rows(vec, rows, self.n_docs)
        if scales is not None:
            scales = _update_scales(scales, scales_new, self.n_docs)
        if proj is not None:
            proj, bounds = self._pca_ingest(proj, bounds, rows, scales_new,
                                            self.n_docs)
        return dataclasses.replace(self, vectors=vec, n_docs=self.n_docs + m,
                                   scales=scales, pca_proj=proj,
                                   pca_bounds=bounds)

    def replace(self, doc_id: int, embeddings: np.ndarray) -> "DenseIndex":
        """Overwrite one document's vector(s) in place (donated update)."""
        rows, scales_new = self._quantize_like(embeddings)
        assert rows.shape[0] == self.multi_vector
        start = doc_id * self.multi_vector
        assert 0 <= start < self.n_docs
        vec = _update_rows(self.vectors, rows, start)
        scales = self.scales
        if scales is not None:
            scales = _update_scales(scales, scales_new, start)
        proj, bounds = self.pca_proj, self.pca_bounds
        if proj is not None:
            proj, bounds = self._pca_ingest(proj, bounds, rows, scales_new,
                                            start)
        return dataclasses.replace(self, vectors=vec, scales=scales,
                                   pca_proj=proj, pca_bounds=bounds)

    def delete_swap(self, doc_id: int):
        """Swap-delete a document: the LAST document moves into its slot and
        n_docs shrinks (padding stays masked via n_valid in ops/mips.py —
        deleted rows can never surface in results).  Returns
        (index, moved_doc_id): the caller must move the same row of its doc
        table (text ids / titles) — or None when the last doc was deleted.
        """
        last = self.n_passages - 1
        assert 0 <= doc_id <= last
        mv = self.multi_vector
        vec, scales = self.vectors, self.scales
        proj, bounds = self.pca_proj, self.pca_bounds
        moved = None
        if doc_id != last:
            rows = jax.lax.dynamic_slice(
                vec, (last * mv, 0), (mv, vec.shape[1]))
            vec = _update_rows(vec, rows, doc_id * mv)
            if scales is not None:
                sc = jax.lax.dynamic_slice(scales, (last * mv,), (mv,))
                scales = _update_scales(scales, sc, doc_id * mv)
            if proj is not None:
                p = jax.lax.dynamic_slice(proj, (last * mv, 0),
                                          (mv, proj.shape[1]))
                proj = _update_rows(proj, p, doc_id * mv)
                # the SOURCE chunk's bound dominates the moved rows' — a
                # sound (if loose) transfer without per-row bound storage
                r = jnp.arange(mv)
                srcs = (last * mv + r) // self.pca_cand_rows
                tgts = (doc_id * mv + r) // self.pca_cand_rows
                bounds = bounds.at[:, tgts].max(bounds[:, srcs])
            moved = last
        idx = dataclasses.replace(self, vectors=vec,
                                  n_docs=self.n_docs - mv, scales=scales,
                                  pca_proj=proj, pca_bounds=bounds)
        return idx, moved

    # ---- persistence -----------------------------------------------------

    def save(self, path: str):
        extra = {"multi_vector": self.multi_vector,
                 "chunk_rows": self.chunk_rows}
        if self.scales is not None:
            extra["scales"] = np.asarray(jax.device_get(self.scales))
        if self.pca_proj is not None:
            extra["pca_rot"] = np.asarray(jax.device_get(self.pca_rot))
            extra["pca_proj"] = np.asarray(jax.device_get(
                jax.lax.bitcast_convert_type(self.pca_proj, jnp.uint16)))
            extra["pca_bounds"] = np.asarray(jax.device_get(self.pca_bounds))
            extra["pca_cand_rows"] = self.pca_cand_rows
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
        pca = {}
        if "pca_proj" in z.files:
            pca = dict(
                pca_rot=jnp.asarray(z["pca_rot"]),
                pca_proj=jax.lax.bitcast_convert_type(
                    jnp.asarray(z["pca_proj"]), jnp.bfloat16),
                pca_bounds=jnp.asarray(z["pca_bounds"]),
                pca_cand_rows=int(z["pca_cand_rows"]))
        cr = int(z["chunk_rows"]) if "chunk_rows" in z.files else 4096
        idx = cls(vectors=arr, n_docs=int(z["n_docs"]), scales=scales,
                  multi_vector=mv, chunk_rows=cr, **pca)
        return idx.shard(mesh) if mesh is not None else idx

    @classmethod
    def from_reference_npy(cls, npy_path: str, **kw) -> "DenseIndex":
        """Ingest the reference's wiki_index.npy (fp32 (N,768), README.md:41)."""
        return cls.build(np.load(npy_path, mmap_mode="r"), **kw)
