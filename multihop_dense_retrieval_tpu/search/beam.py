"""Single-jit 2-hop beam search.

Re-design of the reference's serving loop (scripts/eval/eval_mhop_retrieval.py
:142-206), which round-trips host↔device four times per batch and re-tokenizes
full document text on the host for every hop-2 query (:159-168).  Here the
whole pipeline after question tokenization is ONE jitted program:

  encode q → sharded MIPS top-beam1 → empty-doc patch → on-device hop-2 query
  assembly (gather pre-tokenized doc ids + id-level pair concat) → encode q⊕p
  → sharded MIPS top-beam2 → path scores D1[:,:,None]+D2 → top-k chains.

The id-level concat is exactly HF pair encoding (the reference tokenizes q
and doc independently inside `encode_plus(q, text_pair=doc)`), including
longest-first truncation — see `truncate_longest_first`.

Chain ranking matches eval_mhop_retrieval.py:190-206: rank beam1×beam2 paths
by summed inner product, hop-1 score forced to -inf for empty-text docs
(:162-165).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.config import SearchConfig, default_hop2_tiling
from ..core.mesh import INDEX_AXIS
from ..data.tokenization import TokenizerSpec
from ..index.store import DenseIndex
from ..ops.mips import (sharded_mips_topk, sharded_mips_topk_pca,
                        mips_topk, mips_topk_pca, merge_multivector,
                        NEG_INF)


# donated in-place slice updaters shared with the index store — ONE
# definition of the donation-semantics-critical helpers
from ..index.store import _update_rows as _update2d  # noqa: E402
from ..index.store import _update_scales as _update1d  # noqa: E402


def truncate_longest_first(len_a: jnp.ndarray, len_b: jnp.ndarray, budget: int):
    """Final (len_a', len_b') after HF longest-first pair truncation.

    Closed form of "repeatedly drop one token from the longer side":
    the kept length of a is min(len_a, max(ceil(budget/2), budget - len_b)).
    """
    half = -(-budget // 2)
    a = jnp.minimum(len_a, jnp.maximum(half, budget - len_b))
    b = jnp.minimum(len_b, budget - a)
    return a, b


def assemble_pair_inputs(a_ids, a_lens, b_ids, b_lens, max_len: int,
                         spec: TokenizerSpec):
    """Vectorized on-device pair encoding: rows of raw ids (no specials) →
    (input_ids, attention_mask[, token_type_ids]) exactly as the host
    tokenizer's encode_pair would produce.

    a_ids: (B, La) int32, a_lens: (B,) — e.g. question tokens
    b_ids: (B, Lb) int32, b_lens: (B,) — e.g. gathered passage tokens
    """
    bsz = a_ids.shape[0]
    n_special = 4 if spec.roberta_style else 3
    budget = max_len - n_special
    ka, kb = truncate_longest_first(a_lens.astype(jnp.int32),
                                    b_lens.astype(jnp.int32), budget)
    ka = ka[:, None]  # (B, 1)
    kb = kb[:, None]
    j = jnp.arange(max_len, dtype=jnp.int32)[None, :]  # (1, L)

    n_mid = 2 if spec.roberta_style else 1
    a_start = 1
    sep1_pos = a_start + ka                       # first sep after a
    b_start = sep1_pos + n_mid
    sep_end = b_start + kb                        # final sep position
    total = sep_end + 1                           # sequence length

    a_gather = jnp.clip(j - a_start, 0, a_ids.shape[1] - 1)
    b_gather = jnp.clip(j - b_start, 0, b_ids.shape[1] - 1)
    a_tok = jnp.take_along_axis(a_ids, a_gather, axis=1)
    b_tok = jnp.take_along_axis(b_ids, b_gather, axis=1)

    ids = jnp.where(
        j == 0, spec.cls_id,
        jnp.where(j < sep1_pos, a_tok,
        jnp.where(j < b_start, spec.sep_id,
        jnp.where(j < sep_end, b_tok,
        jnp.where(j == sep_end, spec.sep_id, spec.pad_id)))))
    mask = (j < total).astype(jnp.int32)
    out = {"input_ids": ids.astype(jnp.int32), "attention_mask": mask}
    if not spec.roberta_style:
        out["token_type_ids"] = ((j >= b_start) & (j < total)).astype(jnp.int32)
    return out


@dataclasses.dataclass
class BeamSearcher:
    """2-hop retrieval engine over a device-resident index.

    encode_fn(params, input_ids, mask, token_type_ids=None) -> (B, D) fp32
    query vectors (typically MhopRetriever.encode_seq via functools.partial).
    token_type_ids matter for BERT-style tokenizers: hop-2 q⊕p pair inputs
    carry segment ids (assemble_pair_inputs) and the corpus was encoded with
    them (index/build.py), so queries must too.
    """

    encode_fn: callable
    params: Dict
    index: DenseIndex
    text_ids: jnp.ndarray    # (N_pad, Lt) token store (int32/uint16 on device)
    text_lens: jnp.ndarray   # (N_pad,)
    empty: jnp.ndarray       # (N_pad,) bool
    spec: TokenizerSpec
    config: SearchConfig
    mesh: Optional[Mesh] = None
    # Variable-hop (UnifiedRetriever) serving: encode_qsp_fn(params, ids,
    # mask, tt) -> (vectors, stop_logits).  When set, the search output
    # additionally carries stop_probs (B, beam1) = P(single-hop answer |
    # q ⊕ p1) from the stop head (class 0 = stop; training target 1 means a
    # second hop exists, data/unified_dataset.py:98).  The reference trained
    # this head but never shipped an eval for it (the UnifiedRetriever line
    # in eval_mhop_fever.py:88 is commented out) — the host layer decides
    # whether to emit a single-passage chain (cli/eval_mhop_retrieval
    # --unified --stop-threshold).
    encode_qsp_fn: Optional[callable] = None

    def __post_init__(self):
        cfg = self.config
        if cfg.stop_skip_threshold > 0 and self.encode_qsp_fn is None:
            raise ValueError(
                "stop_skip_threshold needs an engine built with "
                "encode_qsp_fn (the stop head lives on the q⊕p encoder) — "
                "a plain engine would silently never stop")
        # the big arrays (index + token store) are explicit jit ARGUMENTS —
        # closing over them would bake gigabytes of constants into the
        # compiled program (and re-lower them on every trace)
        self._store = {
            "vectors": self.index.vectors,
            "text_ids": self.text_ids,
            "text_lens": self.text_lens,
            "empty": self.empty,
        }
        if self.index.n_docs < self.index.vectors.shape[0]:
            # traced row-validity bound: online updates change it without
            # invalidating the compiled program.  Omitted when there is no
            # padding (no masking work in the kernels); the first online
            # update adds it via _refresh_store — the store-structure
            # change retraces once.
            self._store["n_valid"] = jnp.int32(self.index.n_docs)
        if self.index.scales is not None:
            self._store["scales"] = self.index.scales
        if cfg.use_pca:
            if self.index.pca_proj is None:
                raise ValueError("use_pca requires an index built with "
                                 "pca_dims (encode_corpus --pca-dims)")
            self._store["pca_proj"] = self.index.pca_proj
            self._store["pca_bounds"] = self.index.pca_bounds
            self._store["pca_rot"] = self.index.pca_rot
        impl = functools.partial(
            self._search_impl,
            beam1=cfg.beam_size_1, beam2=cfg.beam_size_2, topk=cfg.topk)
        self._jit_impl = jax.jit(impl)
        self._jit = lambda params, q_inputs, q_raw_ids, q_raw_lens: \
            self._jit_impl(params, self._store, q_inputs, q_raw_ids, q_raw_lens)

    # ---- online corpus updates (serving) ------------------------------
    #
    # FAISS-`add`-style serving updates, end to end: the dense index AND
    # the on-device token store move together so hop-2 reformulation sees
    # the new documents immediately.  Shapes are unchanged while updates
    # fit the tail padding (donated in-place slice updates, no retrace);
    # growth re-pads to the chunk grid and recompiles once.

    def _refresh_store(self):
        self._store["vectors"] = self.index.vectors
        self._store["text_ids"] = self.text_ids
        self._store["text_lens"] = self.text_lens
        self._store["empty"] = self.empty
        self._store["n_valid"] = jnp.int32(self.index.n_docs)
        if self.index.scales is not None:
            self._store["scales"] = self.index.scales
        if "pca_proj" in self._store:
            self._store["pca_proj"] = self.index.pca_proj
            self._store["pca_bounds"] = self.index.pca_bounds

    def add_docs(self, embeddings: np.ndarray, text_ids: np.ndarray,
                 text_lens: np.ndarray, empty: Optional[np.ndarray] = None):
        """Append documents to the live engine.  `text_ids` (M, <=Lt) raw
        doc token ids (no specials), padded host-side to the store width.
        Returns the doc ids assigned to the new documents."""
        assert self.index.multi_vector == 1, \
            "online updates support single-vector indexes"
        m = len(text_lens)
        start = self.index.n_docs
        n_shards = (1 if self.mesh is None
                    else self.mesh.shape.get(INDEX_AXIS, 1))
        old_pad = self.index.vectors.shape[0]
        # growth unit: the kernels require the (per-shard) row count to be
        # a multiple of the scan tile (config.chunk_rows), and the store
        # keeps its own layout granularity — grow by the lcm.  With the
        # CLI defaults both are 4096; passing config.chunk_rows alone
        # (the old behavior) made a one-doc append grow by the 131072-row
        # SearchConfig default (~1M zero rows across 8 shards).
        unit = math.lcm(self.index.chunk_rows, self.config.chunk_rows)
        self.index = self.index.append(embeddings, chunk_rows=unit,
                                       n_shards=n_shards)
        n_pad = self.index.vectors.shape[0]
        if n_pad != old_pad:
            grow = n_pad - self.text_ids.shape[0]
            self.text_ids = jnp.concatenate(
                [self.text_ids,
                 jnp.full((grow, self.text_ids.shape[1]), self.spec.pad_id,
                          self.text_ids.dtype)], axis=0)
            self.text_lens = jnp.concatenate(
                [self.text_lens, jnp.zeros((grow,), self.text_lens.dtype)])
            self.empty = jnp.concatenate(
                [self.empty, jnp.zeros((grow,), self.empty.dtype)])
            if self.mesh is not None:
                self.index = self.index.shard(self.mesh)
        width = self.text_ids.shape[1]
        rows = np.full((m, width), self.spec.pad_id, np.int64)
        tin = np.asarray(text_ids)
        rows[:, :tin.shape[1]] = tin
        self.text_ids = _update2d(self.text_ids,
                                  jnp.asarray(rows, self.text_ids.dtype),
                                  start)
        self.text_lens = _update1d(
            self.text_lens, jnp.asarray(text_lens, self.text_lens.dtype),
            start)
        emp = (np.zeros((m,), bool) if empty is None else np.asarray(empty))
        self.empty = _update1d(self.empty, jnp.asarray(emp, self.empty.dtype),
                               start)
        self._refresh_store()
        return list(range(start, start + m))

    def delete_doc(self, doc_id: int):
        """Swap-delete a document from the live engine (index + token
        store).  Returns the doc id that MOVED into the freed slot (the
        caller updates its host doc table the same way), or None."""
        assert self.index.multi_vector == 1
        self.index, moved = self.index.delete_swap(doc_id)
        if moved is not None:
            row = jax.lax.dynamic_slice(
                self.text_ids, (moved, 0), (1, self.text_ids.shape[1]))
            self.text_ids = _update2d(self.text_ids, row, doc_id)
            ln = jax.lax.dynamic_slice(self.text_lens, (moved,), (1,))
            self.text_lens = _update1d(self.text_lens, ln, doc_id)
            em = jax.lax.dynamic_slice(self.empty, (moved,), (1,))
            self.empty = _update1d(self.empty, em, doc_id)
        self._refresh_store()
        return moved

    # ------------------------------------------------------------------

    def _pca_on_hop(self, hop: int) -> bool:
        """Resolve cfg.pca_hops for hop 1 or 2 (see core/config.py — the
        measured lax.cond interaction behind the "auto" rule)."""
        mode = self.config.pca_hops
        if mode == "auto":
            return hop == 2 or not self.config.hop2_buckets
        return str(hop) in mode

    def _mips(self, store, queries, k, pca: bool = True):
        """(vals, doc_ids, cert) top-k over the store's index; `cert` is the
        per-query exactness-certificate mask under the PCA tier, else None
        (also None when `pca=False` routes this hop to the plain kernels).

        Multi-vector index: fetch k*m rows, then collapse to k DOCS via
        max-over-vectors (rows grouped per passage, ops/mips.py).
        n_valid rides the store as a TRACED scalar so online add/delete
        (add_docs/delete_doc) take effect without retracing — a static
        bound would stay baked into the cached program."""
        vectors = store["vectors"]
        scales = store.get("scales")
        n_valid_dyn = store.get("n_valid")
        m = self.index.multi_vector
        k_rows = k * m
        cert = None
        use_pca = pca and "pca_proj" in store
        n_index_shards = (self.mesh.shape.get(INDEX_AXIS, 1)
                          if self.mesh is not None else 1)
        chunks_per_shard = (vectors.shape[0]
                            // max(n_index_shards, 1)
                            // self.index.pca_cand_rows)
        if use_pca and chunks_per_shard < 2:
            # a single candidate chunk (PER SHARD — the sharded prefilter
            # hard-fails below 2, while this global-count guard used to
            # pass) leaves nothing unselected for the ub_next certificate
            # comparison — the prefilter is meaningless at this scale, so
            # route the hop to the plain kernels
            use_pca = False
        if self.mesh is not None and self.mesh.shape.get(INDEX_AXIS, 1) > 1:
            if use_pca:
                vals, rows, cert = sharded_mips_topk_pca(
                    vectors, store["pca_proj"], store["pca_rot"],
                    store["pca_bounds"], queries, k_rows, self.mesh,
                    k_chunks=self.config.pca_k_chunks,
                    cand_rows=self.index.pca_cand_rows,
                    n_valid=self.index.n_docs, doc_scales=scales,
                    n_valid_dyn=n_valid_dyn,
                    interpret=jax.default_backend() != "tpu")
            else:
                vals, rows = sharded_mips_topk(
                    vectors, queries, k_rows, self.mesh,
                    use_pallas=self.config.use_pallas,
                    chunk_rows=self.config.chunk_rows,
                    n_valid=self.index.n_docs, doc_scales=scales,
                    n_valid_dyn=n_valid_dyn)
        elif use_pca:
            from ..ops.mips import pick_pca_step_rows

            cand = self.index.pca_cand_rows
            n_pad = vectors.shape[0]
            step = pick_pca_step_rows(n_pad, cand)
            # clamp: small corpora can have fewer candidate chunks than the
            # configured rescan budget (must leave >=1 unselected for ub_next)
            kc = max(1, min(self.config.pca_k_chunks, n_pad // cand - 1))
            vals, rows, cert = mips_topk_pca(
                vectors, store["pca_proj"], store["pca_rot"],
                store["pca_bounds"], queries, k_rows,
                k_chunks=kc, cand_rows=cand,
                step_rows=step, n_valid=self.index.n_docs,
                doc_scales=scales, n_valid_dyn=n_valid_dyn,
                interpret=jax.default_backend() != "tpu")
        else:
            vals, rows = mips_topk(
                vectors, queries, k_rows,
                use_pallas=self.config.use_pallas,
                chunk_rows=self.config.chunk_rows,
                n_valid=self.index.n_docs, doc_scales=scales,
                n_valid_dyn=n_valid_dyn)
        vals, docs = merge_multivector(vals, rows, k, m)
        return vals, docs, cert

    def _encode_hop2(self, params, qsp, encode=None, active=None,
                     inactive_sort="tail", buckets=None, fracs=None):
        """Encode hop-2 q⊕p rows, optionally length-adaptive.

        With cfg.hop2_buckets set, rows are sorted by total length and split
        into equal tiles; each tile is encoded at its bucket width when every
        row fits (lax.cond — both branches compiled, one executed, no host
        sync), else at the full static width.  Results are bit-compatible
        with the full-width encode: trailing pad columns never influence
        non-pad positions (attention is masked; positions are width-
        independent), so narrowing is purely a FLOP/bandwidth saving.

        `active` (n_rows,) bool enables candidate skipping: a fully-inactive
        tile skips the encoder entirely (zeros via lax.cond), and a mixed
        tile picks its width from ACTIVE rows only — an inactive row wider
        than the bucket gets truncated-encoded, which is fine because its
        output is discarded (_search_impl forces its chain score to
        NEG_INF).  `inactive_sort` places inactive rows in the sort order:

        * "tail" (sort key L+1): inactive rows pack into the trailing
          (widest) tiles.  Best when inactive rows are length-uncorrelated
          and the wide tail tiles — the expensive ones — go fully inactive
          (candidate pruning: measured 918→1552 q/s at beam 4).
        * "front" (sort key -1): inactive rows pack into the leading
          (narrowest) tiles, so surviving rows shift to HIGHER positional
          quantiles and mixed tiles never see rows longer than their
          bucket — token cost is monotone non-increasing in the inactive
          count.  Tail-sort instead shifts survivors into EARLIER narrower
          tiles whose lax.cond escalates to full width: at the stop
          cascade's per-question stop pattern this cost 1.22x baseline
          tokens at stop-rate 60% (front-sort: 0.76x,
          scripts_dev/cascade_diag.py) and showed up on-chip as
          unified_qps_stop60 772 < stop0 861.

        `encode` may return any pytree of row-major arrays (e.g. the unified
        stop-head's (vectors, stop_logits) tuple) — tiles are concatenated
        and un-permuted leaf-wise.  `buckets`/`fracs` override the config
        tiling (the cascade's two passes size their own tilings to their
        own row counts).
        """
        fn = encode if encode is not None else self.encode_fn
        ids, mask = qsp["input_ids"], qsp["attention_mask"]
        tt = qsp.get("token_type_ids")
        if buckets is None:
            buckets = tuple(self.config.hop2_buckets or ())
            fracs = tuple(self.config.hop2_tile_fracs or ())
        else:
            buckets = tuple(buckets)
            fracs = tuple(fracs or ())
        n_rows, L = ids.shape
        if not buckets:
            return fn(params, ids, mask, tt)
        n_tiles = len(buckets)
        if fracs and len(fracs) == n_tiles:
            sizes = [int(round(f * n_rows)) for f in fracs]
            sizes[-1] = n_rows - sum(sizes[:-1])
        elif n_rows % n_tiles == 0:
            sizes = [n_rows // n_tiles] * n_tiles
        else:
            return fn(params, ids, mask, tt)
        if min(sizes) <= 0:
            return fn(params, ids, mask, tt)
        bounds = [0]
        for s in sizes:
            bounds.append(bounds[-1] + s)

        lens = jnp.sum(mask, axis=1).astype(jnp.int32)
        # inactive rows sort past every real length (tail, key L+1) or
        # before it (front, key -1) per `inactive_sort`; active rows stay
        # length-sorted among themselves either way
        key_off = -1 if inactive_sort == "front" else L + 1
        keys = lens if active is None else jnp.where(active, lens, key_off)
        order = jnp.argsort(keys)              # ascending
        inv = jnp.argsort(order)
        ids_s, mask_s = ids[order], mask[order]
        tt_s = None if tt is None else tt[order]
        keys_s = keys[order]

        tiles = []
        for t in range(n_tiles):
            sl = slice(bounds[t], bounds[t + 1])
            w = min(int(buckets[t]), L)
            ids_t, mask_t = ids_s[sl], mask_s[sl]
            tt_t = None if tt_s is None else tt_s[sl]
            # width decision from ACTIVE rows only: the largest key in
            # [0, L] (inactive keys are L+1 for tail-sort, -1 for front).
            # The >= 0 clause exists only on the front-sort path so every
            # other engine keeps its exact HLO (and persistent-compile-
            # cache keys) from before front-sort existed.
            tile_keys = keys_s[sl]
            if inactive_sort == "front" and active is not None:
                valid_key = (tile_keys >= 0) & (tile_keys <= L)
            else:
                valid_key = tile_keys <= L
            tile_max = jnp.max(jnp.where(valid_key, tile_keys, 0))

            def narrow(ids_t=ids_t, mask_t=mask_t, tt_t=tt_t, w=w):
                return fn(params, ids_t[:, :w], mask_t[:, :w],
                          None if tt_t is None else tt_t[:, :w])

            def wide(ids_t=ids_t, mask_t=mask_t, tt_t=tt_t):
                return fn(params, ids_t, mask_t, tt_t)

            enc = (wide if w >= L
                   else lambda narrow=narrow, wide=wide, tile_max=tile_max,
                               w=w: jax.lax.cond(tile_max <= w, narrow, wide))
            if active is None:
                tiles.append(enc())
                continue
            # skip fully-inactive tiles.  Sorted keys: tail-sort packs
            # inactive rows (L+1) last, so the tile has an active row iff
            # its FIRST key (the minimum) is <= L; front-sort packs them
            # (-1) first, so iff its LAST key (the maximum) is >= 0.
            if inactive_sort == "front":
                tile_any_active = keys_s[bounds[t + 1] - 1] >= 0
            else:
                tile_any_active = keys_s[bounds[t]] <= L
            shapes = jax.eval_shape(wide)
            zeros = lambda shapes=shapes: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            tiles.append(jax.lax.cond(tile_any_active, enc, zeros))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0)[inv], *tiles)

    def _search_impl(self, params, store, q_inputs, q_raw_ids, q_raw_lens,
                     *, beam1: int, beam2: int, topk: int):
        cfg = self.config
        bsz = q_raw_ids.shape[0]

        # hop 1 ---------------------------------------------------------
        q_vec = self.encode_fn(params, q_inputs["input_ids"],
                               q_inputs["attention_mask"],
                               q_inputs.get("token_type_ids"))
        d1, i1, cert1 = self._mips(store, q_vec.astype(jnp.float32), beam1,
                                   pca=self._pca_on_hop(1))
        # empty-text docs cannot start a chain (eval_mhop_retrieval.py:165)
        d1 = jnp.where(store["empty"][i1], NEG_INF, d1)

        # hop 2: on-device reformulation ---------------------------------
        doc_ids = store["text_ids"][i1.reshape(-1)].astype(jnp.int32)
        doc_lens = store["text_lens"][i1.reshape(-1)].astype(jnp.int32)
        a_ids = jnp.repeat(q_raw_ids, beam1, axis=0)
        a_lens = jnp.repeat(q_raw_lens, beam1, axis=0)
        qsp = assemble_pair_inputs(a_ids, a_lens, doc_ids, doc_lens,
                                   cfg.max_q_sp_len, self.spec)
        # adaptive candidate pruning: re-encode only candidates within
        # `hop2_prune_margin` of their question's top-1 hop-1 score (the
        # top-1 itself always qualifies).  Pruned rows skip encoding tile-
        # wise inside _encode_hop2 and their chains score NEG_INF below.
        # margin = -q in (-1, 0) is AUTO: the q-quantile of the batch's
        # POSITIVE hop-1 gaps, derived inside the jit (no probe run).
        # The sorted gap vector holds exactly one zero per question (its
        # own top-1), so the positive gaps are entries bsz..end and the
        # q-quantile is a static index into the sorted vector.  Quantile
        # guidance from the 65k-doc trained-weight sweep
        # (docs/prune_sweep_r5.json): q=0.5 (median, CLI `auto`)
        # maximizes throughput (37.5% of rows pruned, 1.72x on-chip) but
        # flips near-tied chains under heavy score crowding (chain
        # agreement 0.77 there); q=0.9 (CLI `auto:0.9`) was that sweep's
        # neutral point — P-EM/PR bit-equal to unpruned, agreement 0.98,
        # 7.5% pruned.  Empty-doc rows carry huge (top1 - NEG_INF) gaps
        # that sort to the tail and can only pull any quantile UP — the
        # safe (less pruning) direction.
        active = None
        if cfg.hop2_prune_margin != 0 and beam1 > 1:
            top1 = jnp.max(d1, axis=1, keepdims=True)
            if cfg.hop2_prune_margin > 0:
                margin = cfg.hop2_prune_margin
            else:
                q = min(-cfg.hop2_prune_margin, 1.0)
                gaps = jnp.sort((top1 - d1).reshape(-1))
                idx = bsz + int((gaps.size - bsz - 1) * q)
                margin = gaps[idx]
            active = ((d1 >= top1 - margin)
                      & (d1 > NEG_INF / 2)).reshape(-1)
        stop_probs = None
        if (self.encode_qsp_fn is not None
                and cfg.stop_skip_threshold > 0 and beam1 > 1):
            # variable-hop early stop (cascade, cfg.stop_skip_threshold):
            # pass 1 encodes each question's BEST hop-1 pair (B rows) for
            # its stop probability; stopped questions' remaining candidate
            # rows are skipped tile-wise in pass 2.  Both passes are
            # STATIC-shape compactions with their own length-bucketed
            # tiling: pass 1 over the B top rows, pass 2 over the
            # B*(beam1-1) non-top rows.  (Leaving all beam1*B rows in one
            # tiling and masking top rows out shifts every mixed tile's
            # active length range past its positional bucket width, so the
            # lax.cond escalates to the full-width branch — measured 1.7x
            # SLOWER than no cascade at stop-rate 30%, bench r5.)  Pass 2
            # keeps the configured tiling (its row count is within one
            # tile-regime of the plain engine's B*beam1) but FRONT-sorts
            # its stopped rows (see _encode_hop2: per-question stopping
            # under tail-sort escalated mixed tiles — on-chip stop60 772
            # < stop0 861 q/s).  Pass 1's row count is beam1x smaller, so
            # it re-derives its own tiling (default_hop2_tiling — at
            # B=192 the configured 6-tile split loses 23%).  Skipped rows
            # surface stop_prob 0.5 (softmax of the zero logits the
            # skipped tiles emit); their chains are NEG_INF so the host
            # never consumes those values.
            b_top, f_top = ((), ())
            if cfg.hop2_buckets:
                b_top, f_top = default_hop2_tiling(bsz, cfg.max_q_sp_len)
            top_slot = jnp.argmax(d1, axis=1)                     # (B,)
            row_idx = (jnp.arange(bsz, dtype=jnp.int32) * beam1
                       + top_slot.astype(jnp.int32))
            qsp_top = {k: v[row_idx] for k, v in qsp.items()
                       if v is not None}
            vec_top, logits_top = self._encode_hop2(
                params, qsp_top, encode=self.encode_qsp_fn,
                buckets=b_top, fracs=f_top)
            p_stop_top = jax.nn.softmax(logits_top.astype(jnp.float32),
                                        axis=-1)[:, 0]
            stopped = p_stop_top >= cfg.stop_skip_threshold       # (B,)
            is_top = (jnp.arange(beam1, dtype=jnp.int32)[None, :]
                      == top_slot[:, None])                       # (B, beam1)
            nt_slots = jnp.argsort(is_top, axis=1)[:, :beam1 - 1]
            nt_idx = (jnp.arange(bsz, dtype=jnp.int32)[:, None] * beam1
                      + nt_slots.astype(jnp.int32)).reshape(-1)
            qsp_nt = {k: v[nt_idx] for k, v in qsp.items()
                      if v is not None}
            act_nt = jnp.repeat(~stopped, beam1 - 1)
            if active is not None:
                act_nt = act_nt & active[nt_idx]
            vec_nt, logits_nt = self._encode_hop2(
                params, qsp_nt, encode=self.encode_qsp_fn, active=act_nt,
                inactive_sort="front")
            qsp_vec = (jnp.zeros((bsz * beam1,) + vec_top.shape[1:],
                                 vec_top.dtype)
                       .at[row_idx].set(vec_top)
                       .at[nt_idx].set(vec_nt.astype(vec_top.dtype)))
            stop_logits = (jnp.zeros((bsz * beam1,) + logits_top.shape[1:],
                                     logits_top.dtype)
                           .at[row_idx].set(logits_top)
                           .at[nt_idx].set(
                               logits_nt.astype(logits_top.dtype)))
            stop_probs = jax.nn.softmax(
                stop_logits.astype(jnp.float32), axis=-1)[:, 0]
            cont = jnp.where(stopped[:, None], is_top, True).reshape(-1)
            active = cont if active is None else active & cont
        elif self.encode_qsp_fn is not None:
            # unified serving: stop head rides the same length-bucketed q⊕p
            # encode as the plain engine (_encode_hop2 handles the tuple
            # output leaf-wise), so --unified pays bucketed widths too
            qsp_vec, stop_logits = self._encode_hop2(
                params, qsp, encode=self.encode_qsp_fn, active=active)
            stop_probs = jax.nn.softmax(
                stop_logits.astype(jnp.float32), axis=-1)[:, 0]
        else:
            qsp_vec = self._encode_hop2(params, qsp, active=active)
        d2, i2, cert2 = self._mips(store, qsp_vec.astype(jnp.float32), beam2,
                                   pca=self._pca_on_hop(2))
        d2 = d2.reshape(bsz, beam1, beam2)
        i2 = i2.reshape(bsz, beam1, beam2)
        if active is not None:
            # pruned candidates contribute no chains (same mechanism as the
            # reference's empty-doc exclusion, eval_mhop_retrieval.py:165)
            d2 = jnp.where(active.reshape(bsz, beam1)[:, :, None], d2,
                           NEG_INF)

        # chain scoring (eval_mhop_retrieval.py:185,190-193) -------------
        path_scores = (d1[:, :, None] + d2).reshape(bsz, beam1 * beam2)
        top_scores, flat = jax.lax.top_k(path_scores, topk)     # (B, topk)
        hop1_slot = flat // beam2
        hop1_ids = jnp.take_along_axis(i1, hop1_slot, axis=1)
        hop2_ids = jnp.take_along_axis(
            i2.reshape(bsz, -1), flat, axis=1)
        out = {
            "path_scores": top_scores,        # (B, topk)
            "hop1_ids": hop1_ids,             # (B, topk)
            "hop2_ids": hop2_ids,             # (B, topk)
            "hop1_cand_ids": i1,              # (B, beam1) for 1-Recall
            "hop1_cand_scores": d1,
        }
        if stop_probs is not None:
            sp = stop_probs.reshape(bsz, beam1)
            out["stop_probs"] = sp                      # per hop-1 candidate
            out["top_stop_probs"] = jnp.take_along_axis(sp, hop1_slot, axis=1)
        # PCA-tier exactness certificates: hop-1 per question, hop-2 per
        # (question, hop-1 candidate) reformulated query; each hop emits its
        # mask only when the prefilter ran there (cfg.pca_hops)
        if cert1 is not None:
            out["pca_cert1"] = cert1                    # (B,)
        if cert2 is not None:
            out["pca_cert2"] = cert2.reshape(bsz, beam1)
        return out

    # ------------------------------------------------------------------

    def search(self, q_inputs: Dict[str, np.ndarray], q_raw_ids: np.ndarray,
               q_raw_lens: np.ndarray) -> Dict[str, np.ndarray]:
        """Host entry: fixed-shape tokenized questions → ranked chains."""
        mult = self.config.q_width_multiple
        if mult > 0:
            # narrow the hop-1 question width to the batch max, rounded up —
            # a few cached traces instead of always padding to max_q_len
            max_len = int(np.asarray(q_inputs["attention_mask"]).sum(1).max())
            w = max(mult, -(-max_len // mult) * mult)
            if w < q_inputs["input_ids"].shape[1]:
                q_inputs = {k: v[:, :w] for k, v in q_inputs.items()}
        out = self._jit(self.params,
                        {k: jnp.asarray(v) for k, v in q_inputs.items()},
                        jnp.asarray(q_raw_ids), jnp.asarray(q_raw_lens))
        return {k: np.asarray(v) for k, v in out.items()}
