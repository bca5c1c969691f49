"""Benchmark: end-to-end 2-hop beam-search throughput on real TPU hardware.

Measures the north-star workload (BASELINE.md): encode question → exact MIPS
over a 5.2M×768 index → on-device hop-2 reformulation → re-encode → MIPS →
chain ranking, with a roberta-base-sized encoder in bf16 and the index in
HBM as bf16 (≤ the reference's fp32 FAISS index memory).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline derivation (the reference publishes no throughput numbers —
BASELINE.md): the reference pipeline at beam 1 / batch 100 on a V100 does
two roberta-base fp16 encode passes (~7 TFLOP per batch → ~0.2 s at ~30%
MXU efficiency), two FAISS-GPU flat-IP searches over 5.2M fp32 (~1.6 TFLOP →
~0.15 s), plus host tokenization of 100 full documents and 4 host↔device
round-trips (~0.15-0.3 s): ~0.5-0.65 s per 100 questions ≈ **150 q/s**.
vs_baseline = measured_qps / 150.

Timing notes: this environment reaches the TPU through an HTTP tunnel whose
per-call latency (~30 ms) and lazy sync swamp naive timers, so the benchmark
scans REPS batches inside ONE jit program and forces a host transfer of a
scalar reduction; tunnel latency is subtracted once.

Env overrides: MDRT_BENCH_N (index rows), MDRT_BENCH_BATCH, MDRT_BENCH_BEAM,
MDRT_BENCH_REPS, MDRT_BENCH_LAYERS (encoder depth).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multihop_dense_retrieval_tpu.core.config import EncoderConfig, SearchConfig
from multihop_dense_retrieval_tpu.data.tokenization import TokenizerSpec
from multihop_dense_retrieval_tpu.index.store import DenseIndex
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.search.beam import BeamSearcher

BASELINE_QPS = 150.0  # estimated reference throughput (see module docstring)


def _env(name, default):
    return int(os.environ.get(name, default))


def main():
    n_docs = _env("MDRT_BENCH_N", 5_242_880)
    for attempt in range(3):
        try:
            return _run(n_docs)
        except Exception as e:  # OOM ladder: halve the index and retry
            oom = any(t in str(e) for t in
                      ("RESOURCE_EXHAUSTED", "Ran out of memory", "hbm"))
            if not oom or attempt == 2:
                raise
            print(f"# OOM at {n_docs} docs, retrying at {n_docs // 2}",
                  file=sys.stderr)
            n_docs //= 2


def _run(n_docs):
    batch = _env("MDRT_BENCH_BATCH", 96)
    beam = _env("MDRT_BENCH_BEAM", 1)
    reps = _env("MDRT_BENCH_REPS", 8)
    layers = _env("MDRT_BENCH_LAYERS", 12)
    max_q_len, max_q_sp_len, text_len = 70, 350, 300
    d = 768

    cfg = EncoderConfig.roberta_base(num_layers=layers)
    # cls_only: the final encoder layer computes only the CLS position —
    # bit-identical retrieval vectors (tests/test_encoder.py), fewer FLOPs
    model = MhopRetriever(cfg, cls_only=True)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)

    # synthetic device-resident corpus (values don't affect throughput).
    # Order + dtypes matter for peak HBM: build the uint16 token store first
    # (no int32 intermediates), then the bf16 index.
    chunk = 2048
    n_pad = -(-n_docs // chunk) * chunk

    @jax.jit
    def make_tokens(key):
        bits = jax.random.bits(key, (n_pad, text_len), jnp.uint16)
        return (bits % jnp.uint16(cfg.vocab_size - 20) + jnp.uint16(10))

    text_ids = make_tokens(jax.random.PRNGKey(2))
    text_ids.block_until_ready()
    text_lens = jnp.full((n_pad,), text_len, jnp.int32)
    empty = jnp.zeros((n_pad,), bool)
    index_vecs = jax.random.normal(jax.random.PRNGKey(1), (n_pad, d),
                                   jnp.bfloat16)
    index = DenseIndex(vectors=index_vecs, n_docs=n_docs)

    spec = TokenizerSpec(cls_id=0, sep_id=2, pad_id=1,
                         vocab_size=cfg.vocab_size, roberta_style=True)
    scfg = SearchConfig(beam_size_1=beam, beam_size_2=beam, topk=beam,
                        max_q_len=max_q_len, max_q_sp_len=max_q_sp_len,
                        chunk_rows=chunk, use_pallas=True)
    searcher = BeamSearcher(
        encode_fn=lambda p, ids, mask, tt=None: model.apply(
            p, ids, mask, tt, method=model.encode_seq),
        params=params, index=index, text_ids=text_ids, text_lens=text_lens,
        empty=empty, spec=spec, config=scfg, mesh=None)

    # synthetic questions
    q_len = 24
    qids = jax.random.randint(jax.random.PRNGKey(3), (reps, batch, max_q_len),
                              10, cfg.vocab_size - 1, jnp.int32)
    qmask = (jnp.arange(max_q_len)[None, None, :] < q_len).astype(jnp.int32)
    qmask = jnp.broadcast_to(qmask, (reps, batch, max_q_len))
    raw_ids = qids[:, :, : max_q_len - 2]
    raw_lens = jnp.full((reps, batch), q_len - 2, jnp.int32)

    @jax.jit
    def run(params, store, qids, qmask, raw_ids, raw_lens):
        def body(carry, xs):
            ids, mask, rid, rlen = xs
            out = searcher._search_impl(
                params, store, {"input_ids": ids, "attention_mask": mask},
                rid, rlen, beam1=beam, beam2=beam, topk=beam)
            return carry + out["path_scores"].sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              (qids, qmask, raw_ids, raw_lens))
        return acc

    store = searcher._store
    t_c0 = time.time()
    _ = np.asarray(run(params, store, qids, qmask, raw_ids, raw_lens))
    compile_s = time.time() - t_c0
    t0 = time.perf_counter()
    _ = np.asarray(run(params, store, qids, qmask, raw_ids, raw_lens))
    dt = time.perf_counter() - t0 - 0.03  # tunnel round-trip
    qps = reps * batch / dt

    print(json.dumps({
        "metric": "2hop_beam_search_queries_per_sec",
        "value": round(qps, 1),
        "unit": f"questions/s (beam={beam}, {n_docs} docs x {d} bf16, "
                f"{layers}-layer encoder, batch={batch}, 1 TPU chip)",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }))
    print(f"# compile {compile_s:.0f}s, steady {dt/reps*1000:.1f} ms/batch",
          file=sys.stderr)


if __name__ == "__main__":
    main()
