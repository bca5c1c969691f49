"""Benchmark: end-to-end 2-hop beam-search throughput on real TPU hardware.

Measures the north-star workload (BASELINE.md): encode question → MIPS over
a 5.2M×768 index → on-device hop-2 reformulation → re-encode → MIPS → chain
ranking, with a roberta-base-sized encoder in bf16.

Headline config (serving-tuned, quality-validated):
  * int8 per-row-quantized index (100% top-1 / 97.4%@10 agreement with the
    exact bf16 search, tests/test_mips.py + README) — half the HBM traffic.
  * PCA-prefiltered hop-2 MIPS (`pca_hops="auto"`, PERF.md) when the run's
    MEASURED exactness-certificate fraction is ≥99%; otherwise the plain
    int8 kernels keep the headline and the PCA run is reported as an extra
    with its certified fraction (honesty guard — the certificate soundness
    is proven, but aggregate certified coverage depends on the corpus).
  * length-adaptive hop-2 encode (SearchConfig.hop2_buckets): rows sorted by
    assembled length, tiles encoded at bucketed widths via lax.cond — exact
    results (tests/test_search.py::test_length_bucketed_search_is_exact).
  * realistic length distributions: doc tokens ~ lognormal(mean≈100,
    clip [20, 300]) matching wiki abstracts (the reference corpus,
    BASELINE.md); question tokens uniform 12-38.  The reference pays the
    same encoder cost REGARDLESS of true lengths (it pads hop-2 pairs to
    350, eval_mhop_retrieval.py:159-168), so vs_baseline is conservative.
  * index vectors drawn with the SECOND MOMENT OF REAL ENCODER OUTPUTS
    (an encoder-output sample's covariance factor, not iid gaussian), so
    the PCA prefilter and int8 quantization face realistic anisotropy.
  * bf16 attention scores (the reference runs apex O1, i.e. fp16 scores
    with LESS dynamic range than bf16).  Measured vs fp32 scores at 256k
    docs: query cosine 0.99996, 100% top-1 agreement, 97.5% top-10
    overlap — comparable to the int8 tier.  MDRT_BENCH_SCORES=float32
    reverts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Extras, each measured on-chip every run (any failure is caught and reported
in extra_errors rather than killing the headline):
  * bf16_exact_qps — the exact-search delta config (bf16 index, no
    approximation anywhere beyond bf16 storage/scores);
  * pca_qps + pca_cert2_frac — the PCA tier and its measured certificate
    coverage (headline when ≥0.99, see above);
  * beam4_qps — the quality-eval beam;
  * latency_b8_ms — the headline engine at a low-occupancy batch of 8
    (per-micro-batch serving latency, the SLO-side view of the pipeline);
  * reader_chains_per_sec / reader_fixed512_chains_per_sec — ELECTRA-large
    reader with length-sorted width bucketing vs fixed 512;
  * end2end_qps / end2end_2stage_qps — the COMPOSED question→answer
    pipeline measured in one jit per batch (beam-5 retrieval, 25 chains
    read by the ELECTRA-large reader with span decode): one-stage reads
    every chain at 512; two-stage ranks all chains at a narrow width and
    reads only the top-5 fully (eval/qa_eval.py::predict rank_topm);
  * train_ex_per_sec — the reference-budget contrastive train step
    (roberta-base, 6 views, Adam+clip+warmup) scanned in one jit;
  * hnsw_* — the native host-side HNSW tier (build rate, q/s, recall).

vs_baseline derivation (the reference publishes no throughput numbers —
BASELINE.md): the reference pipeline at beam 1 / batch 100 on a V100 does
two roberta-base fp16 encode passes (~7 TFLOP per batch → ~0.2 s at ~30%
MXU efficiency), two FAISS-GPU flat-IP searches over 5.2M fp32 (~1.6 TFLOP →
~0.15 s), plus host tokenization of 100 full documents and 4 host↔device
round-trips (~0.15-0.3 s): ~0.5-0.65 s per 100 questions ≈ **150 q/s**.
The estimate's plausible range is 100-250 q/s; vs_baseline = qps/150, so
scale accordingly (reported as baseline_qps_range in the output).

Timing notes: this environment reaches the TPU through an HTTP tunnel whose
per-call latency and lazy sync swamp naive timers, so the benchmark scans
REPS batches inside ONE jit program, forces a host transfer of a scalar
reduction, and subtracts a MEASURED empty-program round-trip (not a guess).

Env overrides: MDRT_BENCH_N (index rows), MDRT_BENCH_BATCH, MDRT_BENCH_BEAM,
MDRT_BENCH_REPS, MDRT_BENCH_LAYERS (encoder depth), MDRT_BENCH_DTYPE
(int8|bf16), MDRT_BENCH_BUCKETS + MDRT_BENCH_TILE_FRACS ("off" disables),
MDRT_BENCH_B4_BUCKETS/MDRT_BENCH_B4_FRACS (beam-4-specific tile tuning),
MDRT_BENCH_B4_PRUNE (hop-2 candidate pruning margins for the extra
beam4_pruned_qps / beam4_pruned_p90_qps figures: "auto" [default] = the
median and p90 hop-1 gaps — the 65k sweep's max-throughput and
quality-neutral points, docs/prune_sweep_r5.json; float = one pinned
margin, "0" = skip),
MDRT_BENCH_BEAM4 / MDRT_BENCH_BF16 / MDRT_BENCH_PCA / MDRT_BENCH_READER /
MDRT_BENCH_E2E / MDRT_BENCH_TRAIN (0 disables that extra),
MDRT_BENCH_TRAIN_B/_TRAIN_REPS/_TRAIN_REMAT (train-stage shape),
MDRT_BENCH_FAST=1 (headline only),
MDRT_BENCH_EXTRAS_MARGIN_S (stop STARTING extra stages once less than this
much of the watchdog budget remains, default 390 — the run then finishes
cleanly with the headline and whatever extras fit, listing the rest in
"skipped_for_time" instead of losing everything to the watchdog).
"""

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multihop_dense_retrieval_tpu.core.config import (
    EncoderConfig, SearchConfig, HOP2_BUCKETS_5TILE, HOP2_TILE_FRACS_5TILE,
    HOP2_BUCKETS_6TILE, HOP2_TILE_FRACS_6TILE)
from multihop_dense_retrieval_tpu.data.tokenization import TokenizerSpec
from multihop_dense_retrieval_tpu.index.store import DenseIndex
from multihop_dense_retrieval_tpu.models import MhopRetriever
from multihop_dense_retrieval_tpu.search.beam import (BeamSearcher,
                                                      assemble_pair_inputs)

BASELINE_QPS = 150.0  # estimated reference throughput (see module docstring)
BASELINE_RANGE = (100.0, 250.0)
PCA_CERT_HEADLINE_MIN = 0.99
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache")


def _env(name, default):
    return int(os.environ.get(name, default))


def measure_tunnel_overhead():
    """Round-trip latency of an empty jit program + scalar transfer —
    subtracted once from the timed run (the run is ONE dispatch)."""
    f = jax.jit(lambda x: x * 2.0)
    _ = np.asarray(f(jnp.float32(1.0)))  # compile
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        _ = np.asarray(f(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t)
    return min(ts)


def _min_time(fn, n=None):
    """Best-of-n wall time of `fn()` (each call is one full dispatch+sync).

    The axon tunnel occasionally stalls for seconds mid-run (observed: a
    pca stage measuring 457 ms/batch where the surrounding stages and two
    later reruns measured ~65 ms); a stall only ever ADDS latency, so the
    min over a few repetitions recovers the true steady state.  Costs
    (n-1) extra steady-state runs per stage — seconds, vs the minutes the
    compile already takes.  MDRT_BENCH_TIMED_REPS overrides n (the effective
    value is recorded as timed_reps in the headline JSON so cross-round
    comparisons can account for the methodology).
    Returns (best_seconds, last_result).
    """
    n = _env("MDRT_BENCH_TIMED_REPS", 3) if n is None else n
    best, out = float("inf"), None
    for _ in range(max(n, 1)):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def synth_doc_lens(rng, n, lo=20, hi=300):
    """Wiki-abstract-like token lengths: lognormal, mean ~100, clipped."""
    lens = np.exp(rng.normal(np.log(95.0), 0.55, size=n))
    return np.clip(lens, lo, hi).astype(np.int32)


def _encoder_moment_factor(model, params, cfg, d, n=256, width=32):
    """Covariance factor + PCA rotation from REAL encoder outputs.

    Index rows are drawn as z @ factor.T (z iid normal), matching the
    uncentered second moment of actual CLS vectors — realistic spectrum for
    the int8 quantizer and the PCA prefilter, at synthetic-corpus cost.
    The rotation is the top-128 eigvecs of the same moment (exactly what
    ops/mips.py::train_pca_rotation computes from a corpus sample)."""
    # the sample encode runs on the in-process CPU backend (a one-off
    # 12-layer program costs ~12 min of REMOTE compile on the tunnel TPU)
    # and the spectrum is cached on disk — the encoder params are
    # deterministic (PRNGKey(0)), so the moment only varies with
    # (layers, scores dtype).  n=256 estimates the top-128 eigvecs; a ridge
    # at 1% of the mean eigenvalue keeps the factor full-rank (the tail
    # beyond rank-n is isotropic-small rather than exactly zero).
    cache = _CACHE_DIR
    os.makedirs(cache, exist_ok=True)
    key = (f"moment_{cfg.num_layers}_{cfg.attention_scores_dtype}"
           f"_{n}x{width}.npz")
    path = os.path.join(cache, key)
    if os.path.exists(path):
        z = np.load(path)
        return jnp.asarray(z["factor"]), jnp.asarray(z["rot"])
    bs = 128
    cpu = jax.devices("cpu")[0]
    rng = np.random.RandomState(7)
    ids_np = rng.randint(10, cfg.vocab_size - 1,
                         size=(n // bs, bs, width)).astype(np.int32)
    with jax.default_device(cpu):
        cpu_params = jax.device_put(params, cpu)
        mask = jnp.ones((bs, width), jnp.int32)
        enc = jax.jit(lambda p, i: model.apply(p, i, mask,
                                               method=model.encode_seq))
        outs = [np.asarray(enc(cpu_params, jax.device_put(ids_np[i], cpu)),
                           np.float32)
                for i in range(ids_np.shape[0])]
    s = np.concatenate(outs)
    m = (s.T.astype(np.float64) @ s.astype(np.float64)) / len(s)
    m += np.eye(d) * (np.trace(m) / d) * 0.01
    lam, u = np.linalg.eigh(m)                       # ascending
    lam = np.maximum(lam[::-1], 1e-9)
    u = u[:, ::-1]
    factor = (u * np.sqrt(lam)).astype(np.float32)   # row = z @ factor.T
    rot = np.ascontiguousarray(u[:, :128]).astype(np.float32)
    np.savez(path, factor=factor, rot=rot)
    return jnp.asarray(factor), jnp.asarray(rot)


def _make_tokens(n_pad, text_len, vocab_size):
    """Device-resident token store (uint16 — no int32 intermediates)."""
    rng = np.random.RandomState(17)

    @jax.jit
    def make_tokens(key):
        bits = jax.random.bits(key, (n_pad, text_len), jnp.uint16)
        return (bits % jnp.uint16(vocab_size - 20) + jnp.uint16(10))

    text_ids = make_tokens(jax.random.PRNGKey(2))
    text_ids.block_until_ready()
    text_lens = jnp.asarray(synth_doc_lens(rng, n_pad))
    empty = jnp.zeros((n_pad,), bool)
    return text_ids, text_lens, empty


def _make_index(n_pad, n_docs, d, dtype, factor, rot=None,
                cand_rows=512):
    """Covariance-matched synthetic index, built slice-wise on device.

    Slices land in pre-allocated buffers via DONATED dynamic_update_slice
    (index/store.py::_update_rows) — a jnp.concatenate would keep parts AND
    result co-resident (2× the index: 16 GB for the bf16 phase alone, OOM
    at 5.2M next to the 3.1 GB token store), while the donated update is
    in-place on TPU.  16 slices keep the fp32 transients ≈1 GB each.
    With `rot`, the per-slice program also emits the PCA projection and
    certificate bounds (same quantities as ops/mips.py::build_pca_prefilter
    / index/store.py::_pca_ingest: bounds over the rows AS STORED —
    dequantized int8 — with the fp32 margin)."""
    from multihop_dense_retrieval_tpu.index.store import (_update_rows,
                                                          _update_scales)

    n_slices = 16
    while n_pad % n_slices:
        n_slices //= 2
    rows = n_pad // n_slices
    # cand_rows only matters for the PCA bound blocks; halve it until it
    # divides the slice so small MDRT_BENCH_N smoke runs still build
    # (pick_pca_step_rows falls back to interpret mode for odd shapes).
    if rot is not None:
        while cand_rows > 1 and rows % cand_rows:
            cand_rows //= 2

    if dtype == "int8":

        @jax.jit
        def make_slice(key):
            z = jax.random.normal(key, (rows, d), jnp.float32)
            x = z @ factor.T
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True)
                                / 127.0, 1e-10)
            q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
            if rot is None:
                return q, scale[:, 0]
            xd = q.astype(jnp.float32) * scale
            p = xd @ rot
            pb = p.astype(jnp.bfloat16)
            pb32 = pb.astype(jnp.float32)
            quant = jnp.stack([
                jnp.sqrt(jnp.maximum(jnp.sum(xd * xd, 1)
                                     - jnp.sum(p * p, 1), 0)),
                jnp.linalg.norm(p - pb32, axis=1),
                jnp.linalg.norm(pb32, axis=1),
                jnp.linalg.norm(xd, axis=1),
            ])                                        # (4, rows)
            b = quant.reshape(4, rows // cand_rows, cand_rows).max(-1)
            b = b * (1 + 1e-6) + 1e-6
            return q, scale[:, 0], pb, b

        vectors = jnp.zeros((n_pad, d), jnp.int8)
        scales = jnp.zeros((n_pad,), jnp.float32)
        proj = (jnp.zeros((n_pad, rot.shape[1]), jnp.bfloat16)
                if rot is not None else None)
        bds = []
        for s in range(n_slices):
            out = make_slice(jax.random.PRNGKey(100 + s))
            vectors = _update_rows(vectors, out[0], s * rows)
            scales = _update_scales(scales, out[1], s * rows)
            if rot is not None:
                proj = _update_rows(proj, out[2], s * rows)
                bds.append(out[3])
        vectors.block_until_ready()
        pca = {}
        if rot is not None:
            pca = dict(pca_rot=rot, pca_proj=proj,
                       pca_bounds=jnp.concatenate(bds, axis=1),
                       pca_cand_rows=cand_rows)
        return DenseIndex(vectors=vectors, n_docs=n_docs, scales=scales,
                          **pca)

    @jax.jit
    def make_slice_bf16(key):
        z = jax.random.normal(key, (rows, d), jnp.float32)
        return (z @ factor.T).astype(jnp.bfloat16)

    vectors = jnp.zeros((n_pad, d), jnp.bfloat16)
    for s in range(n_slices):
        vectors = _update_rows(vectors, make_slice_bf16(
            jax.random.PRNGKey(100 + s)), s * rows)
    vectors.block_until_ready()
    return DenseIndex(vectors=vectors, n_docs=n_docs)


def _timed_search(searcher, params, beam, batch, reps, q_width, vocab_size,
                  rng):
    """Scan REPS batches of realistic-length questions inside one jit.
    Returns (dt, compile_s, cert2_frac, hop1_scores, stop_probs) —
    cert2_frac is the measured hop-2 exactness-certificate fraction when
    the engine's PCA tier ran (else None); hop1_scores is the (reps,
    batch, beam) hop-1 candidate-score tensor from the timed run, used by
    the beam-4 stage to derive the auto prune margin without an extra
    engine compile; stop_probs is the matching (reps, batch, beam) tensor
    for unified engines (else None), used by the variable-hop stage to
    place its thresholds."""
    q_lens = rng.randint(12, 39, size=(reps, batch))
    qids = jax.random.randint(jax.random.PRNGKey(3), (reps, batch, q_width),
                              10, vocab_size - 1, jnp.int32)
    qmask = jnp.asarray(
        (np.arange(q_width)[None, None, :] < q_lens[:, :, None]), jnp.int32)
    raw_w = q_width - 2
    raw_ids = qids[:, :, :raw_w]
    raw_lens = jnp.asarray(np.maximum(q_lens - 2, 1), jnp.int32)

    @jax.jit
    def run(params, store, qids, qmask, raw_ids, raw_lens):
        def body(carry, xs):
            ids, mask, rid, rlen = xs
            out = searcher._search_impl(
                params, store, {"input_ids": ids, "attention_mask": mask},
                rid, rlen, beam1=beam, beam2=beam, topk=beam)
            acc, cacc = carry
            cert = out.get("pca_cert2")
            cm = (cacc + cert.astype(jnp.float32).mean()
                  if cert is not None else cacc)
            ys = {"h1": out["hop1_cand_scores"]}
            if "stop_probs" in out:        # static: engine has a stop head
                ys["stop"] = out["stop_probs"]
            return ((acc + out["path_scores"].sum(), cm), ys)
        (acc, cm), ys = jax.lax.scan(
            body, (jnp.float32(0), jnp.float32(0)),
            (qids, qmask, raw_ids, raw_lens))
        return acc, cm, ys

    has_cert = "pca_proj" in searcher._store and searcher._pca_on_hop(2)
    store = searcher._store
    t_c0 = time.time()
    _ = np.asarray(run(params, store, qids, qmask, raw_ids, raw_lens)[0])
    compile_s = time.time() - t_c0

    def timed():
        _, cm, ys = run(params, store, qids, qmask, raw_ids, raw_lens)
        return np.asarray(cm), ys

    dt, (cm, ys) = _min_time(timed)
    cert_frac = float(cm) / reps if has_cert else None
    stop = np.asarray(ys["stop"]) if "stop" in ys else None
    return dt, compile_s, cert_frac, np.asarray(ys["h1"]), stop


def _hnsw_bench(d=768, m=32, efc=200, nq=256, ef=128):
    """Native HNSW serving path (host CPU, no TPU involved): build rate,
    search q/s, and recall@10 vs exact on clustered data at the reference's
    efConstruction=200 / efSearch=128 (eval_mhop_retrieval.py:100-102; our
    M=32 vs the reference's FAISS M=512 — see native/hnsw.cpp).  Small n
    keeps this stage ~1 min; reference-scale evidence lives in PERF.md
    (scripts_dev/hnsw_scale_run.py)."""
    from multihop_dense_retrieval_tpu.index.hnsw import HNSWIndex
    n = _env("MDRT_BENCH_HNSW_N", 10_000)
    rng = np.random.RandomState(7)
    nc = max(n // 32, 4)
    centers = rng.randn(nc, d).astype(np.float32)
    data = (centers[rng.randint(0, nc, n)]
            + 0.35 * rng.randn(n, d).astype(np.float32))
    q = (centers[rng.randint(0, nc, nq)]
         + 0.35 * rng.randn(nq, d).astype(np.float32))
    idx = HNSWIndex(d, M=m, ef_construction=efc, seed=0)
    t0 = time.time()
    idx.add(data)
    build_s = time.time() - t0
    dt, (_, ids) = _min_time(lambda: idx.search(q, 10, ef_search=ef))
    qps = nq / dt
    exact = np.argpartition(-(q @ data.T), 9, axis=1)[:, :10]
    rec = float(np.mean([len(set(ids[i]) & set(exact[i])) / 10
                         for i in range(nq)]))
    print(f"# hnsw: build {build_s:.1f}s ({n/build_s:.0f} rows/s), search "
          f"{qps:.0f} q/s, recall@10 {rec:.3f} (n={n}, host CPU)",
          file=sys.stderr)
    return {"hnsw_build_rows_per_sec": round(n / build_s, 1),
            "hnsw_search_qps": round(qps, 1),
            "hnsw_recall_at_10": round(rec, 4)}


def _reader_bench(tunnel_s, b=32, reps=8):
    """ELECTRA-large reader throughput with length-sorted width bucketing
    (eval/qa_eval.py::predict defaults).  Chain lengths follow the same
    wiki-like distribution as the retrieval bench; per-width ms/batch are
    measured with a scan-in-one-jit and combined by the batch-width
    histogram.  Measured 2026-08 (fp32-erf gelu): 692.4 chains/s vs 346.3
    fixed-512 (2.0x)."""
    from multihop_dense_retrieval_tpu.models.reader import QAReader

    # bf16 scores: the serving default since the trained-reader fidelity
    # run showed 100% answer agreement (scripts_dev/fidelity_trained.py)
    cfg = EncoderConfig.electra_large(
        attention_scores_dtype=os.environ.get("MDRT_BENCH_READER_SCORES",
                                              "bfloat16"))
    model = QAReader(cfg, sp_pred=True)

    def mk_net(r, bb, l):
        key = jax.random.PRNGKey(11)
        ones = jnp.ones((r, bb, l), jnp.int32)
        return {"input_ids": jax.random.randint(key, (r, bb, l), 5, 20000,
                                                jnp.int32),
                "attention_mask": ones,
                "token_type_ids": jnp.zeros((r, bb, l), jnp.int32),
                "paragraph_mask": ones,
                "sent_offsets": jnp.zeros((r, bb, 40), jnp.int32),
                "sent_mask": jnp.ones((r, bb, 40), jnp.int32),
                "label": jnp.zeros((r, bb), jnp.int32)}

    params = model.init(jax.random.PRNGKey(0),
                        {k: v[0] for k, v in mk_net(1, 1, 64).items()})

    def time_width(bb, l):
        nets = mk_net(reps, bb, l)

        @jax.jit
        def run(p, nets):
            def body(c, net):
                return c + model.apply(p, net)["rank_score"].sum(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), nets)
            return acc

        np.asarray(run(params, nets))
        dt, _ = _min_time(lambda: np.asarray(run(params, nets)))
        return (dt - tunnel_s) / reps

    rng = np.random.RandomState(3)
    n = 4096
    lens = (10 + rng.randint(12, 39, n)
            + synth_doc_lens(rng, n) + synth_doc_lens(rng, n))
    lens = np.clip(lens, 64, 512)
    lens.sort()
    widths = [min(int(-(-lens[s:s + b].max() // 128) * 128), 512)
              for s in range(0, n, b)]
    import collections
    hist = collections.Counter(widths)
    total = sum(time_width(b, w) * cnt for w, cnt in sorted(hist.items()))
    # fixed-width baseline at the SAME batch size, so the reported gain is
    # the width bucketing alone (measured: b=16 and b=32 fixed-512 are
    # within 1% of each other — 285.4 vs 287.9 chains/s)
    fixed = time_width(b, 512)
    return {"reader_chains_per_sec": round(n / total, 1),
            "reader_fixed512_chains_per_sec": round(b / fixed, 1)}


def _train_bench(tunnel_s):
    """Contrastive mhop train-step throughput at the reference budget
    (train_mhop.py:166-190: roberta-base, 6 views at q 70 / q_sp 350 /
    c 300, Adam + no-decay groups + clip-2.0 + linear warmup).  B=16 is
    roughly one accelerator's share of the reference's batch-150-on-8-V100
    run (README.md:147).  REPS full steps (fwd + bwd + clip + Adam) are
    scanned inside ONE jit and the final loss transferred, same timing
    discipline as every other stage.  MDRT_BENCH_TRAIN_B / _TRAIN_REPS /
    _TRAIN_REMAT override (remat trades ~30% step time for activation
    memory; off by default — B=16 fits beside the resident index)."""
    import optax

    from multihop_dense_retrieval_tpu.core.config import RetrieverTrainConfig
    from multihop_dense_retrieval_tpu.train import losses
    from multihop_dense_retrieval_tpu.train import trainer as T

    b = _env("MDRT_BENCH_TRAIN_B", 16)
    reps = _env("MDRT_BENCH_TRAIN_REPS", 4)
    layers = _env("MDRT_BENCH_LAYERS", 12)
    remat = bool(_env("MDRT_BENCH_TRAIN_REMAT", 0))
    cfg = EncoderConfig.roberta_base(num_layers=layers)
    # cls_only + optional remat: exactly cli/common.init_retriever's
    # construction (the train CLIs' path) — cls_only grads are identical
    # (non-CLS last-layer outputs never reach the loss)
    model = MhopRetriever(cfg, cls_only=True, remat=remat)
    tcfg = RetrieverTrainConfig(batch_size=b)
    tx = T.make_optimizer(tcfg, 1000)
    rng = np.random.RandomState(11)
    batch = {}
    for name, l in (("q", tcfg.max_q_len), ("q_sp", tcfg.max_q_sp_len),
                    ("c1", tcfg.max_c_len), ("c2", tcfg.max_c_len),
                    ("neg1", tcfg.max_c_len), ("neg2", tcfg.max_c_len)):
        batch[f"{name}_input_ids"] = jnp.asarray(
            rng.randint(5, cfg.vocab_size - 5, size=(b, l)), jnp.int32)
        batch[f"{name}_mask"] = jnp.ones((b, l), jnp.int32)
    params = model.init(jax.random.PRNGKey(11), batch)
    state = T.TrainState.create(params, tx)

    def loss_fn(p, bt):
        return losses.mhop_loss(model.apply(p, bt))

    @jax.jit
    def run(st, bt):
        def body(carry, _):
            loss, grads = jax.value_and_grad(loss_fn)(carry.params, bt)
            updates, opt_state = tx.update(grads, carry.opt_state,
                                           carry.params)
            return T.TrainState(
                params=optax.apply_updates(carry.params, updates),
                opt_state=opt_state, step=carry.step + 1), loss
        st, ls = jax.lax.scan(body, st, None, length=reps)
        return ls[-1]

    t0 = time.perf_counter()
    np.asarray(run(state, batch))          # compile + warm
    compile_s = time.perf_counter() - t0
    dt, loss = _min_time(lambda: float(np.asarray(run(state, batch))))
    dt -= tunnel_s
    assert np.isfinite(loss), f"train bench produced non-finite loss {loss}"
    print(f"# train: compile {compile_s:.0f}s, {dt / reps * 1000:.1f} "
          f"ms/step at B={b} (remat={int(remat)})", file=sys.stderr)
    return {"train_ex_per_sec": round(b * reps / dt, 1)}


def _qa_train_bench(tunnel_s):
    """ELECTRA-large QA-reader train-step throughput — the reference's
    HEAVIEST trainer (train_qa.py, README.md:217-236: electra-large
    discriminator, train_batch_size 12 per device, max_seq_len 512,
    sp-pred with sp_weight 0.05, Adam, fp16 + grad-accum 8 on V100s).
    Here: the same micro-batch at 512 tokens, bf16 compute, remat'd
    encoder layers instead of fp16-for-memory, full step (fwd + bwd +
    clip + Adam) scanned REPS times inside one jit.  Runs AFTER the
    serving index is freed — 334M params x (fp32 master + Adam moments)
    plus activations need the HBM."""
    import optax

    from multihop_dense_retrieval_tpu.core.config import RetrieverTrainConfig
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train import qa as TQA
    from multihop_dense_retrieval_tpu.train import trainer as T

    b = _env("MDRT_BENCH_QA_TRAIN_B", 12)
    reps = _env("MDRT_BENCH_QA_TRAIN_REPS", 4)
    L = _env("MDRT_BENCH_QA_TRAIN_LEN", 512)
    remat = bool(_env("MDRT_BENCH_QA_TRAIN_REMAT", 1))
    n_slots, n_sents = 10, 40
    cfg = EncoderConfig.electra_large(
        num_layers=_env("MDRT_BENCH_QA_LAYERS", 24),   # CPU smoke knob
        attention_scores_dtype=os.environ.get("MDRT_BENCH_READER_SCORES",
                                              "bfloat16"))
    model = QAReader(cfg, sp_pred=True, remat=remat)
    rng = np.random.RandomState(13)
    ones = jnp.ones((b, L), jnp.int32)
    batch = {
        "input_ids": jnp.asarray(rng.randint(5, cfg.vocab_size - 5,
                                             size=(b, L)), jnp.int32),
        "attention_mask": ones,
        "token_type_ids": jnp.zeros((b, L), jnp.int32),
        "paragraph_mask": ones,
        "sent_offsets": jnp.asarray(rng.randint(1, L, size=(b, n_sents)),
                                    jnp.int32),
        "sent_mask": jnp.ones((b, n_sents), jnp.int32),
        "sent_labels": jnp.asarray(rng.randint(0, 2, size=(b, n_sents)),
                                   jnp.int32),
        "label": jnp.asarray(rng.randint(0, 2, size=(b,)), jnp.int32),
        "starts": jnp.asarray(rng.randint(-1, L, size=(b, n_slots)),
                              jnp.int32),
        "ends": jnp.asarray(rng.randint(-1, L, size=(b, n_slots)),
                            jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(17),
                        {k: v[:1] for k, v in batch.items()
                         if k in ("input_ids", "attention_mask",
                                  "token_type_ids", "paragraph_mask",
                                  "sent_offsets", "sent_mask")})
    tx = T.make_optimizer(RetrieverTrainConfig(batch_size=b,
                                               learning_rate=5e-5), 1000)
    state = T.TrainState.create(params, tx)

    def loss_fn(p, bt):
        return TQA.qa_loss(model.apply(p, bt), bt, sp_weight=0.05)

    @jax.jit
    def run(st, bt):
        def body(carry, _):
            loss, grads = jax.value_and_grad(loss_fn)(carry.params, bt)
            updates, opt_state = tx.update(grads, carry.opt_state,
                                           carry.params)
            return T.TrainState(
                params=optax.apply_updates(carry.params, updates),
                opt_state=opt_state, step=carry.step + 1), loss
        st, ls = jax.lax.scan(body, st, None, length=reps)
        return ls[-1]

    t0 = time.perf_counter()
    np.asarray(run(state, batch))          # compile + warm
    compile_s = time.perf_counter() - t0
    dt, loss = _min_time(lambda: float(np.asarray(run(state, batch))))
    dt -= tunnel_s
    assert np.isfinite(loss), f"qa train bench non-finite loss {loss}"
    print(f"# qa_train: compile {compile_s:.0f}s, {dt / reps * 1000:.1f} "
          f"ms/step at B={b} L={L} (remat={int(remat)})", file=sys.stderr)
    return {"qa_train_ex_per_sec": round(b * reps / dt, 1),
            "qa_train_config": f"electra_large_b{b}_len{L}_remat{int(remat)}"}


def _bucketed_score(score_fn, net, buckets, full_width):
    """Per-row scalar scores summed over length-sorted width tiles.

    Rows are sorted by attention-mask length and split into EQUAL tiles;
    tile t is scored at ``buckets[t]`` columns when every row fits
    (lax.cond — fallback scores at ``full_width``).  Equal tile sizes +
    repeated bucket widths keep the number of distinct compiled subgraphs
    small (XLA CSEs identical tiles), which matters for the remote-compile
    transport.  EXACT for any score_fn whose per-row value ignores pad
    columns beyond the row's length (the QA reader qualifies: span logits
    are paragraph-masked, rank pooling is attention-masked) — asserted by
    tests/test_bench_helpers.py::test_bucketed_score_matches_full_width.
    Summing per tile (not concatenating logits) sidesteps ragged-width
    outputs; the bench only needs a sync scalar.
    """
    n = net["input_ids"].shape[0]
    n_tiles = len(buckets)
    assert n % n_tiles == 0, (n, n_tiles)
    lens = net["attention_mask"].sum(1).astype(jnp.int32)
    order = jnp.argsort(lens)
    net_s = {k: v[order] for k, v in net.items()}
    lens_s = lens[order]
    ts = n // n_tiles
    total = jnp.float32(0)
    for t, w in enumerate(buckets):
        sub = {k: v[t * ts:(t + 1) * ts] for k, v in net_s.items()}
        if w >= full_width:
            total += score_fn(sub, full_width)
        else:
            tile_max = lens_s[(t + 1) * ts - 1]
            total += jax.lax.cond(
                tile_max <= w,
                lambda sub=sub, w=w: score_fn(sub, w),
                lambda sub=sub: score_fn(sub, full_width))
    return total


def _end2end_bench(searcher, params, enc_cfg, tunnel_s, rng, *,
                   batch=None, reps=2, beam=5, topk=None, two_stage_m=5,
                   rank_width=128, q_width=40):
    """MEASURED composed question→answer throughput, on chip.

    One jit program per variant scans REPS batches of: 2-hop beam-5 search
    → on-device chain assembly (question ⊕ hop-1 doc ⊕ hop-2 doc tokens,
    BERT-style pair layout at 512) → ELECTRA-large reader → band-masked
    span decode (train/qa.py::decode_spans).  `end2end_qps` reads all
    `topk` chains fully (the reference's behavior, scripts/train_qa.py:
    380-481, timed by scripts/end2end.py:103-144); `end2end_2stage_qps`
    ranks every chain at `rank_width` tokens and reads only the top-m fully
    (the two-stage read, eval/qa_eval.py::predict rank_topm).  Sentence-
    marker insertion is host cosmetics (same token count) and answer-text
    decode is host-side in production; neither changes device FLOPs, so
    this measures the deployable pipeline's device throughput."""
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train.qa import decode_spans

    batch = batch if batch is not None else _env("MDRT_BENCH_E2E_BATCH", 16)
    topk = topk if topk is not None else _env("MDRT_BENCH_E2E_TOPK", 25)
    # bf16 scores by default — trained-reader-validated (PERF.md fidelity)
    rcfg = EncoderConfig.electra_large(
        num_layers=_env("MDRT_BENCH_READER_LAYERS", 24),  # CPU smoke knob
        attention_scores_dtype=os.environ.get("MDRT_BENCH_READER_SCORES",
                                              "bfloat16"))
    reader = QAReader(rcfg, sp_pred=True)
    spec_b = TokenizerSpec(cls_id=101, sep_id=102, pad_id=0,
                           vocab_size=rcfg.vocab_size, roberta_style=False)
    net0 = {"input_ids": jnp.ones((1, 64), jnp.int32),
            "attention_mask": jnp.ones((1, 64), jnp.int32),
            "token_type_ids": jnp.zeros((1, 64), jnp.int32),
            "paragraph_mask": jnp.ones((1, 64), jnp.int32),
            "sent_offsets": jnp.zeros((1, 40), jnp.int32)}
    rparams = reader.init(jax.random.PRNGKey(5), net0)

    store = searcher._store
    Lt = store["text_ids"].shape[1]

    def read_rows(rp, net, width):
        sub = {k: net[k][:, :width]
               for k in ("input_ids", "attention_mask", "token_type_ids")}
        sub["paragraph_mask"] = sub["attention_mask"]
        sub["sent_offsets"] = jnp.zeros((net["input_ids"].shape[0], 40),
                                        jnp.int32)
        return reader.apply(rp, sub)

    def assemble(out, store, rid, rlen):
        # store comes in as a jit ARGUMENT — a closure over searcher._store
        # here would bake the 3.1GB token array into the HLO as constants
        # (the serialized program then breaks the remote-compile transport)
        h1 = out["hop1_ids"].reshape(-1)
        h2 = out["hop2_ids"].reshape(-1)
        p1 = store["text_ids"][h1].astype(jnp.int32)
        l1 = store["text_lens"][h1].astype(jnp.int32)
        p2 = store["text_ids"][h2].astype(jnp.int32)
        l2 = store["text_lens"][h2].astype(jnp.int32)
        j = jnp.arange(2 * Lt, dtype=jnp.int32)[None, :]
        g1 = jnp.clip(j, 0, Lt - 1)
        g2 = jnp.clip(j - l1[:, None], 0, Lt - 1)
        b_ids = jnp.where(j < l1[:, None],
                          jnp.take_along_axis(p1, g1, axis=1),
                          jnp.take_along_axis(p2, g2, axis=1))
        a_ids = jnp.repeat(rid, topk, axis=0)
        a_lens = jnp.repeat(rlen, topk, axis=0)
        net = assemble_pair_inputs(a_ids, a_lens, b_ids, l1 + l2, 512,
                                   spec_b)
        # retriever vocab (50k) > reader vocab (30k): clamp for the embed
        net["input_ids"] = jnp.minimum(net["input_ids"],
                                       rcfg.vocab_size - 1)
        return net

    # TWO device programs per variant, chained on-device through their
    # outputs with async dispatch (no host work between them): one giant
    # scan-everything jit serialized an HLO too large for the remote-compile
    # transport (broken pipe).  The python loop only pays async dispatch;
    # the single final transfer syncs the whole pipeline.
    @jax.jit
    def search_assemble(pr, store, ids, mask, rid, rlen):
        out = searcher._search_impl(
            pr, store, {"input_ids": ids, "attention_mask": mask},
            rid, rlen, beam1=beam, beam2=beam, topk=topk)
        return assemble(out, store, rid, rlen)

    def score_rows(rp, net, width):
        ro = read_rows(rp, net, width)
        s, e, sc = decode_spans(ro["start_logits"], ro["end_logits"], 30)
        return ro["rank_score"].sum() + sc.sum()

    # Length-bucketed read, the device-side analogue of qa_eval.predict's
    # host-side width bucketing (692 vs 345 chains/s standalone).  Chain-
    # length CDF here: P(len<=256)=.61, P(len<=320)=.82, so cumulative
    # tile fracs .25/.50/.75 leave safe margin before the lax.cond
    # fallback fires.
    read_buckets = (256, 256, 320, 512)

    def score_bucketed(rp, net):
        return _bucketed_score(lambda sub, w: score_rows(rp, sub, w),
                               net, read_buckets, 512)

    @jax.jit
    def read_one_stage(rp, net):
        return score_bucketed(rp, net)

    @jax.jit
    def read_two_stage(rp, net):
        ranks = read_rows(rp, net, rank_width)["rank_score"]
        _, sel = jax.lax.top_k(ranks.reshape(batch, topk), two_stage_m)
        flat = (jnp.arange(batch, dtype=jnp.int32)[:, None] * topk
                + sel).reshape(-1)
        net_m = {k: v[flat] for k, v in net.items()}
        return score_bucketed(rp, net_m)

    # Length-bucketed RANK pass (round-4 VERDICT #2): the fixed-width rank
    # pass truncates every chain longer than rank_width; this one scores
    # tile t of the length-sorted rows at rank_buckets[t] (lax.cond
    # fallback to full width), so a chain that fits its tile ranks
    # UNtruncated — with the default exact tiling no chain is ever
    # truncated and the kept set provably equals a full-width rank pass's
    # (tests/test_reader.py::test_bucketed_rank_pass_bit_matches_full_width).
    # MDRT_BENCH_RANK_BUCKETS overrides (capped tilings trade fidelity for
    # speed exactly like the old fixed width); "off" skips the variant.
    rb_env = os.environ.get("MDRT_BENCH_RANK_BUCKETS", "192,256,320,512")
    rank_buckets = (tuple(int(x) for x in rb_env.split(","))
                    if rb_env not in ("off", "") else ())

    def ranks_bucketed(rp, net):
        n = net["input_ids"].shape[0]
        lens = net["attention_mask"].sum(1).astype(jnp.int32)
        order = jnp.argsort(lens)
        net_s = {k: v[order] for k, v in net.items()}
        lens_s = lens[order]
        ts = n // len(rank_buckets)
        parts = []
        for t, w in enumerate(rank_buckets):
            sub = {k: v[t * ts:(t + 1) * ts] for k, v in net_s.items()}
            if w >= 512:
                parts.append(read_rows(rp, sub, 512)["rank_score"])
            else:
                tile_max = lens_s[(t + 1) * ts - 1]
                parts.append(jax.lax.cond(
                    tile_max <= w,
                    lambda sub=sub, w=w: read_rows(rp, sub,
                                                   w)["rank_score"],
                    lambda sub=sub: read_rows(rp, sub, 512)["rank_score"]))
        ranks_s = jnp.concatenate(parts).reshape(-1)
        return jnp.zeros((n,), ranks_s.dtype).at[order].set(ranks_s)

    @jax.jit
    def read_two_stage_bkt(rp, net):
        ranks = ranks_bucketed(rp, net)
        _, sel = jax.lax.top_k(ranks.reshape(batch, topk), two_stage_m)
        flat = (jnp.arange(batch, dtype=jnp.int32)[:, None] * topk
                + sel).reshape(-1)
        net_m = {k: v[flat] for k, v in net.items()}
        return score_bucketed(rp, net_m)

    @jax.jit
    def read_retsel(rp, net):
        # top-m by RETRIEVER chain rank: the beam engine's chains arrive
        # sorted per question (lax.top_k), so selection costs nothing and
        # the reader never ranks — the cheapest two-stage variant.  Its
        # quality contract is different in KIND from the rank-width knobs:
        # it trusts the retriever's path ordering for the top-m cut, so
        # fidelity depends on retriever quality on the target corpus
        # (validate per deployment; the synthetic fidelity harness has no
        # retriever ordering to measure)
        flat = (jnp.arange(batch, dtype=jnp.int32)[:, None] * topk
                + jnp.arange(two_stage_m, dtype=jnp.int32)[None, :]
                ).reshape(-1)
        net_m = {k: v[flat] for k, v in net.items()}
        return score_bucketed(rp, net_m)

    q_lens = rng.randint(12, 39, size=(reps, batch))
    qids = np.random.RandomState(9).randint(
        10, enc_cfg.vocab_size - 1,
        size=(reps, batch, q_width)).astype(np.int32)
    qmask = (np.arange(q_width)[None, None, :]
             < q_lens[:, :, None]).astype(np.int32)
    xs = [(jnp.asarray(qids[r]), jnp.asarray(qmask[r]),
           jnp.asarray(qids[r, :, :q_width - 2]),
           jnp.asarray(np.maximum(q_lens[r] - 2, 1).astype(np.int32)))
          for r in range(reps)]

    variants = [("end2end_qps", read_one_stage),
                ("end2end_2stage_qps", read_two_stage)]
    if rank_buckets and (batch * topk) % len(rank_buckets) == 0:
        variants.append(("end2end_2stage_bkt_qps", read_two_stage_bkt))
    if _env("MDRT_BENCH_E2E_RETSEL", 1):
        variants.append(("end2end_retsel_qps", read_retsel))

    res = {}
    for name, read_j in variants:

        def run_all():
            accs = []
            for ids, mask, rid, rlen in xs:
                net = search_assemble(params, store, ids, mask, rid, rlen)
                accs.append(read_j(rparams, net))
            total = accs[0]
            for a in accs[1:]:
                total = total + a
            return np.asarray(total)

        t_c = time.time()
        run_all()
        c_s = time.time() - t_c
        dt, _ = _min_time(run_all)
        dt -= tunnel_s
        res[name] = round(reps * batch / dt, 1)
        print(f"# {name}: compile+warm {c_s:.0f}s, steady "
              f"{dt / reps * 1000:.1f} ms/batch (batch={batch}, beam={beam},"
              f" topk={topk})", file=sys.stderr)
    res["end2end_config"] = (f"beam{beam}_top{topk}_readbkt"
                             f"{'-'.join(map(str, read_buckets))}"
                             f"_2stage{two_stage_m}@{rank_width}"
                             f"_rankbkt{'-'.join(map(str, rank_buckets))}")
    return res


def _honest_json(error, **extras):
    """The one contract with the driver: stdout's last line ALWAYS parses.

    BENCH_r03 was lost because a fast backend-init failure (`RuntimeError:
    Unable to initialize backend 'axon': UNAVAILABLE`) escaped as a raw
    traceback — rc=1 with parsed:null.  Every terminal path now funnels
    through here instead."""
    print(json.dumps({
        "metric": "2hop_beam_search_queries_per_sec",
        "value": 0.0, "unit": "questions/s", "vs_baseline": 0.0,
        "error": error, **extras,
    }), flush=True)


# Live view of the measurement in flight, so a watchdog fire can still
# report the REAL headline plus every extra gathered so far instead of
# value 0.0: _run stashes the headline dict under "base" once measured and
# keeps a reference to its extras dict under "extras".
_SNAPSHOT = {}
# Monotonic deadline after which _run starts no NEW extra stage (set by the
# child from the watchdog budget); None = no limit.
_EXTRAS_DEADLINE = None


def _stage_ok(name, extras):
    """True if there is still budget to start the extra stage `name`.

    When the child is close to its watchdog limit (a cold-cache run after
    a tunnel flake, or a mid-run retry with little budget left), finishing
    cleanly with the headline and a partial extras set beats the watchdog
    killing the whole run."""
    if _EXTRAS_DEADLINE is None or time.monotonic() < _EXTRAS_DEADLINE:
        return True
    extras.setdefault("skipped_for_time", []).append(name)
    print(f"# skipping {name}: nearing watchdog budget", file=sys.stderr,
          flush=True)
    return False


def _watchdog(limit=None):
    """Emit an honest JSON line and hard-exit if the run wedges.

    The axon tunnel has been observed to become unresponsive in a way that
    blocks even `jax.devices()` forever; a silently hung bench would stall
    the driver that runs it.  Full cold runs measure ~6-10 min, so the
    default 45-min limit only ever fires on a true hang
    (MDRT_BENCH_WATCHDOG_S=0 disables)."""
    import threading

    if limit is None:
        limit = _env("MDRT_BENCH_WATCHDOG_S", 2700)
    if not limit:
        return None

    def fire():
        base = _SNAPSHOT.get("base")
        if base:
            try:
                print(json.dumps({
                    **base,
                    "error": f"watchdog: partial results after {limit}s",
                    **dict(_SNAPSHOT.get("extras") or {}),
                }), flush=True)
                os._exit(2)
            except Exception:
                pass          # racing mutation — fall back to honest JSON
        _honest_json(f"watchdog: no result after {limit}s — TPU tunnel "
                     "unresponsive or pathological compile")
        os._exit(2)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()
    return t


# Error texts that mean "the backend/tunnel is down, not the bench" — the
# orchestrator keeps retrying these until its time budget runs out
# (CLAUDE.md: the tunnel dies for hours and comes back; a one-shot run
# forfeits the round, which is exactly what happened to BENCH_r03).
_BACKEND_DOWN_MARKERS = (
    "UNAVAILABLE", "Unable to initialize backend", "DEADLINE_EXCEEDED",
    "probe timed out", "failed to connect", "Connection", "Socket closed",
    "backend setup/compile error",
)


def _tail(s, n=500):
    s = (s or "").strip()
    return s[-n:]


def _probe_backend(timeout_s):
    """Check in a SUBPROCESS that the JAX backend can initialize.

    In-process `jax.devices()` on a dead tunnel can block forever AND a
    failed init may poison the process's backend cache; a throwaway
    subprocess gives a clean, killable answer each time."""
    import subprocess
    code = (
        "import os, jax\n"
        "p = os.environ.get('MDRT_BENCH_PLATFORM')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "print(len(jax.devices()))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s}s"
    if r.returncode == 0:
        return True, r.stdout.strip()
    return False, _tail(r.stderr)


def _run_child(budget_s):
    """Run the actual bench as a subprocess; return (rc, last_stdout_line).

    The child gets its own watchdog slightly inside our timeout so IT
    prints the honest JSON; if it wedges past that, we kill it here."""
    import subprocess
    env = dict(os.environ)
    env["MDRT_BENCH_CHILD"] = "1"
    env["MDRT_BENCH_WATCHDOG_S"] = str(max(int(budget_s) - 30, 60))
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           stdout=subprocess.PIPE, text=True,
                           timeout=budget_s + 60, env=env)
        out = r.stdout or ""
        rc = r.returncode
    except subprocess.TimeoutExpired as e:
        out = (e.stdout.decode() if isinstance(e.stdout, bytes)
               else e.stdout) or ""
        rc = -9
    lines = [ln for ln in out.splitlines() if ln.strip()]
    return rc, (lines[-1] if lines else "")


def main():
    """Driver entry.  Orchestrator by default; MDRT_BENCH_CHILD=1 runs the
    measurement in-process (what the orchestrator spawns).

    Contract either way: stdout's last line is ONE parseable JSON object —
    the headline on success, `{"value": 0.0, "error": ...}` on any failure
    — and backend-down failures are retried with backoff until the
    MDRT_BENCH_WATCHDOG_S budget (default 2700s) is nearly spent."""
    if os.environ.get("MDRT_BENCH_CHILD"):
        global _EXTRAS_DEADLINE
        lim = _env("MDRT_BENCH_WATCHDOG_S", 2700)
        margin = _env("MDRT_BENCH_EXTRAS_MARGIN_S", 390)
        if lim:
            # may be in the past (margin >= budget): the headline is not
            # gated by _stage_ok, so "no time for extras" skips them ALL
            # rather than giving early stages a grace window that later
            # ones (which the margin exists to protect) never get
            _EXTRAS_DEADLINE = time.monotonic() + (lim - margin)
        timer = _watchdog(lim or None)
        try:
            _main()
            rc = 0
        except Exception as e:
            _honest_json(f"{type(e).__name__}: {_tail(str(e))}")
            rc = 1
        finally:
            if timer is not None:
                timer.cancel()
        sys.exit(rc)
    sys.exit(_orchestrate())


def _orchestrate():
    limit = _env("MDRT_BENCH_WATCHDOG_S", 2700)
    min_run = _env("MDRT_BENCH_MIN_RUN_S", 600)   # a cold full run ~6-10min
    backoff0 = _env("MDRT_BENCH_RETRY_BACKOFF_S", 45)
    probe_t = _env("MDRT_BENCH_PROBE_TIMEOUT_S", 90)
    deadline = time.monotonic() + limit
    backoff, last_err, attempts = backoff0, "no attempt made", 0

    while True:
        remaining = deadline - time.monotonic()
        if remaining < min_run:
            _honest_json(
                f"backend unavailable for {limit - remaining:.0f}s "
                f"({attempts} attempts); last error: {last_err}",
                attempts=attempts)
            return 2
        ok, detail = _probe_backend(min(probe_t, max(remaining / 4, 10)))
        attempts += 1
        if not ok:
            last_err = detail
            print(f"# probe failed ({_tail(detail, 160)}); retrying in "
                  f"{backoff}s", file=sys.stderr, flush=True)
            time.sleep(min(backoff, max(remaining - min_run, 1)))
            backoff = min(backoff * 2, 300)
            continue
        print(f"# backend up ({detail} device(s)); launching bench with "
              f"{remaining:.0f}s budget", file=sys.stderr, flush=True)
        rc, line = _run_child(remaining - 30)
        try:
            parsed = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            parsed = None
        if parsed is not None and "error" not in parsed:
            print(line, flush=True)        # success — the headline line
            return 0
        err = (parsed or {}).get("error", f"child rc={rc}, no JSON line")
        if any(m in err for m in _BACKEND_DOWN_MARKERS):
            last_err, backoff = err, backoff0   # tunnel flaked mid-run
            print(f"# child hit backend error; will retry: "
                  f"{_tail(err, 160)}", file=sys.stderr, flush=True)
            # a flapping tunnel can pass the probe then kill the child —
            # without this sleep that loop burns the budget on jax imports
            time.sleep(min(backoff0,
                           max(deadline - time.monotonic() - min_run, 1)))
            continue
        # a real (non-backend) failure: retrying can't fix it — report it
        if parsed is not None:
            print(line, flush=True)
        else:
            _honest_json(err)
        return 1


def _main():
    platform = os.environ.get("MDRT_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    # Persistent compilation cache: the axon backend serializes executables
    # (verified: cache HITS through the tunnel), so one warm run makes every
    # later run — in particular the driver's end-of-round run — skip the
    # ~5-min remote compiles.  Round 3 lost its number to a tunnel death
    # inside exactly that window; shrinking the window is the cheapest
    # resilience we can buy.  MDRT_BENCH_COMPILE_CACHE=off disables.
    from multihop_dense_retrieval_tpu.core.compile_cache import \
        enable_compile_cache
    enable_compile_cache(os.environ.get("MDRT_BENCH_COMPILE_CACHE"))
    poison = os.environ.get("MDRT_BENCH_POISON")
    if poison:                            # test hook: forced child failure
        if poison == "backend":           # mimic a mid-run tunnel death
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile "
                               "error (poisoned by MDRT_BENCH_POISON)")
        raise RuntimeError("poisoned by MDRT_BENCH_POISON")
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
        # e is now unbound (frames referenced by its traceback held the
        # failed attempt's multi-GB arrays alive); drop compiled-program
        # caches and collect so HBM is actually empty before the retry —
        # without this, even a 1.3M retry OOMs on its first allocation
        jax.clear_caches()
        gc.collect()


def _run(n_docs):
    batch = _env("MDRT_BENCH_BATCH", 192)
    beam = _env("MDRT_BENCH_BEAM", 1)
    reps = _env("MDRT_BENCH_REPS", 8)
    layers = _env("MDRT_BENCH_LAYERS", 12)
    dtype = os.environ.get("MDRT_BENCH_DTYPE", "int8")
    fast = _env("MDRT_BENCH_FAST", 0)
    buckets_env = os.environ.get(
        "MDRT_BENCH_BUCKETS", ",".join(map(str, HOP2_BUCKETS_5TILE)))
    buckets = (() if buckets_env in ("off", "") else
               tuple(int(x) for x in buckets_env.split(",")))
    fracs_env = os.environ.get(
        "MDRT_BENCH_TILE_FRACS", ",".join(map(str, HOP2_TILE_FRACS_5TILE)))
    tile_fracs = (tuple(float(x) for x in fracs_env.split(","))
                  if fracs_env else ())
    # beam-4 default: the 6-tile split that WINS at 768 hop-2 rows (920 vs
    # 849 q/s sweep, batch 192) even though it loses 23% at beam-1's 192
    # rows — config.default_hop2_tiling encodes the same rule
    b4_buckets_env = os.environ.get("MDRT_BENCH_B4_BUCKETS", "")
    b4_buckets = (tuple(int(x) for x in b4_buckets_env.split(","))
                  if b4_buckets_env else HOP2_BUCKETS_6TILE)
    b4_fracs_env = os.environ.get("MDRT_BENCH_B4_FRACS", "")
    b4_fracs = (tuple(float(x) for x in b4_fracs_env.split(","))
                if b4_fracs_env else HOP2_TILE_FRACS_6TILE)
    run_beam4 = (not fast) and _env("MDRT_BENCH_BEAM4", 1) and beam == 1
    run_latency = (not fast) and _env("MDRT_BENCH_LATENCY", 1)
    run_bf16 = (not fast) and _env("MDRT_BENCH_BF16", 1) and dtype == "int8"
    run_pca = (not fast) and _env("MDRT_BENCH_PCA", 1) and dtype == "int8"
    run_reader = (not fast) and _env("MDRT_BENCH_READER", 1)
    run_e2e = (not fast) and _env("MDRT_BENCH_E2E", 1)
    run_hnsw = (not fast) and _env("MDRT_BENCH_HNSW", 1)
    run_train = (not fast) and _env("MDRT_BENCH_TRAIN", 1)
    run_qa_train = (not fast) and _env("MDRT_BENCH_QA_TRAIN", 1)
    run_unified = (not fast) and _env("MDRT_BENCH_UNIFIED", 1)
    max_q_sp_len, text_len = 350, 300
    q_width = 40  # static question width: fits the 12-38-token question
    # distribution + specials (host-side q_width_multiple bucketing serves
    # arbitrary lengths in production)
    d = 768

    scores_dtype = os.environ.get("MDRT_BENCH_SCORES", "bfloat16")
    cfg = EncoderConfig.roberta_base(num_layers=layers,
                                     attention_scores_dtype=scores_dtype)
    # cls_only: the final encoder layer computes only the CLS position —
    # bit-identical retrieval vectors (tests/test_encoder.py), fewer FLOPs
    model = MhopRetriever(cfg, cls_only=True)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32), method=model.encode_seq)

    chunk = 2048
    n_pad = -(-n_docs // chunk) * chunk
    factor, rot = _encoder_moment_factor(model, params, cfg, d)
    text_ids, text_lens, empty = _make_tokens(n_pad, text_len,
                                              cfg.vocab_size)
    spec = TokenizerSpec(cls_id=0, sep_id=2, pad_id=1,
                         vocab_size=cfg.vocab_size, roberta_style=True)

    def build_searcher(index, b1, b2, topk, bks, fracs, use_pca=False,
                       prune_margin=0.0):
        scfg = SearchConfig(beam_size_1=b1, beam_size_2=b2, topk=topk,
                            max_q_len=q_width, max_q_sp_len=max_q_sp_len,
                            chunk_rows=chunk, use_pallas=True,
                            hop2_buckets=bks, hop2_tile_fracs=fracs,
                            use_pca=use_pca,
                            hop2_prune_margin=prune_margin)
        return BeamSearcher(
            encode_fn=lambda p, ids, mask, tt=None: model.apply(
                p, ids, mask, tt, method=model.encode_seq),
            params=params, index=index, text_ids=text_ids,
            text_lens=text_lens, empty=empty, spec=spec, config=scfg,
            mesh=None)

    tunnel_s = measure_tunnel_overhead()
    nprng = np.random.RandomState(23)
    extras, errors = {}, {}
    _SNAPSHOT.clear()
    _SNAPSHOT["extras"] = extras      # live reference for the watchdog

    def _stash_headline(qps, cfgname):
        _SNAPSHOT["base"] = {
            "metric": "2hop_beam_search_queries_per_sec",
            "value": round(qps, 1),
            "unit": f"questions/s (beam={beam}, {n_docs} docs x {d} "
                    f"{dtype}, {layers}-layer encoder, batch={batch}, "
                    f"1 TPU chip, engine={cfgname})",
            "vs_baseline": round(qps / BASELINE_QPS, 2),
            "baseline_qps_range": list(BASELINE_RANGE),
            "tunnel_correction_ms": round(tunnel_s * 1000, 1),
            "timed_reps": _env("MDRT_BENCH_TIMED_REPS", 3),
            "hop2_buckets": list(buckets),
        }

    # --- exact-bf16 delta config (own index; freed before the int8 build
    # even on failure — the ~8 GB bf16 index outliving an exception would
    # cascade into a headline OOM and a silent half-scale retry)
    if run_bf16 and _stage_ok("bf16", extras):
        s_bf = bf16_index = None
        try:
            bf16_index = _make_index(n_pad, n_docs, d, "bf16", factor)
            s_bf = build_searcher(bf16_index, beam, beam, beam, buckets,
                                  tile_fracs)
            dtb, cb, _, _, _ = _timed_search(s_bf, params, beam, batch, reps,
                                       q_width, cfg.vocab_size, nprng)
            dtb -= tunnel_s
            extras["bf16_exact_qps"] = round(reps * batch / dtb, 1)
            print(f"# bf16 exact: compile {cb:.0f}s, steady "
                  f"{dtb/reps*1000:.1f} ms/batch", file=sys.stderr)
        except Exception as e:
            errors["bf16_exact"] = repr(e)[:200]
        finally:
            del s_bf, bf16_index
            gc.collect()

    index = _make_index(n_pad, n_docs, d, dtype, factor,
                        rot=rot if run_pca else None)

    searcher = build_searcher(index, beam, beam, beam, buckets, tile_fracs)
    dt, compile_s, _, _, _ = _timed_search(searcher, params, beam, batch, reps,
                                     q_width, cfg.vocab_size, nprng)
    dt -= tunnel_s
    plain_qps = reps * batch / dt
    print(f"# plain {dtype}: compile {compile_s:.0f}s, steady "
          f"{dt/reps*1000:.1f} ms/batch, tunnel {tunnel_s*1000:.1f} ms",
          file=sys.stderr)

    # --- PCA tier: measured certified fraction decides the headline
    headline_qps, headline_cfg, pca_ok = plain_qps, "plain", False
    _stash_headline(headline_qps, headline_cfg)
    if run_pca and index.pca_proj is not None and _stage_ok("pca", extras):
        s_pca = None
        try:
            s_pca = build_searcher(index, beam, beam, beam, buckets,
                                   tile_fracs, use_pca=True)
            dtp, cp, cert, _, _ = _timed_search(s_pca, params, beam, batch,
                                             reps,
                                          q_width, cfg.vocab_size, nprng)
            dtp -= tunnel_s
            pca_qps = reps * batch / dtp
            extras["pca_qps"] = round(pca_qps, 1)
            extras["pca_cert2_frac"] = (None if cert is None
                                        else round(cert, 4))
            print(f"# pca auto: compile {cp:.0f}s, steady "
                  f"{dtp/reps*1000:.1f} ms/batch, cert2 {cert}",
                  file=sys.stderr)
            pca_ok = (cert is not None and cert >= PCA_CERT_HEADLINE_MIN)
            if pca_ok and pca_qps > plain_qps:
                headline_qps, headline_cfg = pca_qps, "pca_auto"
                extras["plain_qps"] = round(plain_qps, 1)
                _stash_headline(headline_qps, headline_cfg)
        except Exception as e:
            errors["pca"] = repr(e)[:200]
        finally:
            del s_pca
            gc.collect()

    if run_beam4 and _stage_ok("beam4", extras):
        s4 = None
        try:
            # sweep (scripts_dev/beam4_sweep.py): batch 192 + 6-tile split
            # 920.1 q/s vs 846.8 at the old batch-96 5-tile default.
            # MDRT_BENCH_B4_PRUNE (default "auto") additionally measures
            # adaptive candidate pruning: "auto" derives margins from the
            # unpruned timed run's own hop-1 gap distribution (no extra
            # probe compile) at BOTH measured operating points of the
            # 65k-doc quality sweep (docs/prune_sweep_r5.json) —
            # beam4_pruned_qps at the MEDIAN gap (max throughput, 37.5%
            # of rows pruned; chain agreement 0.77 under that sweep's
            # heavy crowding) and beam4_pruned_p90_qps at the p90 gap
            # (that sweep's quality-neutral point: P-EM/PR bit-equal,
            # agreement 0.98, ~7.5% pruned).  A float pins one margin;
            # "0" skips the pruned measurements.  beam4_qps stays the
            # UNpruned figure, comparable across rounds.
            b4_batch = _env("MDRT_BENCH_B4BATCH", min(batch, 192))
            b4_prune = os.environ.get("MDRT_BENCH_B4_PRUNE", "auto")
            s4 = build_searcher(index, 4, 4, 4, b4_buckets, b4_fracs,
                                use_pca=pca_ok)
            dt4, c4, _, h1, _ = _timed_search(s4, params, 4, b4_batch, reps,
                                           q_width, cfg.vocab_size, nprng)
            dt4 -= tunnel_s
            extras["beam4_qps"] = round(reps * b4_batch / dt4, 1)
            print(f"# beam4: compile {c4:.0f}s, steady {dt4/reps*1000:.1f} "
                  f"ms/batch (batch={b4_batch})", file=sys.stderr)
            if b4_prune == "auto":
                gaps = (h1.max(-1, keepdims=True) - h1).reshape(-1)
                pos = gaps[gaps > 0]
                variants = [("", float(np.median(pos)), "median"),
                            ("_p90", float(np.percentile(pos, 90)), "p90")]
                print(f"# beam4 prune margins auto = "
                      f"{variants[0][1]:.4f} (median) / "
                      f"{variants[1][1]:.4f} (p90 hop-1 gap)",
                      file=sys.stderr)
            else:
                variants = [("", float(b4_prune), "pinned")]
            for suffix, b4_margin, label in variants:
                if b4_margin <= 0:
                    continue
                if not _stage_ok(f"beam4_pruned{suffix}", extras):
                    break
                del s4
                s4 = None
                gc.collect()
                s4 = build_searcher(index, 4, 4, 4, b4_buckets, b4_fracs,
                                    use_pca=pca_ok, prune_margin=b4_margin)
                dt4p, c4p, _, _, _ = _timed_search(s4, params, 4, b4_batch,
                                                reps, q_width,
                                                cfg.vocab_size, nprng)
                dt4p -= tunnel_s
                extras[f"beam4_pruned{suffix}_qps"] = round(
                    reps * b4_batch / dt4p, 1)
                extras[f"beam4_prune{suffix}_margin"] = round(b4_margin, 4)
                print(f"# beam4 pruned {label}: compile {c4p:.0f}s, steady "
                      f"{dt4p/reps*1000:.1f} ms/batch (margin={b4_margin})",
                      file=sys.stderr)
        except Exception as e:
            errors["beam4"] = repr(e)[:200]
        finally:
            del s4
            gc.collect()

    if run_latency and _stage_ok("latency", extras):
        s_lat = None
        try:
            # serving latency: the headline engine config at a low-occupancy
            # batch — what a latency-SLO deployment of cli/serve.py pays per
            # micro-batch (throughput batches above amortize fixed costs a
            # latency-bound deployment cannot).  More reps: at this batch the
            # per-batch time is small relative to the tunnel correction.
            lat_batch = _env("MDRT_BENCH_LAT_BATCH", 8)
            lat_reps = max(reps, 32)
            s_lat = build_searcher(index, beam, beam, beam, buckets,
                                   tile_fracs, use_pca=pca_ok)
            dtl, cl, _, _, _ = _timed_search(s_lat, params, beam, lat_batch,
                                       lat_reps, q_width, cfg.vocab_size,
                                       nprng)
            dtl -= tunnel_s
            extras[f"latency_b{lat_batch}_ms"] = round(
                dtl / lat_reps * 1000, 2)
            print(f"# latency: compile {cl:.0f}s, {dtl/lat_reps*1000:.2f} "
                  f"ms/batch of {lat_batch}", file=sys.stderr)
        except Exception as e:
            errors["latency"] = repr(e)[:200]
        finally:
            del s_lat
            gc.collect()

    if run_e2e and _stage_ok("end2end", extras):
        s5 = None
        try:
            # buckets off: 40 hop-2 rows would make 8-row tiles, and
            # per-tile fixed costs beat token savings at that size (PERF.md)
            e2e_topk = _env("MDRT_BENCH_E2E_TOPK", 25)
            s5 = build_searcher(index, 5, 5, e2e_topk, (), (),
                                use_pca=pca_ok)
            # rank width 128 (was 192): the r5 fidelity matrix
            # (docs/fidelity_r5.json — 280 questions, evidence planted at
            # token offsets 64..448) shows every width down to 96 keeps
            # two-stage answers in 1.0 agreement with the full read; 128
            # keeps one bucket of margin over the narrowest validated width
            extras.update(_end2end_bench(
                s5, params, cfg, tunnel_s, nprng,
                rank_width=_env("MDRT_BENCH_RANK_WIDTH", 128)))
        except Exception as e:
            errors["end2end"] = repr(e)[:200]
        finally:
            del s5
            gc.collect()

    if run_unified and _stage_ok("unified", extras):
        s_u = None
        try:
            # Variable-hop (UnifiedRetriever) serving at the beam-4 config
            # (round-4 VERDICT #5): measures what the stop-skip cascade
            # (SearchConfig.stop_skip_threshold) saves when questions stop
            # after hop 1.  The reference trained this head but never
            # served it (unified_retriever.py:23).  Thresholds are placed
            # at quantiles of the engine's OWN top-1 stop probabilities so
            # the measured stop rates are controlled (~0/30/60%) regardless
            # of where the head's output distribution sits.
            from multihop_dense_retrieval_tpu.models import UnifiedRetriever

            u_batch = _env("MDRT_BENCH_UNIFIED_BATCH", min(batch, 192))
            u_model = UnifiedRetriever(cfg)
            u_params = u_model.init(
                jax.random.PRNGKey(21), jnp.ones((1, 8), jnp.int32),
                jnp.ones((1, 8), jnp.int32), method=u_model.encode_qsp)

            def build_u(thr, margin=0.0):
                scfg = SearchConfig(
                    beam_size_1=4, beam_size_2=4, topk=4,
                    max_q_len=q_width, max_q_sp_len=max_q_sp_len,
                    chunk_rows=chunk, use_pallas=True,
                    hop2_buckets=b4_buckets, hop2_tile_fracs=b4_fracs,
                    use_pca=pca_ok, stop_skip_threshold=thr,
                    hop2_prune_margin=margin)
                return BeamSearcher(
                    encode_fn=lambda p, ids, mask, tt=None: u_model.apply(
                        p, ids, mask, tt, method=u_model.encode_seq),
                    encode_qsp_fn=lambda p, ids, mask, tt=None: u_model.apply(
                        p, ids, mask, tt, method=u_model.encode_qsp),
                    params=u_params, index=index, text_ids=text_ids,
                    text_lens=text_lens, empty=empty, spec=spec,
                    config=scfg, mesh=None)

            s_u = build_u(0.0)
            dtu, cu, _, h1u, stopu = _timed_search(
                s_u, u_params, 4, u_batch, reps, q_width, cfg.vocab_size,
                nprng)
            dtu -= tunnel_s
            extras["unified_qps_stop0"] = round(reps * u_batch / dtu, 1)
            print(f"# unified stop0: compile {cu:.0f}s, steady "
                  f"{dtu/reps*1000:.1f} ms/batch (batch={u_batch})",
                  file=sys.stderr)
            # top-1 stop probabilities decide stopping — threshold at the
            # (1 - rate) quantile yields the target stop rate
            top_slot = h1u.argmax(-1)
            p_top = np.take_along_axis(stopu, top_slot[..., None],
                                       axis=-1).reshape(-1)
            for rate in (30, 60):
                thr = float(np.quantile(p_top, 1 - rate / 100))
                del s_u
                s_u = None
                gc.collect()
                s_u = build_u(thr)
                dts, cs, _, _, _ = _timed_search(
                    s_u, u_params, 4, u_batch, reps, q_width,
                    cfg.vocab_size, nprng)
                dts -= tunnel_s
                eff = float((p_top >= thr).mean())
                extras[f"unified_qps_stop{rate}"] = round(
                    reps * u_batch / dts, 1)
                extras[f"unified_stop{rate}_rate"] = round(eff, 3)
                print(f"# unified stop{rate}: compile {cs:.0f}s, steady "
                      f"{dts/reps*1000:.1f} ms/batch (thr={thr:.4f}, "
                      f"measured rate {eff:.2f})", file=sys.stderr)
                if rate == 60 and _env("MDRT_BENCH_UNIFIED_PRUNED", 1) \
                        and _stage_ok("unified_pruned", extras):
                    # the cascade composes with margin pruning (beam.py
                    # `act_nt &= active`, semantics pinned by
                    # test_stop_skip_composes_with_prune_margin): unstopped
                    # questions' non-top candidates additionally prune at
                    # the in-jit auto p90 gap quantile — the 65k-sweep
                    # quality-neutral margin (docs/prune_sweep_r5.json)
                    del s_u
                    s_u = None
                    gc.collect()
                    s_u = build_u(thr, margin=-0.9)
                    dtp, cp, _, _, _ = _timed_search(
                        s_u, u_params, 4, u_batch, reps, q_width,
                        cfg.vocab_size, nprng)
                    dtp -= tunnel_s
                    extras["unified_qps_stop60_pruned_p90"] = round(
                        reps * u_batch / dtp, 1)
                    print(f"# unified stop60+prune(p90): compile {cp:.0f}s,"
                          f" steady {dtp/reps*1000:.1f} ms/batch",
                          file=sys.stderr)
        except Exception as e:
            errors["unified"] = repr(e)[:200]
        finally:
            del s_u
            gc.collect()

    run_train = run_train and _stage_ok("train", extras)
    run_qa_train = run_qa_train and _stage_ok("qa_train", extras)
    if run_train or run_qa_train:
        # the train stages need the HBM the serving state occupies
        # (B=16 fwd+bwd + Adam ≈ 8 GB next to the 7.5 GB int8 index
        # OOMs — measured, and the debris then broke the reader stage
        # too).  Nothing after e2e touches the index, so drop every
        # serving-side device array first.
        del searcher, index, text_ids, text_lens, empty, params
        jax.clear_caches()
        gc.collect()
    if run_train:
        try:
            extras.update(_train_bench(tunnel_s))
        except Exception as e:
            errors["train"] = repr(e)[:200]
        finally:
            jax.clear_caches()   # drop the fwd+bwd program + Adam state
            gc.collect()

    if run_qa_train and (not run_train or _stage_ok("qa_train", extras)):
        try:
            extras.update(_qa_train_bench(tunnel_s))
        except Exception as e:
            errors["qa_train"] = repr(e)[:200]
        finally:
            jax.clear_caches()   # drop the 334M-param train state
            gc.collect()

    if run_reader and _stage_ok("reader", extras):
        try:
            extras.update(_reader_bench(tunnel_s))
        except Exception as e:
            errors["reader"] = repr(e)[:200]

    if run_hnsw and _stage_ok("hnsw", extras):
        try:
            extras.update(_hnsw_bench())
        except Exception as e:
            errors["hnsw"] = repr(e)[:200]

    if errors:
        extras["extra_errors"] = errors
    print(json.dumps({
        "metric": "2hop_beam_search_queries_per_sec",
        "value": round(headline_qps, 1),
        "unit": f"questions/s (beam={beam}, {n_docs} docs x {d} {dtype}, "
                f"{layers}-layer encoder, batch={batch}, 1 TPU chip, "
                f"engine={headline_cfg})",
        "vs_baseline": round(headline_qps / BASELINE_QPS, 2),
        "baseline_qps_range": list(BASELINE_RANGE),
        "tunnel_correction_ms": round(tunnel_s * 1000, 1),
        "timed_reps": _env("MDRT_BENCH_TIMED_REPS", 3),
        "hop2_buckets": list(buckets),
        **extras,
    }))


if __name__ == "__main__":
    main()
