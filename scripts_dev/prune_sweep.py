"""Hop-2 candidate-pruning quality sweep on TRAINED retriever weights
(VERDICT r3 item 5; scaled to >=64k docs / >=512 questions per r4 item 3).

Trains a real (tiny-preset) retriever with the in-repo stage-1 recipe on
synthetic multi-hop data, encodes a corpus, then sweeps
SearchConfig.hop2_prune_margin at beam 4 measuring:

  * chain_agreement — fraction of questions whose entire top-k chain
    list is IDENTICAL to the unpruned engine's (the primary neutrality
    criterion: gold-free, so it stays sensitive at corpus scales where
    extreme-value crowding pins answer metrics near zero);
  * gold_hop1_expanded — gold doc in the hop-1 beam AND unpruned
    (pruning can only hurt quality through this quantity);
  * P-EM (both gold passages in the top-1 chain) and PR vs the unpruned
    engine — the answer-level curve, informative where the baseline
    retrieves;
  * the fraction of hop-2 rows pruned at each margin — the speed proxy
    (hop-2 encode is 75% of beam-4 time; savings track pruned rows that
    complete whole tiles).

Swept margins: quantiles of the measured gap distribution, plus the
shipped `--hop2-prune-margin auto` rule itself (the engine's in-jit
per-batch median gap, hop2_prune_margin=-1).

Scale design: question keys draw from a TRAINED pool (the first
PRUNE_KEYDOCS docs, all of whose keys appear in training questions) while
the remaining tens of thousands of docs are FILLER-ONLY distractors —
they crowd the hop-1 score landscape through extreme-value statistics
(the max of 64k in-distribution scores creeps toward the gold score —
the same mechanism that shrinks margins at the reference's 5.2M scale)
without asking a tiny retriever to generalize to token ids it never saw.

Three design constraints learned the hard way (r5):
  * Key tokens are rejection-sampled so every GOLD key hashes to a
    UNIQUE HashTokenizer id disjoint from the filler vocabulary.
    Without this, raw f"key{i}" strings collide in the ~50k-slot hash
    vocab, gold docs become indistinguishable, and baseline P-EM pins
    at 0.
  * Distractor docs carry NO key tokens — only filler words the model
    sees throughout training (every training negative is drawn from the
    same distribution, so 1.5k seen negatives represent all 64k
    distractors).  Keyed distractors with UNSEEN hash ids get
    random-init embedding rows whose scores swamp the trained signal:
    measured corpus-wide P-EM 0.006 / PR 0.088 at 65k docs despite
    train MRR1 0.96 — the sweep's quality deltas would be noise.
  * The default eval set IS the train set (PRUNE_NEVAL=0).  The sweep
    measures whether the margin rule CHANGES engine output relative to
    the unpruned engine — chain_agreement sees that on every question;
    P-EM deltas additionally need questions the retriever answers
    correctly.  Even a well-trained retriever (train MRR1 0.97) loses
    corpus-wide top-1 to crowding beyond ~4k in-distribution
    distractors (4096 docs: P-EM 0.11, PR 0.54, double-planted keys) —
    that crowding is exactly the margin landscape the sweep wants, so
    the agreement metrics, not the baseline's absolute P-EM, carry the
    decision at scale.  Generalization to unseen pairs is a different
    question (the fidelity harness owns it).

    PRUNE_NDOCS=65536 python scripts_dev/prune_sweep.py   # CPU, ~30 min
    PRUNE_NDOCS=256 PRUNE_NEVAL=128 ...                   # smoke

On-chip throughput at the chosen margin is measured separately by
MDRT_BENCH_B4_PRUNE (bench.py).  Writes /tmp/prune_sweep_result.json.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("PRUNE_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

WORDS = [f"w{i}" for i in range(800)]


def _text(rng, key=None, lo=15, hi=40):
    words = list(rng.choice(WORDS, size=rng.randint(lo, hi)))
    if key is not None:
        # plant the key twice: with 64k in-distribution filler docs the
        # extreme-value max of filler scores edges past a single-mention
        # gold (measured: gold ranks ~100/4096 at train MRR1 0.83 — the
        # crowding is the POINT, but the sweep needs a baseline the
        # retriever answers correctly, so the planted signal must clear
        # the crowd)
        words[rng.randint(0, 4)] = key
        words[len(words) // 2] = key
    return " ".join(words)


def gen_keys(n_key):
    """Collision-aware gold-pool doc keys for the hash tokenizer: every
    key hashes to a UNIQUE id disjoint from the filler WORDS.  See
    module docstring."""
    from multihop_dense_retrieval_tpu.data.tokenization import HashTokenizer
    tok = HashTokenizer()
    taken = {tok._hash_id(w) for w in WORDS}
    keys, gold_ids, i = [], set(), 0
    while len(keys) < n_key:
        w = f"key{i}"
        i += 1
        h = tok._hash_id(w)
        if h in taken or h in gold_ids:
            continue
        gold_ids.add(h)
        keys.append(w)
    return keys


def make_data(work, rng, n_docs=256, n_train=128, n_eval=0, n_key_docs=0):
    """Multi-hop rows whose gold passages carry the question's key tokens
    (retrievable signal), over a corpus of keyed distractors.  Keys are
    UNIQUE per doc — shared keys make gold pairs ambiguous and pin P-EM
    at zero regardless of retriever quality.

    When ``n_key_docs`` < n_docs, question keys (train AND eval) draw only
    from the first n_key_docs docs; the rest of the corpus is filler-only
    distractors that crowd the score landscape (see module docstring).
    ``n_eval`` > 0 writes a SEPARATE eval set whose key PAIRS are disjoint
    from training pairs (same key pool)."""
    n_key_docs = n_key_docs or n_docs
    keys = gen_keys(n_key_docs)
    docs = []
    for i in range(n_docs):
        docs.append({"title": f"D{i}",
                     "text": _text(rng,
                                   key=keys[i] if i < n_key_docs else None)})

    # DISJOINT pairs: each key doc appears in at most ONE question and one
    # hop role.  Reusing a key across questions with different roles makes
    # the task order-learning instead of memorization — measured p_em 0.02
    # vs 0.60 for the tiny retriever — and the sweep needs a baseline the
    # retriever answers correctly (module docstring).
    perm = list(rng.permutation(n_key_docs))

    def make_rows(n_rows, qid_prefix, seen_pairs):
        rows = []
        while len(rows) < n_rows:
            if len(perm) < 2:
                raise SystemExit("need n_key_docs >= 2*(n_train+n_eval) "
                                 "for disjoint question pairs")
            a, b = int(perm.pop()), int(perm.pop())
            seen_pairs.add((a, b))
            i = len(rows)
            k1, k2 = keys[a], keys[b]
            negs = [dict(docs[j])
                    for j in rng.choice(n_docs, 4, replace=False)
                    if j not in (a, b)][:3]
            rows.append({
                "_id": f"{qid_prefix}{i}",
                "question": f"which fact links {k1} with {k2} ?",
                "type": "bridge" if i % 2 == 0 else "comparison",
                "pos_paras": [dict(docs[a]), dict(docs[b])],
                "neg_paras": negs or [dict(docs[(a + 1) % n_docs])],
                "bridge": docs[b]["title"],
                "sp": [docs[a]["title"], docs[b]["title"]],
                "answer": ["yes"],
            })
        return rows

    seen = set()
    rows = make_rows(n_train, "q", seen)
    eval_rows = make_rows(n_eval, "e", seen) if n_eval else rows
    paths = {}
    for name, data in [("corpus", docs), ("mhop", rows),
                       ("eval", eval_rows)]:
        paths[name] = os.path.join(work, f"{name}.jsonl")
        with open(paths[name], "w") as f:
            for r in data:
                f.write(json.dumps(r) + "\n")
    return paths, docs, eval_rows


def main():
    # PRUNE_REUSE=<workdir>: rerun ONLY the sweep against a previous
    # run's trained checkpoint + index (data generation is deterministic
    # from seed 0, so the regenerated questions/gold match the artifacts
    # as long as the PRUNE_* shape env vars match the original run)
    reuse = os.environ.get("PRUNE_REUSE")
    work = reuse or tempfile.mkdtemp(prefix="mdrt_prune_")
    rng = np.random.RandomState(0)
    n_docs = int(os.environ.get("PRUNE_NDOCS", 65536))
    n_train = int(os.environ.get("PRUNE_NTRAIN", 512))
    n_eval = int(os.environ.get("PRUNE_NEVAL", 0))
    n_key = int(os.environ.get("PRUNE_KEYDOCS", 0)) or min(1024, n_docs)
    chunk = min(4096, n_docs)
    paths, docs, rows = make_data(work, rng, n_docs=n_docs, n_train=n_train,
                                  n_eval=n_eval, n_key_docs=n_key)

    stage1 = os.path.join(work, "stage1")
    index_dir = os.path.join(work, "index")
    if reuse:
        assert os.path.exists(os.path.join(stage1, "checkpoint_best")), \
            f"PRUNE_REUSE={reuse} has no trained checkpoint"
        assert os.path.isdir(index_dir), \
            f"PRUNE_REUSE={reuse} has no encoded index"
        print(f"== reusing trained artifacts in {work}", flush=True)
    else:
        _train_and_encode(work, paths, stage1, index_dir, n_docs)

    sweep_args = (work, paths, docs, rows, stage1, index_dir, chunk,
                  n_docs, n_key, n_train)
    return _sweep(*sweep_args)


def _train_and_encode(work, paths, stage1, index_dir, n_docs):
    from multihop_dense_retrieval_tpu.cli import (encode_corpus,
                                                  train_retriever)

    chunk = min(4096, n_docs)
    print("== stage-1 retriever training", flush=True)
    train_retriever.main([
        "--train-file", paths["mhop"], "--predict-file", paths["eval"],
        "--output-dir", stage1, "--train-batch-size", "8",
        "--predict-batch-size", "8",
        "--num-epochs", os.environ.get("PRUNE_EPOCHS", "8"),
        "--learning-rate", "1e-3", "--tokenizer", "hash",
        "--model-name", os.environ.get("PRUNE_MODEL", "mini"),
        "--max-q-len", "24", "--max-q-sp-len", "80",
        "--max-c-len", "64"])
    ckpt = os.path.join(stage1, "checkpoint_best")

    print("== corpus encode", flush=True)
    index_dir = os.path.join(work, "index")
    model_name = os.environ.get("PRUNE_MODEL", "mini")
    encode_corpus.main([paths["corpus"], index_dir, "--checkpoint", ckpt,
                        "--tokenizer", "hash", "--model-name", model_name,
                        "--batch-size", "64", "--chunk-rows", str(chunk),
                        "--max-c-len", "64"])


def _sweep(work, paths, docs, rows, stage1, index_dir, chunk,
           n_docs, n_key, n_train):
    from multihop_dense_retrieval_tpu.cli.common import (resolve_tokenizer,
                                                         init_retriever,
                                                         resolve_encoder_config)
    from multihop_dense_retrieval_tpu.cli.eval_mhop_retrieval import (
        load_searcher)
    from multihop_dense_retrieval_tpu.core.config import SearchConfig
    from multihop_dense_retrieval_tpu.ops.mips import NEG_INF

    ckpt = os.path.join(stage1, "checkpoint_best")
    model_name = os.environ.get("PRUNE_MODEL", "mini")
    tok = resolve_tokenizer("hash")
    enc_cfg = resolve_encoder_config(model_name)
    model, params = init_retriever(enc_cfg, checkpoint=ckpt)

    beam, topk = 4, 4
    gold = {r["_id"]: set(r["sp"]) for r in rows}
    questions = [r["question"][:-1] if r["question"].endswith("?")
                 else r["question"] for r in rows]
    bsz = 16

    def run(margin, base=None):
        """Sweep one margin.  Quality metrics, most to least direct:

        * chain_agreement — fraction of questions whose ENTIRE top-k
          chain list (hop-1 id, hop-2 id, score order) is identical to
          the margin-off engine's.  Gold-free, so it stays sensitive at
          corpus scales where extreme-value crowding of a synthetic-task
          retriever pins answer-level metrics near zero (4096 docs:
          baseline P-EM 0.11 despite train MRR1 0.97 — ~2% of 64k
          in-distribution filler scores edge past the trained gold
          margin, which is the realistic crowding the sweep EXISTS to
          model).
        * gold_hop1_expanded — fraction of questions where a gold doc
          sits in the hop-1 beam AND survives pruning (pruning can only
          hurt quality through this quantity).
        * p_em / pr — answer-level, vs the low crowded baseline.
        """
        cfg = SearchConfig(beam_size_1=beam, beam_size_2=beam, topk=topk,
                           max_q_len=24, max_q_sp_len=80, chunk_rows=chunk,
                           hop2_buckets=(32, 48, 64, 80),
                           hop2_tile_fracs=(0.25, 0.375, 0.25, 0.125),
                           hop2_prune_margin=margin)
        searcher = load_searcher(index_dir, tok, model, params, cfg)
        pem = pr = agree = gold_exp = 0
        pruned = total = 0
        chains = []
        for s in range(0, len(rows), bsz):
            qs = questions[s:s + bsz]
            pad = bsz - len(qs)
            qs_p = qs + [qs[-1]] * pad
            q_inputs = tok.encode_batch_one(qs_p, 24)
            raw = [tok.raw_ids_padded(q, 76) for q in qs_p]
            out = searcher.search(q_inputs, np.stack([r[0] for r in raw]),
                                  np.array([r[1] for r in raw]))
            d1 = out["hop1_cand_scores"][:len(qs)]
            if margin != 0:
                if margin > 0:
                    m_eff = margin
                else:
                    # host replica of the in-jit AUTO rule (search/beam.py):
                    # the q-quantile of the batch's positive hop-1 gaps
                    qf = min(-margin, 1.0)
                    g_all = np.sort(
                        (out["hop1_cand_scores"].max(1, keepdims=True)
                         - out["hop1_cand_scores"]).reshape(-1))
                    m_eff = g_all[bsz + int((g_all.size - bsz - 1) * qf)]
                act = d1 >= d1.max(1, keepdims=True) - m_eff
                pruned += int((~act).sum())
                total += act.size
            else:
                act = np.ones_like(d1, bool)
                total += d1.size
            for i, q in enumerate(qs):
                r = rows[s + i]
                titles = {docs[int(out["hop1_ids"][i][0])]["title"],
                          docs[int(out["hop2_ids"][i][0])]["title"]}
                g = gold[r["_id"]]
                pem += titles == g
                any_hit = False
                for h1, h2, sc in zip(out["hop1_ids"][i], out["hop2_ids"][i],
                                      out["path_scores"][i]):
                    if sc <= NEG_INF / 2:
                        continue
                    if ({docs[int(h1)]["title"], docs[int(h2)]["title"]}
                            & g):
                        any_hit = True
                pr += any_hit
                cand_titles = [docs[int(c)]["title"]
                               for c in out["hop1_cand_ids"][i]]
                gold_exp += any(t in g and a
                                for t, a in zip(cand_titles, act[i]))
                chain = tuple(
                    (int(h1), int(h2))
                    for h1, h2, sc in zip(out["hop1_ids"][i],
                                          out["hop2_ids"][i],
                                          out["path_scores"][i])
                    if sc > NEG_INF / 2)
                chains.append(chain)
                if base is not None:
                    agree += chain == base["chains"][s + i]
        n = len(rows)
        r = {"p_em": round(pem / n, 4), "pr": round(pr / n, 4),
             "gold_hop1_expanded": round(gold_exp / n, 4),
             "pruned_frac": round(pruned / max(total, 1), 4),
             "chains": chains}
        if base is not None:
            r["chain_agreement"] = round(agree / n, 4)
        return r

    def pub(r):
        return {k: v for k, v in r.items() if k != "chains"}

    res = {"beam": beam, "n_questions": len(rows), "n_docs": n_docs,
           "n_key_docs": n_key, "n_train": n_train}
    base = run(0.0)
    res["margin_0_off"] = pub(base)
    print(f"== margin off: {pub(base)}", flush=True)
    if base["p_em"] < 0.5:
        print(f"NOTE: crowded baseline (p_em={base['p_em']}) — "
              "chain_agreement and gold_hop1_expanded carry the "
              "neutrality decision at this scale", flush=True)

    # data-driven margins: quantiles of the per-question (top1 - score)
    # gap distribution, measured on the trained engine, so the sweep
    # brackets prune rates from aggressive to conservative
    cfg0 = SearchConfig(beam_size_1=beam, beam_size_2=beam, topk=topk,
                        max_q_len=24, max_q_sp_len=80, chunk_rows=chunk)
    s0 = load_searcher(index_dir, tok, model, params, cfg0)
    gaps = []
    for st in range(0, len(rows), bsz):
        qs = questions[st:st + bsz]
        qs_p = qs + [qs[-1]] * (bsz - len(qs))
        q_inputs = tok.encode_batch_one(qs_p, 24)
        raw = [tok.raw_ids_padded(q, 76) for q in qs_p]
        out = s0.search(q_inputs, np.stack([r[0] for r in raw]),
                        np.array([r[1] for r in raw]))
        d1 = out["hop1_cand_scores"][:len(qs)]
        gaps.append((d1.max(1, keepdims=True) - d1).reshape(-1))
    gaps = np.concatenate(gaps)
    gaps = gaps[gaps > 0]
    for q_pct in (25, 50, 75, 90):
        margin = float(np.percentile(gaps, q_pct))
        r = pub(run(margin, base=base))
        res[f"margin_p{q_pct}_{margin:.3f}"] = r
        print(f"== margin p{q_pct} ({margin:.3f}): {r}", flush=True)

    # the shipped AUTO rule itself (hop2_prune_margin = -q): the engine
    # derives a per-batch q-quantile gap margin inside the jit — exactly
    # what `--hop2-prune-margin auto[:Q]` serves (auto = median q=0.5;
    # auto:0.9 = the measured-safe p90)
    for q in (0.5, 0.9):
        r = pub(run(-q, base=base))
        res[f"margin_auto_injit_q{q}"] = r
        print(f"== margin auto:{q} (in-jit per-batch quantile): {r}",
              flush=True)

    out = os.environ.get("PRUNE_OUT", "/tmp/prune_sweep_result.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"RESULT {json.dumps(res)}")
    return res


if __name__ == "__main__":
    main()
