"""Trained-weights fidelity validation for the speed knobs.

Round-4 hardening (VERDICT r4 item 6): the r4 harness used 32 questions
whose baseline chain-EM was 1.0 and could only BRACKET the rank-width
boundary ("128 fails, 160 passes on this task").  This version:

  * >=256 held-out questions (FIDELITY_NQ_EVAL per offset group);
  * the DISCRIMINATIVE evidence (key + answer sentence) is planted at a
    controlled token offset per group, swept across {64..448}, so the
    failure boundary of a truncating rank pass is LOCATED: a rank width w
    can only rank chains whose evidence it can see, so agreement should
    collapse for offset > w and hold for offset < w;
  * near-miss negatives (key present in one passage, no answer) make the
    task hard enough that baseline chain-EM < 1.0 — the harness has
    discriminative power;
  * passage titles are role-UNINFORMATIVE random ids, disjoint between
    train and eval.  The first r5 run coded the role into the title
    (gold G{i}a / near-miss H{i}a / negative N{i}.{j}a) and reused the
    same i range for train and eval, so with the whole-word
    HashTokenizer the rank head could classify on the title token at
    ~position 14 — inside EVERY rank window — and the matrix read 1.0
    agreement at every (width, offset), including widths that could not
    see the evidence.  That leak invalidated the first width-128
    promotion; with neutral titles the matrix measures what it claims;
  * the LENGTH-BUCKETED rank pass (rank_width=None, never truncates —
    eval/qa_eval.py::rank_filter) is validated against the same matrix:
    by construction it must track the full read at EVERY offset.

Measures, with trained weights:
  * per-(rank_width, offset) answer agreement + chain-EM of the two-stage
    read (rank_topm=5) vs the one-stage full read;
  * answer agreement of bf16 attention scores vs fp32.

    python scripts_dev/fidelity_trained.py            # CPU, ~30 min

Writes /tmp/fidelity_result.json; PERF.md records the outcome and the
defaults ship accordingly.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("FIDELITY_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

WORDS = [f"w{i}" for i in range(800)]
MAX_SEQ = 512
OFFSETS = tuple(int(x) for x in os.environ.get(
    "FIDELITY_OFFSETS", "64,128,192,256,320,384,448").split(","))


def _filler(rng, n):
    return list(rng.choice(WORDS, size=max(n, 0)))


def _chain(rng, titles, offset, key=None, ans=None):
    """Two passages whose combined token stream places the key+answer
    sentence at ~`offset` tokens into the assembled chain (question ~12
    tokens + specials consume the first ~16).  Passage one is pure filler
    sized so the evidence lands in passage two at the target offset; both
    passages carry trailing filler so chain LENGTH exceeds the evidence
    offset by a fixed margin (truncation at w < offset hides the evidence
    but never the whole chain)."""
    lead = max(offset - 16, 4)          # tokens before the evidence
    p1_len = lead // 2
    p2_lead = lead - p1_len
    sents1 = [" ".join(_filler(rng, p1_len)) + " ."]
    ev = []
    if key is not None:
        ev.append(key)
    if ans is not None:
        ev += ["valrec", ans]
    evidence_sent = " ".join(_filler(rng, 3) + ev + _filler(rng, 3)) + " ."
    sents2 = [" ".join(_filler(rng, p2_lead)) + " .",
              evidence_sent,
              " ".join(_filler(rng, 10)) + " ."]
    sp2 = [1] if (ans is not None or key is not None) else []
    return [
        {"title": titles[0], "sents": sents1, "sp_sent_ids": []},
        {"title": titles[1], "sents": sents2, "sp_sent_ids": sp2},
    ]


def make_qa_rows(rng, n_q, offset, qid_prefix="q", n_negs=8,
                 key_prefix=None, ans_shift=0):
    # 1 gold + 8 negatives = 9 chains: rank_topm=5 must actually FILTER
    # (keeping everything would make every width trivially agree)
    """Learnable QA rows: the question carries a key token; the gold
    chain plants `key valrec ans` at ~`offset` tokens; negatives carry
    other keys at the same offset, plus one NEAR-MISS negative carrying
    the question's key but NO answer (hard negative — keeps baseline
    chain-EM below 1.0).

    ``key_prefix`` decouples the key space from the qid space: eval rows
    REUSE the train key space (fresh answers via ``ans_shift``, fresh
    filler, fresh titles) so the rank head's key-match circuit is trained
    on the tokens it is evaluated on, while nothing else about an eval
    chain was ever seen — held-out questions with fresh keys would test
    token-id generalization the whole-word HashTokenizer makes impossible,
    and train-as-eval questions would let the head memorize gold filler
    prefixes (a window-visible shortcut, like the r5 title leak)."""
    rows = []
    title_seq = [0]
    key_prefix = key_prefix or qid_prefix

    def tt():
        # role-uninformative, train/eval-disjoint (qid_prefix), unique
        title_seq[0] += 1
        return f"ttl{qid_prefix}{title_seq[0]}.{rng.randint(0, 10**6)}"

    for i in range(n_q):
        key = f"key{key_prefix}{i}"
        ans = f"ans{(i + ans_shift) % 97}"
        gold = _chain(rng, (tt(), tt()), offset, key=key, ans=ans)
        negs = []
        # near-miss: right key, no valrec/answer
        negs.append(_chain(rng, (tt(), tt()), offset, key=key))
        for j in range(n_negs - 1):
            nk = f"key{key_prefix}{rng.randint(0, n_q)}x"
            negs.append(_chain(rng, (tt(), tt()), offset,
                               key=nk, ans=f"ans{rng.randint(0, 97)}"))
        rows.append({
            "_id": f"{qid_prefix}{offset}_{i}",
            "question": f"what is the value recorded for {key} ?",
            "answer": [ans], "type": "bridge",
            "sp": gold, "candidate_chains": [gold] + negs,
        })
    return rows


def write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def main():
    from multihop_dense_retrieval_tpu.cli import train_qa
    from multihop_dense_retrieval_tpu.core import checkpoint as ckpt
    from multihop_dense_retrieval_tpu.data import HashTokenizer
    from multihop_dense_retrieval_tpu.data.qa_dataset import QADataset
    from multihop_dense_retrieval_tpu.eval.qa_eval import predict
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train import qa as TQA

    work = tempfile.mkdtemp(prefix="mdrt_fidelity_")
    rng = np.random.RandomState(0)
    # training offsets cover the whole range so the reader learns to find
    # evidence anywhere, not just where the eval plants it
    n_train_per = int(os.environ.get("FIDELITY_NQ", 48))
    train_rows = []
    for off in OFFSETS:
        train_rows += make_qa_rows(rng, n_train_per, off, qid_prefix="t")
    rng.shuffle(train_rows)
    erng = np.random.RandomState(1)
    n_eval_per = int(os.environ.get("FIDELITY_NQ_EVAL", 40))
    assert n_eval_per <= n_train_per, (
        "eval keys reuse the train key space — need NQ_EVAL <= NQ")
    # eval: held-out questions over the TRAIN key space (key_prefix="t"),
    # shifted answers + fresh filler/titles — see make_qa_rows docstring
    eval_groups = {off: make_qa_rows(erng, n_eval_per, off, qid_prefix="e",
                                     key_prefix="t", ans_shift=13)
                   for off in OFFSETS}
    eval_rows = [r for rows in eval_groups.values() for r in rows]
    train_path = os.path.join(work, "train.jsonl")
    eval_path = os.path.join(work, "eval.jsonl")
    write_jsonl(train_path, train_rows)
    write_jsonl(eval_path, eval_rows)
    print(f"== {len(train_rows)} train / {len(eval_rows)} eval questions, "
          f"offsets {OFFSETS}", flush=True)

    print("== training reader (in-repo recipe)", flush=True)
    out_dir = os.path.join(work, "reader")
    train_qa.main([
        "--train-file", train_path, "--predict-file", eval_path,
        "--output-dir", out_dir, "--tokenizer", "hash",
        "--model-name", os.environ.get("FIDELITY_MODEL", "mini"),
        "--batch-size", "8",
        "--predict-batch-size", "8",
        "--num-epochs", os.environ.get("FIDELITY_EPOCHS", "6"),
        "--learning-rate", "2e-3", "--max-seq-len", str(MAX_SEQ),
        "--max-q-len", "16", "--num-answer-slots", "4", "--max-sents", "8",
        "--neg-num", "4", "--max-ans-len", "4", "--warmup-ratio", "0.0"])

    # match cli/train_qa's reader preset exactly (vocab 50265) so the
    # trained checkpoint restores into this model
    tok = HashTokenizer(vocab_size=50265, roberta_style=False)
    preset = train_qa.READER_PRESETS[os.environ.get("FIDELITY_MODEL", "mini")]
    cfg = preset()
    model = QAReader(cfg, sp_pred=True)
    params = ckpt.restore_pytree(os.path.join(out_dir, "checkpoint_best"))

    pred_step = TQA.make_qa_predict_step(model, max_ans_len=4)
    rank_step = TQA.make_qa_rank_step(model)

    def per_group(run_fn):
        """Run a predict variant per offset group; returns
        {offset: (chain_em, answers)}."""
        out = {}
        for off, rows in eval_groups.items():
            ds = QADataset(tok, rows, max_seq_len=MAX_SEQ, max_q_len=16,
                           num_answer_slots=4, max_sents=8, train=False)
            r = run_fn(ds)
            out[off] = (r["chain_em"], r["best"]["answers"],
                        r["best"]["em"])
        return out

    res = {"n_questions": len(eval_rows), "offsets": list(OFFSETS),
           "n_per_offset": n_eval_per}
    base = per_group(lambda ds: predict(pred_step, params, ds,
                                        batch_size=8))
    res["one_stage"] = {str(o): {"chain_em": c, "em": em}
                        for o, (c, a, em) in base.items()}
    mean_chain_em = float(np.mean([c for c, _, _ in base.values()]))
    mean_em = float(np.mean([em for _, _, em in base.values()]))
    print(f"== one-stage: chain_em {mean_chain_em:.3f}, em {mean_em:.3f}",
          flush=True)
    assert mean_em >= 0.5, (
        f"reader did not train (answer em={mean_em}) — fidelity "
        "comparisons against it would be meaningless")
    assert mean_chain_em < 1.0, (
        "baseline chain-EM saturated at 1.0 — the harness has no "
        "discriminative power (VERDICT r4 weak 3); harden the negatives")

    matrix = {}
    widths = [int(w) for w in os.environ.get(
        "FIDELITY_WIDTHS", "96,128,160,192,256").split(",")]
    for w in widths + [None]:
        tag = "bucketed" if w is None else f"w{w}"
        two = per_group(lambda ds, w=w: predict(
            pred_step, params, ds, batch_size=8, rank_step=rank_step,
            rank_topm=5, rank_width=w))
        row = {}
        for off in OFFSETS:
            b_ans, t_ans = base[off][1], two[off][1]
            agree = float(np.mean([t_ans[q] == b_ans[q] for q in b_ans]))
            row[str(off)] = {"agreement": round(agree, 4),
                             "chain_em": round(two[off][0], 4)}
        matrix[tag] = row
        mean_agree = float(np.mean(
            [row[str(o)]["agreement"] for o in OFFSETS]))
        print(f"== two-stage {tag}: "
              + " ".join(f"{o}:{row[str(o)]['agreement']:.2f}"
                         for o in OFFSETS)
              + f"  (mean {mean_agree:.3f})", flush=True)
    res["matrix"] = matrix

    # bf16 attention scores: same trained params, bf16-scores model
    cfg_bf = preset(attention_scores_dtype="bfloat16")
    model_bf = QAReader(cfg_bf, sp_pred=True)
    pred_bf = TQA.make_qa_predict_step(model_bf, max_ans_len=4)
    bf = per_group(lambda ds: predict(pred_bf, params, ds, batch_size=8))
    res["bf16_scores"] = {
        str(o): round(float(np.mean(
            [bf[o][1][q] == base[o][1][q] for q in base[o][1]])), 4)
        for o in OFFSETS}
    print(f"== bf16 scores agreement: {res['bf16_scores']}", flush=True)

    out = os.environ.get("FIDELITY_OUT", "/tmp/fidelity_result.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"RESULT {json.dumps(res)}")
    return res


if __name__ == "__main__":
    main()
