"""Trained-weights fidelity validation for the speed knobs (VERDICT r3 #2).

The two e2e accelerators shipped opt-in because random-init logits cannot
validate ranking fidelity:
  * two-stage read at --rank-width 128 (39.8 vs 27.3 q/s measured on chip);
  * --reader-bf16-scores (+11% at W=512).

This script trains a REAL (small) reader on synthetic-but-learnable QA data
with the in-repo recipe (cli/train_qa), then measures, with the trained
weights:
  * chain-EM and answer agreement of the two-stage read (rank_topm=5) at
    rank_width ∈ {96, 128, 160, 192} vs the one-stage full read;
  * answer agreement of bf16 attention scores vs fp32.

    python scripts_dev/fidelity_trained.py            # CPU, ~10 min

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
MAX_SEQ = 256


def _sent(rng, key=None, ans=None, lo=12, hi=22):
    words = list(rng.choice(WORDS, size=rng.randint(lo, hi)))
    if key is not None:
        words[rng.randint(0, 3)] = key           # early evidence token
    if ans is not None:
        # fixed marker before the answer: the span head learns "the token
        # after `valrec`", a learnable-at-tiny-scale extraction pattern
        pos = rng.randint(len(words) // 2, len(words))
        words[pos:pos] = ["valrec", ans]
    return " ".join(words) + " ."


def _passage(rng, title, key=None, ans=None, n_sents=3):
    sents = [_sent(rng, key if s == 0 else None,
                   ans if s == n_sents - 1 else None)
             for s in range(n_sents)]
    sp_ids = [n_sents - 1] if ans is not None else ([0] if key else [])
    return {"title": title, "sents": sents, "sp_sent_ids": sp_ids}


def make_qa_rows(rng, n_q, n_negs=7):
    """Learnable QA rows: question carries a key token; the gold chain's
    passages carry the same key (hop evidence) and plant the answer token;
    negative chains carry other keys.  Chains run ~200-240 tokens so
    rank_width=128 genuinely truncates (the knob under test)."""
    rows = []
    for i in range(n_q):
        key, ans = f"key{i}", f"ans{i % 97}"
        gold = [_passage(rng, f"G{i}a", key=key),
                _passage(rng, f"G{i}b", key=key, ans=ans)]
        negs = []
        for j in range(n_negs):
            nk = f"key{rng.randint(0, n_q)}x"
            negs.append([_passage(rng, f"N{i}.{j}a", key=nk),
                         _passage(rng, f"N{i}.{j}b", key=nk)])
        rows.append({
            "_id": f"q{i}",
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
    from multihop_dense_retrieval_tpu.core.config import EncoderConfig
    from multihop_dense_retrieval_tpu.data import HashTokenizer
    from multihop_dense_retrieval_tpu.data.qa_dataset import QADataset
    from multihop_dense_retrieval_tpu.eval.qa_eval import predict
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train import qa as TQA

    work = tempfile.mkdtemp(prefix="mdrt_fidelity_")
    rng = np.random.RandomState(0)
    train_rows = make_qa_rows(rng, int(os.environ.get("FIDELITY_NQ", 192)))
    eval_rows = make_qa_rows(np.random.RandomState(1), 32)
    train_path = os.path.join(work, "train.jsonl")
    eval_path = os.path.join(work, "eval.jsonl")
    write_jsonl(train_path, train_rows)
    write_jsonl(eval_path, eval_rows)

    print("== training reader (in-repo recipe)", flush=True)
    out_dir = os.path.join(work, "reader")
    train_qa.main([
        "--train-file", train_path, "--predict-file", eval_path,
        "--output-dir", out_dir, "--tokenizer", "hash",
        "--model-name", "tiny", "--batch-size", "8",
        "--predict-batch-size", "8",
        "--num-epochs", os.environ.get("FIDELITY_EPOCHS", "10"),
        "--learning-rate", "2e-3", "--max-seq-len", str(MAX_SEQ),
        "--max-q-len", "16", "--num-answer-slots", "4", "--max-sents", "8",
        "--neg-num", "4", "--max-ans-len", "4", "--warmup-ratio", "0.0"])

    # match cli/train_qa's "tiny" reader preset exactly (vocab 50265) so
    # the trained checkpoint restores into this model
    tok = HashTokenizer(vocab_size=50265, roberta_style=False)
    cfg = EncoderConfig.tiny(vocab_size=50265, max_position_embeddings=514,
                             type_vocab_size=2, pad_token_id=0,
                             roberta_positions=False)
    model = QAReader(cfg, sp_pred=True)
    params = ckpt.restore_pytree(os.path.join(out_dir, "checkpoint_best"))

    ds = QADataset(tok, eval_rows, max_seq_len=MAX_SEQ, max_q_len=16,
                   num_answer_slots=4, max_sents=8, train=False)
    pred_step = TQA.make_qa_predict_step(model, max_ans_len=4)
    rank_step = TQA.make_qa_rank_step(model)

    res = {"n_questions": len(eval_rows)}
    base = predict(pred_step, params, ds, batch_size=8)
    res["one_stage"] = {"chain_em": base["chain_em"],
                        "em": base["best"]["em"], "f1": base["best"]["f1"]}
    assert base["chain_em"] >= 0.8, (
        f"reader did not train (chain_em={base['chain_em']}) — fidelity "
        "comparisons against it would be meaningless")
    base_ans = base["best"]["answers"]

    for w in (96, 128, 160, 192):
        two = predict(pred_step, params, ds, batch_size=8,
                      rank_step=rank_step, rank_topm=5, rank_width=w)
        ans = two["best"]["answers"]
        agree = float(np.mean([ans[q] == base_ans[q] for q in base_ans]))
        res[f"two_stage_w{w}"] = {
            "chain_em": two["chain_em"], "em": two["best"]["em"],
            "f1": two["best"]["f1"], "answer_agreement": agree}
        print(f"== two-stage w={w}: {res[f'two_stage_w{w}']}", flush=True)

    # bf16 attention scores: same trained params, bf16-scores model
    cfg_bf = EncoderConfig.tiny(vocab_size=50265, max_position_embeddings=514,
                                type_vocab_size=2, pad_token_id=0,
                                roberta_positions=False,
                                attention_scores_dtype="bfloat16")
    model_bf = QAReader(cfg_bf, sp_pred=True)
    pred_bf = TQA.make_qa_predict_step(model_bf, max_ans_len=4)
    bf = predict(pred_bf, params, ds, batch_size=8)
    ans_bf = bf["best"]["answers"]
    res["bf16_scores"] = {
        "chain_em": bf["chain_em"], "em": bf["best"]["em"],
        "f1": bf["best"]["f1"],
        "answer_agreement": float(np.mean(
            [ans_bf[q] == base_ans[q] for q in base_ans]))}
    print(f"== bf16 scores: {res['bf16_scores']}", flush=True)

    out = os.environ.get("FIDELITY_OUT", "/tmp/fidelity_result.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"RESULT {json.dumps(res)}")
    return res


if __name__ == "__main__":
    main()
