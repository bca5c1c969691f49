"""QA reader tests: feature construction invariants, loss vs torch oracle,
span decoding, and an end-to-end predict pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multihop_dense_retrieval_tpu.core.config import EncoderConfig
from multihop_dense_retrieval_tpu.data import HashTokenizer
from multihop_dense_retrieval_tpu.data.qa_dataset import (
    QADataset, QAFeatureBuilder, QAGroupSampler, qa_collate,
    find_answer_spans, prepare_context, decode_answer)
from multihop_dense_retrieval_tpu.models.reader import QAReader
from multihop_dense_retrieval_tpu.train import qa as TQA
from multihop_dense_retrieval_tpu.train.trainer import TrainState, make_optimizer
from multihop_dense_retrieval_tpu.core.config import RetrieverTrainConfig


def _bert_tok():
    return HashTokenizer(vocab_size=512, roberta_style=False)


def _chain(title1="Alpha", title2="Beta"):
    return [
        {"title": title1, "sents": ["the sky is blue .", "grass is green ."]},
        {"title": title2, "sents": ["paris is in france ."]},
    ]


def test_prepare_context_layout():
    tok = _bert_tok()
    ctx = prepare_context(_chain(), tok)
    assert ctx["context"].startswith("yes no [SEP] Alpha [unused1]")
    assert len(ctx["sent_starts"]) == 3
    for s in ctx["sent_starts"]:
        assert ctx["all_doc_tokens"][s] == tok.marker_token


def test_feature_builder_invariants():
    tok = _bert_tok()
    fb = QAFeatureBuilder(tok, max_seq_len=96, max_q_len=12,
                          num_answer_slots=4, max_sents=8)
    item = {"question": "what color is the sky", "passages": _chain(),
            "label": 1, "qid": "q0", "gold_answer": ["blue"],
            "sp_sent_labels": [1, 0, 0], "ans_covered": 1, "sp_gold": []}
    out = fb.build(item, train=True)
    f, meta = out["features"], out["meta"]
    spec = tok.spec
    assert f["input_ids"][0] == spec.cls_id
    off = meta["para_offset"]
    # context begins with the literal words yes / no
    ids_yes = tok.convert_tokens_to_ids(["yes", "no"])
    assert f["input_ids"][off] == ids_yes[0]
    assert f["input_ids"][off + 1] == ids_yes[1]
    # sentence offsets point at marker tokens, masked slots are 0
    for j in range(f["sent_mask"].sum()):
        assert f["input_ids"][f["sent_offsets"][j]] == tok.MARKER_ID
    assert f["sent_mask"].sum() == 3
    assert list(f["sent_labels"][:3]) == [1, 0, 0]
    # answer slots point at the token for "blue"
    blue_id = tok.convert_tokens_to_ids(["blue"])[0]
    s0 = f["starts"][0]
    assert s0 > 0 and f["input_ids"][s0] == blue_id
    assert f["ends"][0] == s0  # "blue ." strips punctuation in matching
    # paragraph mask covers the context region only
    assert f["paragraph_mask"][off - 1] == 0
    assert f["paragraph_mask"][off] == 1
    n_tokens = f["attention_mask"].sum()
    assert f["paragraph_mask"][n_tokens - 1] == 0  # final [SEP] excluded


def test_yes_no_answer_slots():
    tok = _bert_tok()
    fb = QAFeatureBuilder(tok, max_seq_len=96, max_q_len=12,
                          num_answer_slots=4, max_sents=8)
    item = {"question": "is the sky blue", "passages": _chain(),
            "label": 1, "qid": "q0", "gold_answer": ["yes"],
            "ans_covered": 1, "sp_gold": []}
    f = fb.build(item, train=True)["features"]
    off = fb.build(item, train=True)["meta"]["para_offset"]
    assert f["starts"][0] == off and f["ends"][0] == off
    item["gold_answer"] = ["no"]
    f = fb.build(item, train=True)["features"]
    assert f["starts"][0] == off + 1


def test_find_answer_spans():
    doc = "yes no [SEP] Alpha [unused1] the sky is blue . ".split()
    spans = find_answer_spans(doc, ["blue"])
    assert spans == [(8, 8)]
    spans = find_answer_spans(doc, ["sky is blue"])
    assert spans == [(6, 8)]
    assert find_answer_spans(doc, ["absent"]) == []


def test_qa_loss_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    B, L, A, S = 4, 24, 3, 6
    start_logits = rng.randn(B, L).astype(np.float32)
    end_logits = rng.randn(B, L).astype(np.float32)
    rank = rng.randn(B, 1).astype(np.float32)
    sp_score = rng.randn(B, S).astype(np.float32)
    label = np.array([1, 0, 1, 0], np.int32)
    starts = np.array([[2, 5, -1], [-1, -1, -1], [7, -1, -1], [3, 4, 5]], np.int32)
    ends = np.array([[2, 6, -1], [-1, -1, -1], [9, -1, -1], [3, 4, 6]], np.int32)
    sent_labels = rng.randint(0, 2, (B, S)).astype(np.int32)
    sent_mask = (rng.rand(B, S) > 0.3).astype(np.int32)

    outputs = {"start_logits": jnp.asarray(start_logits),
               "end_logits": jnp.asarray(end_logits),
               "rank_score": jnp.asarray(rank),
               "sp_score": jnp.asarray(sp_score)}
    batch = {"label": jnp.asarray(label), "starts": jnp.asarray(starts),
             "ends": jnp.asarray(ends), "sent_labels": jnp.asarray(sent_labels),
             "sent_mask": jnp.asarray(sent_mask)}
    got = float(TQA.qa_loss(outputs, batch, sp_weight=0.05))

    # torch oracle (qa_model.py:73-101, with mask-semantics sp weighting)
    t_start, t_end = torch.tensor(start_logits), torch.tensor(end_logits)
    ce = torch.nn.CrossEntropyLoss(ignore_index=-1, reduction="none")
    rank_loss = F.binary_cross_entropy_with_logits(
        torch.tensor(rank), torch.tensor(label).float().unsqueeze(1),
        reduction="sum")
    sl = [ce(t_start, torch.tensor(starts[:, j]).long()) for j in range(A)]
    el = [ce(t_end, torch.tensor(ends[:, j]).long()) for j in range(A)]
    loss_tensor = torch.stack(sl, 1) + torch.stack(el, 1)
    log_prob = (-loss_tensor).float().masked_fill(loss_tensor == 0, float("-inf"))
    marginal = torch.exp(log_prob).sum(1)
    m = marginal[marginal.nonzero()]
    span_loss = -torch.log(m).sum() if len(m) else torch.tensor(0.0)
    sp_loss = F.binary_cross_entropy_with_logits(
        torch.tensor(sp_score), torch.tensor(sent_labels).float(),
        reduction="none")
    sp_loss = (sp_loss * torch.tensor(sent_mask)
               * torch.tensor(label).float().unsqueeze(1)).sum()
    expected = float(rank_loss + span_loss + 0.05 * sp_loss)
    assert got == pytest.approx(expected, rel=1e-5)


def test_decode_spans_band_mask():
    rng = np.random.RandomState(1)
    B, L = 3, 16
    start = rng.randn(B, L).astype(np.float32)
    end = rng.randn(B, L).astype(np.float32)
    s, e, score = TQA.decode_spans(jnp.asarray(start), jnp.asarray(end),
                                   max_ans_len=4)
    span = start[:, :, None] + end[:, None, :]
    for b in range(B):
        best, arg = -1e30, None
        for i in range(L):
            for j in range(i, min(i + 4, L - 1) + 1):
                if span[b, i, j] > best:
                    best, arg = span[b, i, j], (i, j)
        assert (int(s[b]), int(e[b])) == arg
        assert float(score[b]) == pytest.approx(best, rel=1e-5)


def _mini_qa_rows(n=3):
    rows = []
    for i in range(n):
        sp = [{"title": f"G{i}a", "sents": ["the answer is paris ."],
               "sp_sent_ids": [0]},
              {"title": f"G{i}b", "sents": ["another sentence here ."],
               "sp_sent_ids": []}]
        negs = [[{"title": f"N{i}{j}a", "sents": ["noise text one ."]},
                 {"title": f"N{i}{j}b", "sents": ["noise text two ."]}]
                for j in range(3)]
        rows.append({"question": f"where is it {i}?", "_id": f"q{i}",
                     "answer": ["paris"], "type": "bridge", "sp": sp,
                     "candidate_chains": [sp] + negs})
    return rows


def test_qa_dataset_and_sampler():
    tok = _bert_tok()
    rows = _mini_qa_rows()
    ds = QADataset(tok, rows, max_seq_len=96, max_q_len=12,
                   num_answer_slots=4, max_sents=8, train=True)
    # 1 gold + 3 negs per question
    assert len(ds) == 12
    sampler = QAGroupSampler(ds, neg_num=2, seed=0)
    idxs = sampler.epoch_indices()
    assert len(idxs) == 9  # (1 gold + 2 negs) x 3 questions
    # groups contiguous: each group of 3 shares one qid
    for g in range(3):
        grp = idxs[g * 3:(g + 1) * 3]
        qids = {ds.data[i]["qid"] for i in grp}
        assert len(qids) == 1
        assert ds.data[grp[0]]["label"] == 1


def test_qa_train_and_predict_end_to_end():
    tok = _bert_tok()
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=128,
                             type_vocab_size=2, pad_token_id=0,
                             roberta_positions=False)
    model = QAReader(cfg, sp_pred=True)
    rows = _mini_qa_rows()
    train_ds = QADataset(tok, rows, max_seq_len=96, max_q_len=12,
                         num_answer_slots=4, max_sents=8, train=True)
    batch = qa_collate([train_ds[i] for i in range(4)])
    net = {k: jnp.asarray(v) for k, v in batch["net_inputs"].items()}
    params = model.init(jax.random.PRNGKey(0), net)

    tx = make_optimizer(RetrieverTrainConfig(learning_rate=1e-3,
                                             warmup_ratio=0.0), 20)
    state = TrainState.create(params, tx)
    step = TQA.make_qa_train_step(model, tx)
    losses = []
    for _ in range(6):
        state, loss = step(state, net)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    eval_ds = QADataset(tok, rows, max_seq_len=96, max_q_len=12,
                        num_answer_slots=4, max_sents=8, train=False)
    from multihop_dense_retrieval_tpu.eval.qa_eval import predict
    pred_step = TQA.make_qa_predict_step(model, max_ans_len=8)
    res = predict(pred_step, state.params, eval_ds, batch_size=4)
    assert res["n_questions"] == 3
    assert 0.0 <= res["chain_em"] <= 1.0
    assert set(res["best"]["answers"]) == {"q0", "q1", "q2"}
    # every predicted answer is a string (possibly yes/no)
    assert all(isinstance(a, str) for a in res["best"]["answers"].values())

    # length-sorted width-bucketed prediction is EXACT: identical answers,
    # sp and metrics vs the fixed-width path (pads are masked out of
    # attention, so narrowing is a pure FLOP saving)
    plain = predict(pred_step, state.params, eval_ds, batch_size=4,
                    length_sort=False, width_multiple=0)
    bucketed = predict(pred_step, state.params, eval_ds, batch_size=2,
                       length_sort=True, width_multiple=16)
    assert plain["best"]["answers"] == bucketed["best"]["answers"]
    assert plain["best"]["sp"] == bucketed["best"]["sp"]
    for k in ("em", "f1", "sp_em", "sp_f1", "joint_em", "joint_f1"):
        assert abs(plain["best"][k] - bucketed["best"][k]) < 1e-9


def test_two_stage_read_neutrality():
    """Two-stage read (round-2 VERDICT #2): when the rank width covers the
    whole chain, the narrow rank pass scores EXACTLY like the full pass, so
    (a) rank_topm >= #chains reproduces the one-stage predict bit-for-bit,
    (b) rank_topm=1 with pure-rank ranking (λ=1) keeps precisely the chain
    the one-stage predict would answer from (chain-EM neutrality), and
    (c) the filter keeps at most m rows per question."""
    tok = _bert_tok()
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=128,
                             type_vocab_size=2, pad_token_id=0,
                             roberta_positions=False)
    model = QAReader(cfg, sp_pred=True)
    rows = _mini_qa_rows()
    ds = QADataset(tok, rows, max_seq_len=96, max_q_len=12,
                   num_answer_slots=4, max_sents=8, train=False)
    batch = qa_collate([ds[i] for i in range(2)])
    net = {k: jnp.asarray(v) for k, v in batch["net_inputs"].items()}
    params = model.init(jax.random.PRNGKey(1), net)

    from multihop_dense_retrieval_tpu.eval.qa_eval import predict, rank_filter
    pred_step = TQA.make_qa_predict_step(model, max_ans_len=8)
    rank_step = TQA.make_qa_rank_step(model)

    full = predict(pred_step, params, ds, batch_size=4, lambdas=[1.0])
    staged = predict(pred_step, params, ds, batch_size=4, lambdas=[1.0],
                     rank_step=rank_step, rank_topm=10, rank_width=96)
    assert full["best"]["answers"] == staged["best"]["answers"]
    assert full["best"]["sp"] == staged["best"]["sp"]

    top1 = predict(pred_step, params, ds, batch_size=4, lambdas=[1.0],
                   rank_step=rank_step, rank_topm=1, rank_width=96)
    assert top1["best"]["answers"] == full["best"]["answers"]

    keep, cache = rank_filter(rank_step, params, ds, batch_size=4, topm=2,
                              rank_width=96)
    import collections
    per_q = collections.Counter(ds.data[i]["qid"] for i in keep)
    assert all(v == 2 for v in per_q.values()) and len(per_q) == 3
    # the cache covers exactly the kept rows with FULL-width features
    # (stage 2 must not re-featurize, nor inherit the rank truncation)
    assert sorted(cache) == keep
    for i in keep:
        np.testing.assert_array_equal(cache[i]["features"]["input_ids"],
                                      ds[i]["features"]["input_ids"])
    # a genuinely narrow width still runs (truncation path, clamped sent
    # offsets) and keeps m rows per question
    keep_narrow, _ = rank_filter(rank_step, params, ds, batch_size=4,
                                 topm=2, rank_width=48)
    per_q = collections.Counter(ds.data[i]["qid"] for i in keep_narrow)
    assert all(v == 2 for v in per_q.values()) and len(per_q) == 3


def test_bucketed_rank_pass_bit_matches_full_width():
    """Length-bucketed rank pass (round-4 VERDICT #2): a chain scored at a
    bucket width that covers its true length produces the same rank score
    as the full-width pass up to float-rounding of XLA's width-dependent
    reduction tiling (~1 ulp measured; pads are masked out of attention and
    positions are absolute), and rank_width=None — never truncate — keeps
    exactly the rows a full-width rank pass would keep."""
    tok = _bert_tok()
    cfg = EncoderConfig.tiny(vocab_size=512, max_position_embeddings=128,
                             type_vocab_size=2, pad_token_id=0,
                             roberta_positions=False)
    model = QAReader(cfg, sp_pred=True)
    rows = _mini_qa_rows()
    ds = QADataset(tok, rows, max_seq_len=96, max_q_len=12,
                   num_answer_slots=4, max_sents=8, train=False)
    batch = qa_collate([ds[i] for i in range(4)])
    net = {k: jnp.asarray(v) for k, v in batch["net_inputs"].items()}
    params = model.init(jax.random.PRNGKey(1), net)
    rank_step = TQA.make_qa_rank_step(model)

    # direct match: score one batch at its rounded-up true width and at
    # the full 96-token width — same floats row-for-row to rounding
    from multihop_dense_retrieval_tpu.eval.qa_eval import rank_filter
    max_len = int(np.asarray(net["attention_mask"]).sum(1).max())
    w = -(-max_len // 16) * 16
    assert w < 96, "rows must be genuinely shorter than full width"
    narrow = {k: (v[:, :w] if v.ndim == 2 and v.shape[1] == 96 else v)
              for k, v in net.items()}
    np.testing.assert_allclose(np.asarray(rank_step(params, narrow)),
                               np.asarray(rank_step(params, net)),
                               rtol=1e-5, atol=1e-6)

    # end to end through the filter: the uncapped bucketed pass keeps the
    # same rows as a pass whose cap exceeds every chain (i.e. full width)
    keep_exact, _ = rank_filter(rank_step, params, ds, batch_size=2, topm=2,
                                rank_width=None, width_multiple=16)
    keep_full, _ = rank_filter(rank_step, params, ds, batch_size=2, topm=2,
                               rank_width=4096, width_multiple=96)
    assert keep_exact == keep_full


def test_qa_dataset_rejects_raw_hotpot_sp_in_train_mode():
    """Raw [title, sent_id] supporting_facts must raise at construction —
    silently producing zero training rows would train nothing and save
    untrained checkpoints."""
    import pytest
    from multihop_dense_retrieval_tpu.data import HashTokenizer
    from multihop_dense_retrieval_tpu.data.qa_dataset import QADataset

    tok = HashTokenizer(vocab_size=512)
    rows = [{"_id": "q0", "question": "who?", "answer": ["x"],
             "sp": [["Some Title", 0]], "candidate_chains": []}]
    with pytest.raises(ValueError, match="add-sp-label"):
        QADataset(tok, rows, train=True)
    # eval mode tolerates it (labels aren't needed)
    ds = QADataset(tok, rows, train=False)
    assert len(ds) >= 0


def test_lambda_sweep_metric_fallback_without_sp_gold():
    """With an sp head but NO sp gold in the eval rows, joint_f1 is pinned
    at 0 for every lambda; the sweep must select on answer F1 and report
    which metric it used (review r3 finding — it silently kept lambdas[0],
    and cli/train_qa's best-ckpt selection froze at epoch 0)."""
    from multihop_dense_retrieval_tpu.eval.qa_eval import predict
    from multihop_dense_retrieval_tpu.models.reader import QAReader
    from multihop_dense_retrieval_tpu.train import qa as TQA
    from multihop_dense_retrieval_tpu.core.config import EncoderConfig

    tok = _bert_tok()
    rows = _mini_qa_rows()
    for r in rows:                       # strip sp gold, keep candidates
        r["sp"] = []
    ds = QADataset(tok, rows, max_seq_len=96, max_q_len=12,
                   num_answer_slots=4, max_sents=8, train=False)
    cfg = EncoderConfig.tiny(vocab_size=512, hidden_size=32, num_heads=4,
                             intermediate_size=64,
                             max_position_embeddings=128, type_vocab_size=2)
    model = QAReader(cfg, sp_pred=True)
    batch = qa_collate([ds[i] for i in range(2)])
    net = {k: jnp.asarray(v) for k, v in batch["net_inputs"].items()}
    params = model.init(jax.random.PRNGKey(0), net)
    pred_step = TQA.make_qa_predict_step(model, max_ans_len=8)

    res = predict(pred_step, params, ds, batch_size=4, sp_pred=True,
                  lambdas=[0.0, 0.5, 1.0])
    assert res["best"]["selection_metric"] == "f1"
    assert res["best"]["joint_f1"] == 0.0
    best_f1 = max(s["f1"] for s in res["per_lambda"].values())
    assert res["best"]["f1"] == best_f1

    # with sp gold present, joint F1 drives selection as before
    res2 = predict(pred_step, params,
                   QADataset(tok, _mini_qa_rows(), max_seq_len=96,
                             max_q_len=12, num_answer_slots=4, max_sents=8,
                             train=False),
                   batch_size=4, sp_pred=True, lambdas=[0.0, 0.5, 1.0])
    assert res2["best"]["selection_metric"] in ("joint_f1", "f1")
