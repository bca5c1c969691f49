"""Pin eval/hotpot_metrics.py to the official HotpotQA eval script's
behavior (mdr/qa/hotpot_evaluate_v1.py), including the degenerate cases the
script defines explicitly: an EMPTY supporting-fact prediction must yield
precision 0.0 (not 1.0) — inflating precision exactly in the failure case
would silently boost SP and joint metrics."""

import math

from multihop_dense_retrieval_tpu.eval.hotpot_metrics import (
    exact_match_score,
    f1_score,
    joint_metrics,
    new_metrics,
    update_answer,
    update_sp,
)


def test_update_sp_exact_match():
    m = new_metrics()
    gold = [("A", 0), ("B", 1)]
    em, prec, recall = update_sp(m, [("A", 0), ("B", 1)], gold)
    assert (em, prec, recall) == (1.0, 1.0, 1.0)
    assert m["sp_f1"] == 1.0


def test_update_sp_partial():
    m = new_metrics()
    # tp=1 fp=1 fn=1 -> prec=recall=f1=0.5, em=0
    em, prec, recall = update_sp(m, [("A", 0), ("C", 2)], [("A", 0), ("B", 1)])
    assert em == 0.0 and prec == 0.5 and recall == 0.5
    assert math.isclose(m["sp_f1"], 0.5)


def test_update_sp_empty_prediction_scores_zero():
    """hotpot_evaluate_v1.py:78-79: tp+fp==0 -> prec 0.0 (NOT 1.0)."""
    m = new_metrics()
    em, prec, recall = update_sp(m, [], [("A", 0)])
    assert prec == 0.0 and recall == 0.0 and em == 0.0
    assert m["sp_f1"] == 0.0 and m["sp_prec"] == 0.0


def test_update_sp_empty_gold_scores_zero_recall():
    m = new_metrics()
    em, prec, recall = update_sp(m, [("A", 0)], [])
    assert recall == 0.0 and prec == 0.0  # tp=0, fp=1
    assert em == 0.0


def test_update_sp_both_empty_is_em():
    # fp+fn==0 -> em=1 even though prec/recall are 0.0 (official quirk)
    m = new_metrics()
    em, prec, recall = update_sp(m, [], [])
    assert em == 1.0 and prec == 0.0 and recall == 0.0


def test_f1_special_tokens_only_match_exactly():
    assert f1_score("yes", "yes") == (1.0, 1.0, 1.0)
    assert f1_score("yes", "no") == (0.0, 0.0, 0.0)
    # "yes" vs a long answer containing "yes": still zero (special-cased)
    assert f1_score("yes", "yes it is") == (0.0, 0.0, 0.0)


def test_answer_normalization():
    assert exact_match_score("The  Answer!", "answer")
    f1, prec, recall = f1_score("a quick fox", "the quick brown fox")
    # normalized: {quick, fox} vs {quick, brown, fox}
    assert prec == 1.0 and math.isclose(recall, 2 / 3)
    assert math.isclose(f1, 0.8)


def test_joint_metrics_products():
    m = new_metrics()
    joint_metrics(m, ans_em=1.0, ans_prec=0.5, ans_recall=1.0,
                  sp_em=1.0, sp_prec=1.0, sp_recall=0.5)
    assert m["joint_em"] == 1.0
    assert m["joint_prec"] == 0.5 and m["joint_recall"] == 0.5
    assert math.isclose(m["joint_f1"], 0.5)
    # zero precision+recall -> f1 0.0, no div-by-zero
    m2 = new_metrics()
    joint_metrics(m2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    assert m2["joint_f1"] == 0.0


def test_update_answer_accumulates():
    m = new_metrics()
    update_answer(m, "Barack Obama", "barack obama")
    update_answer(m, "wrong", "right")
    assert m["em"] == 1.0 and m["f1"] == 1.0
