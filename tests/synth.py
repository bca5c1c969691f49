"""Synthetic HotpotQA-format fixtures for tests and benchmarks."""

import json
import numpy as np


WORDS = [f"w{i}" for i in range(600)]


def rand_text(rng, lo=5, hi=40):
    n = rng.randint(lo, hi)
    return " ".join(rng.choice(WORDS, size=n))


def make_corpus(rng, n_docs=64, empty_every=None):
    docs = []
    for i in range(n_docs):
        text = rand_text(rng)
        if empty_every and i % empty_every == 0:
            text = ""
        docs.append({"title": f"Title {i}", "text": text})
    return docs


def make_mhop_rows(rng, docs, n_rows=8):
    """Training/eval rows referencing docs as positives/negatives."""
    rows = []
    for i in range(n_rows):
        idxs = rng.choice(len(docs), size=6, replace=False)
        pos = [dict(docs[idxs[0]]), dict(docs[idxs[1]])]
        qtype = "bridge" if i % 2 == 0 else "comparison"
        rows.append({
            "_id": f"q{i}",
            "question": f"which thing links {rand_text(rng, 3, 8)}?",
            "type": qtype,
            "pos_paras": pos,
            "neg_paras": [dict(docs[j]) for j in idxs[2:]],
            "bridge": pos[1]["title"],
            "sp": [pos[0]["title"], pos[1]["title"]],
            "answer": ["yes"],
        })
    return rows


def write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
