"""Kernel tests for wave 89: quantized multinomial NB vs a Python
replay on a tiny corpus with known structure."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from bano_spark.operators.nbayes import (SCALE, naive_bayes_confusion,
                                         naive_bayes_predictions)

# ids chosen so % 3 != 0 trains, % 3 == 0 tests.
CORPUS = [
    (1, "fr", "le chat mange le poisson"),
    (2, "fr", "le chien aime le chat"),
    (4, "fr", "une baguette et le fromage"),
    (5, "en", "the cat eats the fish"),
    (7, "en", "the dog likes the cat"),
    (8, "en", "a loaf and the cheese"),
    (3, "fr", "le chat et le chien"),      # test
    (6, "en", "the cat and the dog"),      # test
    (9, "en", "the fish likes a cheese"),  # test
]


def py_nb(corpus):
    train = [(l, t.split()) for i, l, t in corpus if i % 3 != 0]
    test = [(i, l, t.split()) for i, l, t in corpus if i % 3 == 0]
    counts = defaultdict(Counter)
    for l, toks in train:
        counts[l].update(toks)
    vocab = len({t for c in counts.values() for t in c})
    nl = Counter(l for l, _ in train)
    n = len(train)
    preds = {}
    for i, label, toks in test:
        best = None
        for cls in sorted(counts):
            t = sum(counts[cls].values())
            prior = round(math.log(nl[cls] / n) * SCALE)
            d = round(math.log(1 / (t + vocab)) * SCALE)
            s = prior
            for tok in toks:
                c = counts[cls].get(tok)
                s += (round(math.log((c + 1) / (t + vocab)) * SCALE)
                      if c else d)
            if best is None or s > best[0]:
                best = (s, cls)
        preds[i] = (label, best[1], best[0])
    return preds


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS,
                                 "doc_id long, lang string, text string")


def test_nb_predictions_match_python(corpus_df):
    got = {r["doc"]: r for r in
           naive_bayes_predictions(corpus_df).collect()}
    want = py_nb(CORPUS)
    assert set(got) == set(want)
    for i, (label, pred, score) in want.items():
        assert got[i]["label"] == label
        assert got[i]["pred"] == pred, i
        # python banker's rounding can differ from HALF_UP only on
        # exact .5 boundaries, which this corpus avoids
        assert got[i]["score"] == score, i


def test_nb_classifies_clean_languages(corpus_df):
    got = {r["doc"]: r["pred"] for r in
           naive_bayes_predictions(corpus_df).collect()}
    assert got[3] == "fr" and got[6] == "en" and got[9] == "en"


def test_nb_confusion_totals(corpus_df):
    rows = naive_bayes_confusion(corpus_df).collect()
    assert sum(r["n"] for r in rows) == 3
