"""Kernel tests for wave 112: WAND/BMW audit invariants on a tiny
controlled corpus — safety (no top-k doc prunable), bound dominance
(BMW <= WAND per doc, so BMW prunes a superset), threshold
correctness vs a Python BM25 replay."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.wand import wand_audit

DOCS = [
    (0, "hash join probe build"),
    (1, "scan scan scan filter"),
    (2, "hash hash join scan"),
    (3, "sort merge order by"),
    (4, "join join join join"),
    (5, "scan hash"),
    (6, "filler words only here"),
    (7, "hash scan join hash scan join"),
]
TERMS = ["hash", "join", "scan"]
K = 3


def _bm25_scores():
    n = len(DOCS)
    toks = {d: t.split() for d, t in DOCS}
    dls = {d: float(len(t)) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            if t in TERMS:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {t: sum(1 for (d, tt) in tf if tt == t) for t in TERMS}
    con = {}
    for (d, t), f in tf.items():
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        con[(d, t)] = (idf * f * 2.2
                       / (f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)))
    scores = {}
    for (d, t), s in con.items():
        scores[d] = scores.get(d, 0.0) + s
    return con, scores


@pytest.fixture(scope="module")
def audit(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = wand_audit(df, TERMS, k=K, block=4)
    return {n: d.collect() for n, d in out.items()}


def test_exact_scores_match_replay(audit):
    _, scores = _bm25_scores()
    got = {r["doc_id"]: r["score_micro"] for r in audit["cands"]}
    for d, s in scores.items():
        assert got[d] == round(s * 1e6), d


def test_theta_is_kth_best(audit):
    _, scores = _bm25_scores()
    micro = sorted((round(s * 1e6) for s in scores.values()),
                   reverse=True)
    assert audit["cands"][0]["theta_micro"] == micro[K - 1]


def test_safety_no_topk_prunable(audit):
    for r in audit["cands"]:
        if r["in_topk"]:
            assert not r["wand_prunable"], r
            assert not r["bmw_prunable"] or r["bmw_ub"] >= r["theta_micro"]


def test_bmw_dominates_wand(audit):
    for r in audit["cands"]:
        assert r["bmw_ub"] <= r["wand_ub"], r
        if r["wand_prunable"]:
            assert r["bmw_prunable"], r


def test_term_bounds_are_maxima(audit):
    con, _ = _bm25_scores()
    for r in audit["bounds"]:
        exp = max(s for (d, t), s in con.items() if t == r["term"])
        assert r["ub_micro"] == round(exp * 1e6)
        assert r["max_bub"] <= r["ub_micro"]
