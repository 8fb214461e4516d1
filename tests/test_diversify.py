"""Kernel tests for wave 102: greedy MMR vs a sequential Python
replay, tie-breaks, missing-similarity default, and the
fewer-than-k-candidates contract."""

from __future__ import annotations

import pytest

from bano_spark.operators.diversify import mmr_select, pairwise_overlap


def _replay(cand, sim, k, w_rel=2):
    """cand: {doc: rel}; sim: {(a,b): s} symmetric. -> [(rank, doc)]"""
    sel, out = [], []
    for r in range(1, k + 1):
        best = None
        for d, rel in cand.items():
            if d in sel:
                continue
            pen = max((sim.get((d, s), 0) for s in sel), default=0)
            score = w_rel * rel - pen
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, score)
        if best is None:
            break
        sel.append(best[1])
        out.append((r, best[1], best[2]))
    return out


@pytest.fixture(scope="module")
def fixture(spark):
    cand = {1: 10, 2: 9, 3: 9, 4: 1}
    sim = {}
    for a, b, s in [(1, 2, 15), (1, 3, 1), (2, 3, 2)]:
        sim[(a, b)] = s
        sim[(b, a)] = s
    cdf = spark.createDataFrame([(0, d, r) for d, r in cand.items()],
                                "q long, doc_id long, rel long")
    sdf = spark.createDataFrame(
        [(a, b, s) for (a, b), s in sim.items()],
        "d1 long, d2 long, sim long")
    return cand, sim, cdf, sdf


def test_mmr_matches_sequential_replay(spark, fixture):
    cand, sim, cdf, sdf = fixture
    got = sorted((r["rank"], r["doc_id"], r["mmr_score"])
                 for r in mmr_select(cdf, sdf, k=3).collect())
    assert got == _replay(cand, sim, 3)
    # doc 2 (rel 9, but sim 15 to the first pick) must lose round 2 to
    # doc 3 (rel 9, sim 1): diversification changed the ranking
    assert got[1][1] == 3


def test_missing_similarity_defaults_to_zero(spark, fixture):
    _, _, cdf, sdf = fixture
    got = {r["rank"]: r for r in mmr_select(cdf, sdf, k=4).collect()}
    # doc 4 has no sim rows at all -> penalty 0, score 2*1
    assert got[4]["doc_id"] in (2, 4)


def test_fewer_candidates_than_k(spark):
    cdf = spark.createDataFrame([(0, 7, 5), (0, 8, 3)],
                                "q long, doc_id long, rel long")
    sdf = spark.createDataFrame([], "d1 long, d2 long, sim long")
    got = mmr_select(cdf, sdf, k=5).collect()
    assert sorted(r["rank"] for r in got) == [1, 2]


def test_pairwise_overlap_counts(spark):
    dt = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (3, "z")],
        "doc_id long, term string")
    got = {(r["d1"], r["d2"]): r["sim"]
           for r in pairwise_overlap(dt).collect()}
    assert got == {(1, 2): 2, (2, 1): 2}
