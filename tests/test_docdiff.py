"""Kernel tests for wave 113: Hunt–Szymanski LCS via patience fold vs
a direct DP LCS — repeated tokens (the ib-DESC tie rule), deletions,
substitutions, disjoint docs, identical docs."""

from __future__ import annotations

import pytest

from bano_spark.operators.docdiff import lcs_token_diff


def _lcs_dp(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            dp[i + 1][j + 1] = (dp[i][j] + 1 if a[i] == b[j]
                                else max(dp[i][j + 1], dp[i + 1][j]))
    return dp[m][n]


CASES = {
    1: ("the quick brown fox jumps", "the quick red fox leaps"),
    # repeated tokens: naive match chaining overcounts without ib DESC
    2: ("a b a b a", "b a b a b"),
    3: ("x x x x", "x x"),
    4: ("one two three", "four five six"),
    5: ("same same same", "same same same"),
    6: ("alpha beta gamma delta epsilon", "beta delta alpha epsilon"),
    7: ("t", "t"),
}


@pytest.fixture(scope="module")
def result(spark):
    rows_a, rows_b = [], []
    for did, (ta, tb) in CASES.items():
        for i, t in enumerate(ta.split(), start=1):
            rows_a.append((did, i, t))
        for i, t in enumerate(tb.split(), start=1):
            rows_b.append((did, i, t))
    a = spark.createDataFrame(rows_a, "doc_id long, pos long, tok string")
    b = spark.createDataFrame(rows_b, "doc_id long, pos long, tok string")
    return {r["doc_id"]: r for r in lcs_token_diff(a, b).collect()}


def test_lcs_matches_dp(result):
    for did, (ta, tb) in CASES.items():
        a, b = ta.split(), tb.split()
        exp = _lcs_dp(a, b)
        assert result[did]["lcs_len"] == exp, (did, result[did])
        assert result[did]["edit_distance"] == len(a) + len(b) - 2 * exp


def test_counts_and_similarity(result):
    for did, (ta, tb) in CASES.items():
        a, b = ta.split(), tb.split()
        r = result[did]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_matches"] == sum(1 for x in a for y in b if x == y)
        assert r["similarity"] == pytest.approx(
            2.0 * r["lcs_len"] / (len(a) + len(b)))


def test_identical_and_disjoint(result):
    assert result[5]["edit_distance"] == 0
    assert result[5]["similarity"] == 1.0
    assert result[4]["lcs_len"] == 0
    assert result[4]["similarity"] == 0.0
