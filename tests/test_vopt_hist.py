"""Kernel tests for wave 138: v-optimal DP vs a python reference DP,
monotone B curve, exact-cluster recovery, and the trivial B >= D
case."""

from __future__ import annotations

from collections import Counter

import pytest

from bano_spark.operators.vopt_hist import voptimal_b_curve, voptimal_sse


def _ref(vals, B):
    c = Counter(vals)
    fr = [float(c[v]) for v in sorted(c)]
    D = len(fr)
    P, PP = [0.0], [0.0]
    for f in fr:
        P.append(P[-1] + f)
        PP.append(PP[-1] + f * f)

    def sse(a, b):
        return (PP[b] - PP[a - 1]) \
            - (P[b] - P[a - 1]) ** 2 / (b - a + 1)

    E = {1: [None] + [sse(1, i) for i in range(1, D + 1)]}
    for b in range(2, B + 1):
        E[b] = [None] * (D + 1)
        for i in range(1, D + 1):
            E[b][i] = 1e18 if i < b else min(
                E[b - 1][j] + sse(j + 1, i) for j in range(b - 1, i))
    ew = sum(sse(((k - 1) * D) // B + 1, (k * D) // B)
             for k in range(1, B + 1))
    return E, D, ew


_M31 = 2147483648


def _vals(n=2000):
    # hash-noisy frequencies (a pure congruence cycle gives perfectly
    # equal cluster frequencies -> vo = 0 -> NULL improvement, which
    # test_zero_sse_improvement_null pins explicitly)
    out = []
    for i in range(n):
        u1 = (i * 2654435761 + 13) % _M31
        u2 = (i * 1103515245 + 12345) % _M31
        out.append((u1 % 8) ** 2 + u2 % 5)
    return out


def test_dp_vs_reference(spark):
    vals = _vals()
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp: string, v: bigint")
    row = voptimal_sse(df, "grp", "v", B=6).collect()[0]
    E, D, ew = _ref(vals, 6)
    assert row["n_distinct"] == D
    assert row["sse_voptimal"] == pytest.approx(E[6][D], abs=1e-5)
    assert row["sse_equalwidth"] == pytest.approx(ew, abs=1e-5)
    assert row["improvement"] > 10


def test_b_curve_monotone(spark):
    vals = _vals()
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp: string, v: bigint")
    rows = {r["B"]: r["sse"] for r in
            voptimal_b_curve(df, "grp", "v", [2, 4, 6]).collect()}
    E, D, _ = _ref(vals, 6)
    for b in (2, 4, 6):
        assert rows[b] == pytest.approx(E[b][D], abs=1e-5)
    assert rows[2] >= rows[4] >= rows[6]


def test_b_buckets_cover_clusters_exactly(spark):
    # 3 values with distinct frequencies, B = 3: zero SSE
    vals = [1] * 50 + [9] * 30 + [20] * 80
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp: string, v: bigint")
    rows = {r["B"]: r["sse"] for r in
            voptimal_b_curve(df, "grp", "v", [2, 3]).collect()}
    assert rows[3] == 0.0
    assert rows[2] > 0.0


def test_zero_sse_improvement_null(spark):
    # 2 values, B = 2: vo = 0 -> improvement NULL (guarded division)
    vals = [1] * 30 + [5] * 70
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp: string, v: bigint")
    row = voptimal_sse(df, "grp", "v", B=2).collect()[0]
    assert row["sse_voptimal"] == 0.0
    assert row["improvement"] is None
