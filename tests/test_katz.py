"""Kernel tests for wave 107: path counts vs matrix powers in Python,
exact dyadic Katz on a known graph, seeded initialization."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bano_spark.operators.katz import katz_truncated, path_counts


@pytest.fixture(scope="module")
def tri(spark):
    # 1 -> 2, 2 -> 3, 1 -> 3, 3 -> 1 (a cycle with a chord)
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 1)],
                              "src long, dst long")
    n = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    return e, n


def _matpow_counts(edges, nodes, k):
    adj = {(u, v) for u, v in edges}
    cur = {v: 1 for v in nodes}
    out = {}
    for j in range(1, k + 1):
        nxt = {}
        for (u, v) in adj:
            nxt[v] = nxt.get(v, 0) + cur.get(u, 0)
        out[j] = dict(nxt)
        cur = nxt
    return out


def test_path_counts_match_matrix_power(spark, tri):
    e, n = tri
    ref = _matpow_counts([(1, 2), (2, 3), (1, 3), (3, 1)],
                         [1, 2, 3], 4)
    got = {}
    for r in path_counts(e, n, 4).collect():
        got.setdefault(r["j"], {})[r["node"]] = r["paths"]
    assert got == ref


def test_katz_exact_dyadic(spark, tri):
    e, n = tri
    ref = _matpow_counts([(1, 2), (2, 3), (1, 3), (3, 1)],
                         [1, 2, 3], 4)
    expect = {v: sum(4 ** (4 - j) * ref[j].get(v, 0)
                     for j in range(1, 5)) for v in [1, 2, 3]}
    got = {r["node"]: (r["katz_num"], r["katz_score"])
           for r in katz_truncated(e, n, k=4).collect()}
    for v in [1, 2, 3]:
        assert got[v][0] == expect[v]
        assert got[v][1] == expect[v] / 256.0  # exact dyadic


def test_seeded_init(spark, tri):
    e, n = tri
    init = n.select("node", F.when(F.col("node") == 1, 1).otherwise(0)
                    .cast("bigint").alias("paths"))
    got = {r["node"]: r["katz_num"]
           for r in katz_truncated(e, n, k=2, init=init).collect()}
    # from node 1: length-1 paths to 2 and 3 (weight 4); length-2:
    # 1->2->3 and 1->3->1 (weight 1)
    assert got == {1: 1, 2: 4, 3: 4 + 1}
