"""Kernel tests for wave 106: CPM vs a Python topological-order DP,
slack-zero critical path existence, loud non-convergence on cycles."""

from __future__ import annotations

import pytest

from bano_spark.operators.cpm import cpm_forward, cpm_schedule


@pytest.fixture(scope="module")
def dag(spark):
    # the textbook diamond with a slow lower arm
    durs = {1: 3, 2: 2, 3: 7, 4: 1}
    edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
    t = spark.createDataFrame(list(durs.items()), "task long, dur long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return durs, edges, t, e


def _dp(durs, edges):
    preds = {v: [] for v in durs}
    for u, v in edges:
        preds[v].append(u)
    es = {}
    for v in sorted(durs):  # ids are topological here
        es[v] = max((es[u] + durs[u] for u in preds[v]), default=0)
    mk = max(es[v] + durs[v] for v in durs)
    succs = {u: [] for u in durs}
    for u, v in edges:
        succs[u].append(v)
    lf = {}
    for v in sorted(durs, reverse=True):
        lf[v] = min((lf[w] - durs[w] for w in succs[v]), default=mk)
    return es, lf, mk


def test_cpm_matches_topological_dp(spark, dag):
    durs, edges, t, e = dag
    es_ref, lf_ref, mk = _dp(durs, edges)
    got = {r["task"]: r for r in cpm_schedule(t, e).collect()}
    for v in durs:
        assert got[v]["es"] == es_ref[v]
        assert got[v]["ef"] == es_ref[v] + durs[v]
        assert got[v]["lf"] == lf_ref[v]
        assert got[v]["slack"] == lf_ref[v] - es_ref[v] - durs[v]
    # critical path 1 -> 3 -> 4 (3+7+1 = 11); task 2 has slack
    assert mk == 11
    crit = {v for v, r in got.items() if r["is_critical"]}
    assert crit == {1, 3, 4}
    assert got[2]["slack"] == 11 - 1 - (3 + 2)


def test_forward_only(spark, dag):
    _, _, t, e = dag
    got = {r["task"]: (r["es"], r["ef"])
           for r in cpm_forward(t, e).collect()}
    assert got == {1: (0, 3), 2: (3, 5), 3: (3, 10), 4: (10, 11)}


def test_cycle_raises_loudly(spark):
    t = spark.createDataFrame([(1, 2), (2, 3)], "task long, dur long")
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        cpm_forward(t, e, max_rounds=5)
