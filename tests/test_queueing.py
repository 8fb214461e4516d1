"""Kernel tests for wave 100: the Lindley closed form vs a direct
sequential replay, busy-period segmentation semantics (touching
departures stay in-period; strict idle gaps open one), and the
Little's-law identity."""

from __future__ import annotations

import pytest

from bano_spark.operators.queueing import (
    busy_periods, fifo_departures, queue_summary)


def _replay(jobs):
    """Sequential Lindley reference: jobs = [(a, s)] sorted."""
    out, dep = [], -10**18
    for a, s in jobs:
        start = max(dep, a)
        dep = start + s
        out.append((a, s, start, dep, start - a))
    return out


@pytest.fixture(scope="module")
def queue_df(spark):
    # one queue with contention (b) and one all-idle queue (c)
    rows = [("b", i, a, s) for i, (a, s) in enumerate(
        [(0, 5), (2, 3), (4, 1), (20, 10), (25, 2), (40, 1)])]
    rows += [("c", i, a, s) for i, (a, s) in enumerate(
        [(0, 1), (10, 2), (30, 3)])]
    return spark.createDataFrame(
        rows, "queue string, job_id long, a long, s long")


def test_closed_form_matches_sequential_replay(spark, queue_df):
    got = {(r["queue"], r["a"]): (r["start"], r["depart"], r["wait"])
           for r in fifo_departures(queue_df).collect()}
    for q, jobs in [("b", [(0, 5), (2, 3), (4, 1), (20, 10), (25, 2),
                           (40, 1)]),
                    ("c", [(0, 1), (10, 2), (30, 3)])]:
        for a, s, start, dep, wait in _replay(jobs):
            assert got[(q, a)] == (start, dep, wait), (q, a)


def test_busy_periods_touching_vs_gap(spark):
    # a arrives exactly at the previous departure -> same busy period;
    # a strict gap opens a new one.
    df = spark.createDataFrame(
        [("q", 0, 0, 5), ("q", 1, 5, 2), ("q", 2, 8, 1)],
        "queue string, job_id long, a long, s long")
    per = {r["period_id"]: (r["n_jobs"], r["busy_seconds"])
           for r in busy_periods(df).collect()}
    assert per == {1: (2, 7), 2: (1, 1)}


def test_busy_period_count(spark, queue_df):
    per = busy_periods(queue_df).filter("queue = 'b'").collect()
    # jobs at 0,2,4 chain (departs 5,8,9); 20,25 chain (departs 30,32);
    # 40 alone -> 3 periods
    assert sorted((r["n_jobs"], r["busy_seconds"]) for r in per) == [
        (1, 1), (2, 12), (3, 9)]


def test_littles_law_identity(spark, queue_df):
    row = {r["queue"]: r for r in queue_summary(queue_df).collect()}
    b = row["b"]
    # sojourn area = sum(depart - a); independently: waits + services
    assert b["sojourn_seconds"] == b["wait_seconds"] + b["service_seconds"]
    assert b["l_avg"] == b["sojourn_seconds"] / b["horizon_seconds"]
    c = row["c"]
    assert c["wait_seconds"] == 0 and c["max_wait"] == 0
