"""Kernel tests for wave 129: weighted interval DP vs a bisect-based
python reference (plus greedy-gap and touching-endpoint semantics)
and LPT vs a python list scheduler (plus the LB<OPT flag case)."""

from __future__ import annotations

import bisect

import pytest

from bano_spark.operators.scheduling_fold import (lpt_makespan,
                                                  weighted_interval_opt)

_M31 = 2147483648


def _dp_ref(ivals):
    iv = sorted(ivals, key=lambda r: (r[2], r[1], r[0]))
    ends = [r[2] for r in iv]
    opt = [0]
    for j, (_, s, e, w) in enumerate(iv):
        p = bisect.bisect_right(ends, s)
        opt.append(max(opt[-1], w + opt[p]))
    return opt[-1]


def test_weighted_interval_vs_reference(spark):
    ivals = []
    for i in range(250):
        u1 = (i * 2654435761 + 13) % _M31
        u2 = (i * 1103515245 + 12345) % _M31
        st = u1 % 800
        ivals.append((i, st, st + 1 + u2 % 60, 1 + u1 % 9))
    df = spark.createDataFrame(
        [("g", i, s, e, w) for i, s, e, w in ivals],
        "grp: string, id: bigint, s: bigint, e: bigint, w: bigint")
    row = weighted_interval_opt(df, "grp", "s", "e", "w",
                                "id").collect()[0]
    assert row["opt_weight"] == _dp_ref(ivals)
    assert row["opt_weight"] >= row["greedy_weight"]
    assert row["n_intervals"] == 250


def test_weighted_interval_greedy_gap(spark):
    # one heavy interval covering two light ones: greedy (by end)
    # takes the two lights (weight 2), DP takes the heavy (weight 10)
    ivals = [(1, 0, 5, 1), (2, 5, 10, 1), (3, 0, 11, 10)]
    df = spark.createDataFrame(
        [("g", i, s, e, w) for i, s, e, w in ivals],
        "grp: string, id: bigint, s: bigint, e: bigint, w: bigint")
    row = weighted_interval_opt(df, "grp", "s", "e", "w",
                                "id").collect()[0]
    assert row["opt_weight"] == 10
    assert row["greedy_count"] == 2 and row["greedy_weight"] == 2


def test_touching_endpoints_compatible(spark):
    ivals = [(1, 0, 5, 3), (2, 5, 9, 4)]
    df = spark.createDataFrame(
        [("g", i, s, e, w) for i, s, e, w in ivals],
        "grp: string, id: bigint, s: bigint, e: bigint, w: bigint")
    row = weighted_interval_opt(df, "grp", "s", "e", "w",
                                "id").collect()[0]
    assert row["opt_weight"] == 7


def _lpt_ref(jobs, m=4):
    loads = [0] * m
    for _, d in sorted(jobs, key=lambda r: (-r[1], r[0])):
        loads[loads.index(min(loads))] += d
    return max(loads)


def test_lpt_vs_reference(spark):
    jobs = [(i, 1 + ((i * 37 + 5) % 25)) for i in range(80)]
    df = spark.createDataFrame([("g", i, d) for i, d in jobs],
                               "grp: string, id: bigint, d: bigint")
    row = lpt_makespan(df, "grp", "d", "id", machines=4).collect()[0]
    assert row["makespan"] == _lpt_ref(jobs)
    tot = sum(d for _, d in jobs)
    assert row["lower_bound"] == max((tot + 3) // 4, 25)
    assert row["ratio"] == pytest.approx(
        row["makespan"] / row["lower_bound"], abs=1e-6)


def test_lpt_lb_slack_flag(spark):
    # {3,3,3,3,4}: LB = 4 but OPT = 6 -> ratio vs LB exceeds Graham's
    # bound legitimately (documented LB-slack case)
    jobs = [(1, 3), (2, 3), (3, 3), (4, 3), (5, 4)]
    df = spark.createDataFrame([("g", i, d) for i, d in jobs],
                               "grp: string, id: bigint, d: bigint")
    row = lpt_makespan(df, "grp", "d", "id", machines=4).collect()[0]
    assert row["makespan"] == 6 and row["lower_bound"] == 4
    assert not row["ratio_le_lpt_bound"]
