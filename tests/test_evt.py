"""Kernel tests for wave 116: Hill estimator + GPD MoM vs Python
replays on known distributions — exact Pareto recovery, threshold
rank selection, excess-sum bookkeeping."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.evt import gpd_mom, hill_topk


def _pareto_sample(alpha, n, scale=1000):
    # deterministic inverse-CDF draws: u_i = (i+0.5)/n
    return [int(scale * ((1.0 - (i + 0.5) / n) ** (-1.0 / alpha)))
            for i in range(n)]


def test_hill_recovers_pareto_alpha(spark):
    alpha = 2.5
    vals = _pareto_sample(alpha, 5000)
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, k long, v long")
    row = hill_topk(df, "grp", "v", "k", k=200).collect()[0]
    # Hill over integerized inverse-CDF draws: within ~15%
    assert row["alpha"] == pytest.approx(alpha, rel=0.15)
    assert row["k"] == 200


def test_hill_matches_python_fold(spark):
    vals = [1000, 900, 800, 700, 600, 500, 400, 300, 200, 100, 90, 80]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, k long, v long")
    k = 5
    row = hill_topk(df, "grp", "v", "k", k=k).collect()[0]
    top = sorted(vals, reverse=True)[:k + 1]
    anchor = float(top[k])
    hinv = sum(math.log(x / anchor) for x in sorted(top[:k])) / k
    assert row["x_anchor"] == top[k]
    assert row["hill_inv"] == pytest.approx(round(hinv, 6), abs=1e-9)


def test_gpd_bookkeeping(spark):
    vals = list(range(1, 101))  # uniform integers 1..100
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, k long, v long")
    row = gpd_mom(df, "grp", "v", "k").collect()[0]
    # threshold = 11th largest = 90; strict excesses: 91..100
    assert row["u"] == 90
    assert row["n_exc"] == 10
    ys = [v - 90 for v in vals if v > 90]
    assert row["s1"] == sum(ys)
    assert row["s2"] == sum(y * y for y in ys)
    m = sum(ys) / len(ys)
    s2 = (len(ys) * row["s2"] - row["s1"] ** 2) / (len(ys) * (len(ys) - 1))
    assert row["xi"] == pytest.approx(0.5 * (1 - m * m / s2), abs=1e-12)
    assert row["sigma"] == pytest.approx(0.5 * m * (1 + m * m / s2),
                                         abs=1e-12)


def test_gpd_exponential_xi_near_zero(spark):
    # exponential tail -> GPD xi ~ 0 (the memoryless boundary case)
    n = 20000
    vals = [int(5000 * -math.log(1.0 - (i + 0.5) / n)) for i in range(n)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, k long, v long")
    row = gpd_mom(df, "grp", "v", "k").collect()[0]
    assert abs(row["xi"]) < 0.1
