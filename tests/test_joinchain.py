"""Kernel tests for wave 140: matrix-chain DP vs a python reference,
the CLRS textbook instance, and default-order penalties."""

from __future__ import annotations

from bano_spark.operators.joinchain import (join_chain_advisor,
                                            join_chain_curve)

_M31 = 2147483648


def _ref_opt(dims):
    p = [0] + dims
    n = len(dims) - 1
    C = [[0] * (n + 2) for _ in range(n + 1)]
    for L in range(2, n + 1):
        for i in range(1, n - L + 2):
            C[L][i] = min(C[r][i] + C[L - r][i + r]
                          + p[i] * p[i + r] * p[i + L]
                          for r in range(1, L))
    return C


def _df(spark, dims):
    return spark.createDataFrame(
        [("g", t, s) for t, s in enumerate(dims)],
        "g: string, ord: bigint, s: bigint")


def test_clrs_textbook_instance(spark):
    # CLRS 15.2: dims 30,35,15,5,10,20,25 -> optimal 15125
    dims = [30, 35, 15, 5, 10, 20, 25]
    row = join_chain_advisor(_df(spark, dims), "g", "ord",
                             "s").collect()[0]
    assert row["cost_optimal"] == 15125
    assert row["n_rel"] == 6
    ld = sum(30 * dims[k] * dims[k + 1] for k in range(1, 6))
    assert row["cost_left_deep"] == ld
    assert row["cost_left_deep"] > row["cost_optimal"]


def test_dp_vs_reference_and_curve(spark):
    dims = [1 + ((t * 37 + 5) % 40) for t in range(14)]
    C = _ref_opt(dims)
    n = len(dims) - 1
    row = join_chain_advisor(_df(spark, dims), "g", "ord",
                             "s").collect()[0]
    assert row["cost_optimal"] == C[n][1]
    curve = {r["L"]: r["cost"] for r in
             join_chain_curve(_df(spark, dims), "g", "ord", "s",
                              max_l=6).collect()}
    for L in range(2, 7):
        assert curve[L] == C[L][1]


def test_optimal_bounded_by_defaults(spark):
    dims = [1 + ((t * 91 + 17) % 50) for t in range(12)]
    row = join_chain_advisor(_df(spark, dims), "g", "ord",
                             "s").collect()[0]
    assert row["cost_optimal"] <= row["cost_left_deep"]
    assert row["cost_optimal"] <= row["cost_right_deep"]
    assert row["left_deep_penalty"] >= 1.0
