"""Kernel tests for wave 119: NMI/V-measure vs hand-computed
contingency math (perfect / independent / merged partitions) and the
Wald IV estimator vs a known structural model."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.agreement import agreement_metrics
from bano_spark.operators.causal import wald_iv


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ds long, l_true string, l_pred string")


def test_perfect_agreement(spark):
    rows = [(1, c, c) for c in "aabbcc"]
    r = agreement_metrics(_mk(spark, rows), "ds", "l_true",
                          "l_pred").collect()[0]
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert r["v_measure"] == pytest.approx(1.0, abs=1e-6)
    assert r["homogeneity"] == pytest.approx(1.0, abs=1e-6)
    assert r["mi"] == r["h_true"] == r["h_pred"]


def test_independent_partitions(spark):
    # l_pred independent of l_true (balanced 2x2) -> MI = 0
    rows = [(1, t, p) for t in "ab" for p in "xy" for _ in range(5)]
    r = agreement_metrics(_mk(spark, rows), "ds", "l_true",
                          "l_pred").collect()[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-6)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-6)


def test_merged_clusters_homogeneous_not_complete(spark):
    # prediction merges both true classes into one -> H_pred = 0,
    # MI = 0; homogeneity 0/h1 = 0; completeness 0/0 -> degenerate,
    # so use a 3->2 merge instead: true {a,b,c}, pred maps a,b -> x
    rows = ([(1, "a", "x")] * 4 + [(1, "b", "x")] * 4
            + [(1, "c", "y")] * 4)
    r = agreement_metrics(_mk(spark, rows), "ds", "l_true",
                          "l_pred").collect()[0]
    # every pred cluster is NOT pure (x mixes a, b) -> hom < 1; but
    # every true class maps into one pred cluster -> completeness = 1
    assert r["completeness"] == pytest.approx(1.0, abs=1e-6)
    assert r["homogeneity"] < 1.0
    # hand values: H_true = ln 3; MI = H_pred = (2/3,1/3) entropy
    h_pred = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert r["mi"] == pytest.approx(round(h_pred, 6), abs=2e-6)
    assert r["h_true"] == pytest.approx(round(math.log(3), 6), abs=2e-6)


def test_wald_iv_recovers_beta(spark):
    # y = 2x + 4c, x = 5 + 3z + c; z independent of c
    rows = []
    i = 0
    for z in (0, 1):
        for c in range(10):
            for e in range(3):
                x = 5 + 3 * z + c + e
                y = 2 * x + 4 * c
                rows.append((0, z, x, y))
                i += 1
    df = spark.createDataFrame(rows, "grp long, z long, x long, y long")
    r = wald_iv(df, "grp").collect()[0]
    # balanced design: z ⟂ c exactly -> Wald recovers beta = 2 exactly
    assert r["beta_iv"] == pytest.approx(2.0, abs=1e-12)
    # OLS is confounded upward (cov(x, c) > 0, effect of c positive)
    assert r["beta_ols"] > 2.0
    assert r["ols_bias"] > 0
    assert r["f_first_stage"] > 10
