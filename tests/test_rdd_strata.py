"""Kernel tests for wave 124: sharp RDD vs numpy polyfit on each
side, exact-jump recovery on noiseless data, stratified ATE vs a
hand-computed weighted sum and its single-arm guard."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.causal import sharp_rdd, stratified_ate


def _rdd_rows(noise=True):
    rows = []
    for i in range(400):
        r = (i * 37) % 100
        eps = ((i * 17) % 5 - 2) if noise else 0
        y = 7 + 3 * r + 20 * (r >= 50) + eps
        rows.append(("g", r, y))
    return rows


def test_noiseless_rdd_is_exact(spark):
    df = spark.createDataFrame(_rdd_rows(noise=False),
                               "grp: string, r: bigint, y: bigint")
    row = sharp_rdd(df, "grp", cutoff=50, h=25).collect()[0]
    assert row["tau_hat"] == pytest.approx(20.0, abs=1e-9)
    assert row["slope_left"] == pytest.approx(3.0, abs=1e-9)
    assert row["slope_right"] == pytest.approx(3.0, abs=1e-9)


def test_rdd_matches_numpy_polyfit(spark):
    rows = _rdd_rows()
    df = spark.createDataFrame(rows, "grp: string, r: bigint, y: bigint")
    row = sharp_rdd(df, "grp", cutoff=50, h=25).collect()[0]
    arr = np.array([(r, y) for _, r, y in rows])
    l = arr[(arr[:, 0] >= 25) & (arr[:, 0] < 50)]
    rr = arr[(arr[:, 0] >= 50) & (arr[:, 0] < 75)]
    bl = np.polyfit(l[:, 0], l[:, 1], 1)
    br = np.polyfit(rr[:, 0], rr[:, 1], 1)
    tau = np.polyval(br, 50) - np.polyval(bl, 50)
    assert row["tau_hat"] == pytest.approx(tau, rel=1e-9)


def test_stratified_ate_hand_computed(spark):
    # 2 strata; effect 5; stratum B has 3x the outcome level
    rows = ([("g", 0, 1, 10 + 5)] * 3 + [("g", 0, 0, 10)] * 6
            + [("g", 1, 1, 30 + 5)] * 6 + [("g", 1, 0, 30)] * 3)
    df = spark.createDataFrame(rows,
                               "grp: string, x: int, d: int, y: bigint")
    row = stratified_ate(df, "grp", "x").collect()[0]
    assert row["ate_stratified"] == pytest.approx(5.0, abs=1e-5)
    # naive is confounded: treated pool is 2/3 high-stratum
    assert row["naive_diff"] > 10


def test_single_arm_stratum_excluded(spark):
    rows = ([("g", 0, 1, 15)] * 3 + [("g", 0, 0, 10)] * 3
            + [("g", 1, 1, 99)] * 4)          # stratum 1: treated only
    df = spark.createDataFrame(rows,
                               "grp: string, x: int, d: int, y: bigint")
    row = stratified_ate(df, "grp", "x").collect()[0]
    assert row["n_strata"] == 2 and row["n_strata_used"] == 1
    assert row["ate_stratified"] == pytest.approx(5.0, abs=1e-5)
