"""Kernel tests for wave 137: Atkinson/Hoover/Palma vs direct numpy
computations, equality edge case (all indices 0), and concentration
behavior."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.inequality import (atkinson_index,
                                             hoover_index, palma_ratio)


def _df(spark, ys):
    return spark.createDataFrame(
        [("g", i, int(v)) for i, v in enumerate(ys)],
        "grp: string, id: bigint, y: bigint")


def _skewed(n=800):
    return [(1 + (i * 37 + 3) % 10) * (1 + (i * 53 + 7) % 10)
            * (1 + (i * 71 + 1) % 10) for i in range(n)]


def test_atkinson_vs_numpy(spark):
    ys = np.array(_skewed(), dtype=float)
    row = atkinson_index(_df(spark, ys), "grp", "y").collect()[0]
    ref = 1.0 - np.exp(np.mean(np.log(ys))) / ys.mean()
    assert row["atkinson"] == pytest.approx(ref, abs=1e-5)
    assert 0 < row["atkinson"] < 1
    assert row["geo_mean"] < row["mean_y"]


def test_hoover_vs_numpy(spark):
    ys = np.array(_skewed(), dtype=float)
    row = hoover_index(_df(spark, ys), "grp", "y").collect()[0]
    ref = np.abs(ys - ys.mean()).sum() / (2 * ys.sum())
    assert row["hoover"] == pytest.approx(ref, abs=1e-6)


def test_palma_vs_numpy(spark):
    ys = sorted(_skewed())
    n = len(ys)
    row = palma_ratio(_df(spark, ys), "grp", "y", "id").collect()[0]
    b40 = sum(ys[: (4 * n) // 10])
    t10 = sum(ys[n - n // 10:])
    assert row["bottom40_sum"] == b40 and row["top10_sum"] == t10
    assert row["palma"] == pytest.approx(t10 / b40, abs=1e-6)
    assert row["palma"] > 1


def test_perfect_equality_is_zero(spark):
    ys = [50] * 100
    a = atkinson_index(_df(spark, ys), "grp", "y").collect()[0]
    h = hoover_index(_df(spark, ys), "grp", "y").collect()[0]
    p = palma_ratio(_df(spark, ys), "grp", "y", "id").collect()[0]
    assert abs(a["atkinson"]) < 1e-5
    assert h["hoover"] == 0.0
    # equal values: palma = (n//10) / (4n//10) count ratio
    assert p["palma"] == pytest.approx(
        (100 // 10) / ((4 * 100) // 10), abs=1e-6)
