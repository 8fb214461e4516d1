"""Kernel tests for wave 127: Holt-Winters additive fold and theta
method vs step-by-step python references; exact-tracking and
filtering edge cases."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.hw import holt_winters_last, theta_forecast


def _hw_ref(v, m=4, a=0.5, b_=0.25, g=0.25):
    v = [float(x) for x in v]
    l = sum(v[:m]) / m
    b = (sum(v[m:2 * m]) / m - l) / m
    q = [v[m + i] - l for i in range(m)]
    sse = 0.0
    for y in v[2 * m:]:
        e = y - (l + b + q[0])
        sse += e * e
        lp = a * (y - q[0]) + (1 - a) * (l + b)
        bn = b_ * (lp - l) + (1 - b_) * b
        sn = g * (y - l - b) + (1 - g) * q[0]
        l, b, q = lp, bn, q[1:] + [sn]
    return l, b, math.sqrt(sse / (len(v) - 2 * m)), \
        [l + (h + 1) * b + q[h] for h in range(m)]


def test_hw_vs_reference(spark):
    ys = [200 + t + [0, 12, 4, -8][t % 4] + (t * 13) % 5
          for t in range(1, 41)]
    df = spark.createDataFrame([("k", i, v) for i, v in enumerate(ys)],
                               "k: string, ord: bigint, y: bigint")
    row = holt_winters_last(df, "k", ["ord"], "y").collect()[0]
    l, b, rmse, fs = _hw_ref(ys)
    assert row["level"] == pytest.approx(l, abs=1e-6)
    assert row["trend"] == pytest.approx(b, abs=1e-6)
    assert row["rmse"] == pytest.approx(rmse, abs=1e-6)
    for h in range(4):
        assert row[f"f{h + 1}"] == pytest.approx(fs[h], abs=1e-6)
    # trend recovered near the planted +1/step
    assert 0.5 < row["trend"] < 1.5


def test_hw_pure_season_exact(spark):
    # noiseless trend+season: one-step errors shrink; trend near 1
    ys = [10 * t + [0, 8, 0, -8][t % 4] for t in range(1, 33)]
    df = spark.createDataFrame([("k", i, v) for i, v in enumerate(ys)],
                               "k: string, ord: bigint, y: bigint")
    row = holt_winters_last(df, "k", ["ord"], "y").collect()[0]
    l, b, rmse, fs = _hw_ref(ys)
    assert row["rmse"] == pytest.approx(rmse, abs=1e-6)
    assert row["trend"] == pytest.approx(b, abs=1e-6)


def test_hw_short_series_dropped(spark):
    df = spark.createDataFrame([("s", i, i) for i in range(8)],
                               "k: string, ord: bigint, y: bigint")
    assert holt_winters_last(df, "k", ["ord"], "y").count() == 0


def test_theta_vs_reference(spark):
    ys = [50 + 3 * t + (t * 7) % 4 for t in range(1, 31)]
    df = spark.createDataFrame([("k", i, v) for i, v in enumerate(ys)],
                               "k: string, ord: bigint, y: bigint")
    row = theta_forecast(df, "k", ["ord"], "y").collect()[0]
    v = [float(x) for x in ys]
    n = len(v)
    st, st2 = n * (n + 1) / 2, n * (n + 1) * (2 * n + 1) / 6
    sy = sum(v)
    sty = sum((t + 1) * y for t, y in enumerate(v))
    b = (n * sty - st * sy) / (n * st2 - st * st)
    a = (sy - b * st) / n
    s = 2 * v[0] - (a + b)
    for t in range(2, n + 1):
        s = 0.5 * (2 * v[t - 1] - (a + b * t)) + 0.5 * s
    assert row["slope"] == pytest.approx(b, abs=1e-6)
    assert row["intercept"] == pytest.approx(a, abs=1e-6)
    assert row["ses_level"] == pytest.approx(s, abs=1e-6)
    assert row["f2"] == pytest.approx(
        0.5 * (a + b * (n + 2)) + 0.5 * s, abs=1e-6)
    # slope recovers the planted +3/step
    assert row["slope"] == pytest.approx(3.0, abs=0.1)
