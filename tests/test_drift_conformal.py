"""Kernel tests for wave 92: Page-Hinkley vs a Python replay (alarms
fire exactly for shifted series) and split-conformal coverage."""

from __future__ import annotations

import pytest

from bano_spark.operators.quantiles import split_conformal
from bano_spark.operators.temporal import page_hinkley


def py_ph(xs, delta=0.5, lam=50.0):
    s = m = mn = mx = 0.0
    al = 0
    for t, x in enumerate(xs, 1):
        s += x
        m += x - s / t - delta
        mn = min(mn, m)
        mx = max(mx, m - mn)
        if al == 0 and m - mn > lam:
            al = t
    return m, mx, al


@pytest.fixture(scope="module")
def series(spark):
    import hashlib
    rows = []
    for g in range(9):
        n = 50 + g * 5
        for t in range(n):
            h = int(hashlib.md5(f"{g}|{t}".encode()).hexdigest()[:8], 16)
            x = h % 9 + (7 if g % 3 == 0 and 2 * (t + 1) > n else 0)
            rows.append((g, t, x))
    return rows, spark.createDataFrame(rows, "g long, t long, x long")


def test_page_hinkley_matches_python(series):
    rows, df = series
    got = {r["g"]: r for r in
           page_hinkley(df, "g", "t", "x", lam=50.0).collect()}
    for g in range(9):
        xs = [x for gg, t, x in sorted(rows) if gg == g]
        m, mx, al = py_ph(xs)
        r = got[g]
        assert r["ph_final"] == round(m, 6), g
        assert r["max_dev"] == round(mx, 6), g
        assert r["first_alarm"] == al, g


def test_page_hinkley_detects_shift_only(series):
    rows, df = series
    # lam=50 sits between the measured noise ceiling (max_dev 29.6
    # across the stable series) and the shifted floor (114.1)
    got = {r["g"]: r["first_alarm"] for r in
           page_hinkley(df, "g", "t", "x", lam=50.0).collect()}
    for g in range(9):
        if g % 3 == 0:
            assert got[g] > 0, f"shifted user {g} must alarm"
        else:
            assert got[g] == 0, f"stable user {g} must not alarm"


def test_conformal_exact_quantile_and_coverage(spark):
    # calibration y: 0..99 (n=100, S=4950); k = ceil(101*0.9) = 91;
    # scores |100y - 4950| sorted -> 91st smallest = |100*94 - 4950|?
    # scores are symmetric around 49.5: distinct |100y-4950| values
    # pair up; brute-force below instead of hand-deriving.
    rows = [("g", "cal", i, i) for i in range(100)]
    rows += [("g", "test", 1000 + i, i * 2) for i in range(60)]
    df = spark.createDataFrame(rows,
                               "g string, split string, rid long, "
                               "y long")
    r = split_conformal(df, "g", "split", "rid", "y").collect()[0]
    scores = sorted(abs(y * 100 - 4950) for y in range(100))
    k = -(-(101 * 9) // 10)  # ceil((n+1)*0.9) = 91
    q = scores[k - 1]
    assert r["n_cal"] == 100 and r["n_test"] == 60
    assert r["q_scaled"] == q
    covered = sum(1 for i in range(60)
                  if abs(2 * i * 100 - 4950) <= q)
    assert r["coverage"] == round(covered / 60, 6)


def test_conformal_coverage_guarantee_iid(spark):
    # iid cal/test from the same deterministic distribution: coverage
    # must be close to 0.9 (finite-sample: within 6 points here)
    import hashlib
    rows = []
    for i in range(2000):
        h = int(hashlib.md5(f"c{i}".encode()).hexdigest()[:8], 16)
        rows.append(("g", "cal" if i % 2 == 0 else "test", i, h % 200))
    df = spark.createDataFrame(rows,
                               "g string, split string, rid long, "
                               "y long")
    r = split_conformal(df, "g", "split", "rid", "y").collect()[0]
    assert 0.84 <= r["coverage"] <= 0.96
