"""Kernel tests for wave 139: IRR Newton fold vs a step-by-step
python reference, the textbook annuity closed form, NPV monotonicity
and IRR zero-crossing consistency."""

from __future__ import annotations

import pytest

from bano_spark.operators.finance import irr_newton, npv_table

_M31 = 2147483648


def _flows(g_count=3, per=30):
    rows = []
    for g in range(g_count):
        for t in range(per):
            u = ((g * per + t) * 2654435761 + 13) % _M31
            cf = -1000 if t == 0 else 40 + u % 200
            rows.append((g, t, cf))
    return rows


def _ref_irr(cfs, iters=6, r0=0.1):
    r = r0
    for _ in range(iters + 1):
        d, s, ds = 1.0, 0.0, 0.0
        for t, cf in cfs:
            s += cf * d
            ds -= t * cf * d / (1.0 + r)
            d /= 1.0 + r
        last = s
        r = r - s / ds
    return r + s / ds, last  # value before the extra step, residual


def test_irr_vs_reference(spark):
    rows = _flows()
    df = spark.createDataFrame(rows, "g: bigint, ord: bigint, cf: bigint")
    got = {r["g"]: r for r in
           irr_newton(df, "g", "ord", "cf", iters=6).collect()}
    for g in range(3):
        cfs = [(t, cf) for gg, t, cf in rows if gg == g]
        r = 0.1
        for _ in range(6):
            d, s, ds = 1.0, 0.0, 0.0
            for t, cf in cfs:
                s += cf * d
                ds -= t * cf * d / (1.0 + r)
                d /= 1.0 + r
            r = r - s / ds
        assert got[g]["irr"] == pytest.approx(r, abs=1e-6)
        assert abs(got[g]["npv_residual"]) < 1e-3


def test_annuity_closed_form(spark):
    # -1000 then 10 x 200: IRR solves 200 * a(10, r) = 1000
    rows = [(0, 0, -1000)] + [(0, t, 200) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "g: bigint, ord: bigint, cf: bigint")
    row = irr_newton(df, "g", "ord", "cf", iters=8).collect()[0]
    r = row["irr"]
    annuity = (1 - (1 + r) ** -10) / r
    assert 200 * annuity == pytest.approx(1000, abs=0.01)
    assert 0.1 < r < 0.2  # ~15.1% for this annuity


def test_npv_monotone_and_crossing(spark):
    rows = _flows(1)
    df = spark.createDataFrame(rows, "g: bigint, ord: bigint, cf: bigint")
    irr = irr_newton(df, "g", "ord", "cf", iters=6).collect()[0]["irr"]
    npvs = {r["rate"]: r["npv"] for r in
            npv_table(df, "g", "ord", "cf",
                      [0.05, 0.1, 0.2, 0.3]).collect()}
    vals = [npvs[k] for k in sorted(npvs)]
    assert vals == sorted(vals, reverse=True)
    # sign flips around the IRR
    below = [v for k, v in npvs.items() if k < irr]
    above = [v for k, v in npvs.items() if k > irr]
    assert all(v > 0 for v in below) and all(v < 0 for v in above)


def test_short_series_dropped(spark):
    df = spark.createDataFrame([(0, 0, -100), (0, 1, 60), (0, 2, 60)],
                               "g: bigint, ord: bigint, cf: bigint")
    assert irr_newton(df, "g", "ord", "cf").count() == 0
