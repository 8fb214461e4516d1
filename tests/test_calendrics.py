"""Kernel tests for wave 104: business-time prefix function vs a
day-by-day Python replay, weekend interval edge cases, 4-4-5 period
boundaries, add-business-days weekend rolls and hops."""

from __future__ import annotations

from pyspark.sql import functions as F

from bano_spark.operators.calendrics import (
    FY_ANCHOR_DAY, add_business_days, business_elapsed, fiscal_445)


def _col(spark, rows, schema, expr, *names):
    df = spark.createDataFrame(rows, schema).select(expr)
    return [tuple(r[n] for n in names) if len(names) > 1 else r[names[0]]
            for r in df.collect()]


def _replay_business(s, e):
    """Day-by-day reference: business seconds in [s, e)."""
    total = 0
    t = s
    while t < e:
        d = t // 86400
        day_end = min(e, (d + 1) * 86400)
        if (d + 3) % 7 < 5:
            total += day_end - t
        t = day_end
    return total


def test_business_elapsed_vs_replay(spark):
    # Thu 1970-01-01 12:00 .. Tue 1970-01-06 06:00 spans a weekend
    cases = [(43200, 5 * 86400 + 21600),
             (0, 86400),                      # full Thursday
             (86400 * 2, 86400 * 4),          # Sat..Mon = 0 + 0
             (86400 * 2 + 100, 86400 * 2 + 200),  # inside Saturday
             (1700000000, 1700300000)]        # modern stamps
    rows = [(s, e) for s, e in cases]
    got = _col(spark, rows, "s long, e long",
               business_elapsed(F.col("s"), F.col("e")).alias("b"), "b")
    assert got == [_replay_business(s, e) for s, e in cases]


def test_weekend_interval_is_zero(spark):
    # Sat 00:00 (day 2) .. Mon 00:00 (day 4)
    got = _col(spark, [(2 * 86400, 4 * 86400)], "s long, e long",
               business_elapsed(F.col("s"), F.col("e")).alias("b"), "b")
    assert got == [0]


def test_fiscal_445_boundaries(spark):
    # anchor day = fweek 1 period 1; week 4 -> period 1, week 5 ->
    # period 2; week 52 -> period 12; week 53 -> next fyear week 1
    days = [FY_ANCHOR_DAY, FY_ANCHOR_DAY + 3 * 7, FY_ANCHOR_DAY + 4 * 7,
            FY_ANCHOR_DAY + 51 * 7, FY_ANCHOR_DAY + 52 * 7]
    df = spark.createDataFrame([(d,) for d in days], "d long")
    out = df.select(*fiscal_445(F.col("d"))).collect()
    got = [(r["fyear"], r["fquarter"], r["fperiod"], r["fweek"])
           for r in out]
    assert got == [(0, 1, 1, 1), (0, 1, 1, 4), (0, 1, 2, 5),
                   (0, 4, 12, 52), (1, 1, 1, 1)]


def test_add_business_days(spark):
    # day 0 = Thu. Thu+1=Fri(1), Thu+2=Mon(4), Sat+0=Mon(4),
    # Fri(1)+5=Fri(8), Fri+6=Mon(11)
    cases = [(0, 1, 1), (0, 2, 4), (2, 0, 4), (1, 5, 8), (1, 6, 11)]
    df = spark.createDataFrame([(d, n) for d, n, _ in cases],
                               "d long, n long")
    got = [r["due"] for r in df.select(
        add_business_days(F.col("d"), F.col("n")).alias("due")).collect()]
    assert got == [e for _, _, e in cases]
    # result is never a weekend
    df2 = spark.createDataFrame([(d, n) for d in range(14)
                                 for n in range(12)], "d long, n long")
    dows = [r["w"] for r in df2.select(
        ((add_business_days(F.col("d"), F.col("n")) + 3) % 7)
        .alias("w")).collect()]
    assert all(w < 5 for w in dows)
