"""Business-calendar algebra in closed form (no iteration, no UDF).

Warehouse SLA math — "business seconds between two timestamps",
"ship date + 7 business days", "which 4-4-5 fiscal period" — is
usually written as a per-row loop over days or a calendar-dim join.
Both are wrong at 10^12 rows: the loop is per-row Python, and the
calendar dim join shuffles a fact table against a table that is
really a FORMULA.  Everything here is closed-form integer arithmetic
on epoch days, so it compiles to whole-stage-codegen expressions and
costs exactly one projection.

Conventions (documented contracts, chosen to stay timezone-free per
the temporal.py DST lesson):
- Business time = Mon..Fri, 24 h/day, UTC epoch seconds; no holiday
  table (a holiday dim would broadcast-join into the same shape).
- Day-of-week: epoch day 0 (1970-01-01) is a Thursday; with Mon=0,
  dow(d) = (d + 3) % 7.
- W(x) = 5 * (x // 7) + min(x % 7, 5) counts weekdays in [0, x) of
  the Monday-aligned axis; business_f(t) below is the exact number of
  business seconds in [0, t), so any interval is one subtraction —
  the prefix-function trick (same algebra as the Lindley scan).
- 4-4-5 fiscal calendar: 52-week years anchored at the Monday
  2023-01-02 (epoch day 19359); periods of 4/4/5 weeks repeating per
  quarter; week 52 of a leap cycle stays in period 12 (the standard
  53rd-week absorption).

Ref parity: the reference stamps build batches with civil dates and
runs weekly cron cycles (bano/cron_*.sh); these operators are the
warehouse-grade generalization of that batch-calendar bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["business_seconds_from_epoch", "business_elapsed",
           "fiscal_445", "add_business_days", "FY_ANCHOR_DAY"]

FY_ANCHOR_DAY = 19359  # 2023-01-02, a Monday


def _idiv(a: Column, b: int) -> Column:
    """Exact floor division for non-negative a: (a - a % b) / b is a
    float division whose dividend is an exact multiple of b, so the
    double quotient is exact (never the near-integer rounding trap of
    cast(a / b as bigint))."""
    return ((a - a % b) / b).cast("bigint")

# cumulative week-of-year upper bounds for 4-4-5 periods 1..12
P445 = [4, 8, 13, 17, 21, 26, 30, 34, 39, 43, 47, 52]


def _weekdays_before(x: Column) -> Column:
    """W(x): weekdays in [0, x) on the Monday-aligned axis (x >= 0)."""
    return 5 * _idiv(x, 7) + F.least(x % 7, F.lit(5))


def business_seconds_from_epoch(t: Column) -> Column:
    """Exact business seconds in [0, t) for epoch-seconds t >= 0."""
    d = _idiv(t, 86400)
    r = t % 86400
    full = 86400 * (_weekdays_before(d + 3) - 3)
    partial = F.when((d + 3) % 7 < 5, r).otherwise(F.lit(0))
    return (full + partial).cast("bigint")


def business_elapsed(start: Column, end: Column) -> Column:
    """Business seconds in [start, end); exact, closed form."""
    return (business_seconds_from_epoch(end)
            - business_seconds_from_epoch(start)).cast("bigint")


def fiscal_445(epoch_day: Column):
    """(fyear, fquarter, fperiod, fweek) for a 4-4-5 calendar anchored
    at FY_ANCHOR_DAY.  fweek is 1-based week-of-year (1..52); the
    anchor starts fiscal year 0."""
    week = _idiv(epoch_day - FY_ANCHOR_DAY, 7)
    fyear = _idiv(week, 52)
    wof = (week % 52) + 1  # 1..52
    period = F.lit(12)
    for i in range(len(P445) - 1, -1, -1):
        period = F.when(wof <= P445[i], i + 1).otherwise(period)
    return (fyear.alias("fyear"),
            (_idiv(period - 1, 3) + 1).alias("fquarter"),
            period.cast("bigint").alias("fperiod"),
            wof.cast("bigint").alias("fweek"))


def add_business_days(epoch_day: Column, n: Column) -> Column:
    """Epoch day of the n-th business day after epoch_day (n >= 0).

    Contract: counting starts from the next business day — a weekend
    start first rolls forward to Monday, and n=0 returns that rolled
    start.  Closed form: roll, then add full weeks + remainder with a
    single weekend hop."""
    dow = (epoch_day + 3) % 7
    rolled = F.when(dow == 5, epoch_day + 2).when(
        dow == 6, epoch_day + 1).otherwise(epoch_day)
    rdow = (rolled + 3) % 7
    r = n % 5
    hop = F.when(rdow + r > 4, 2).otherwise(0)
    return (rolled + 7 * _idiv(n, 5) + r + hop).cast("bigint")
