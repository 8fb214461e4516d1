"""SLO burn-rate alerting (the Google SRE multiwindow, multi-burn
policy) and error-budget accounting — the ops layer next to
queue_littles_law_summary / page_hinkley_drift: "page when the short
AND the long window both burn the error budget fast" — the alerting
rule that is both fast AND precise, reduced to two bucket aggregates
and an equi-join.

Mechanics: events bucket into a short and a containing long window
on a dense integer key (bucket = id DIV w — integer exact, no
timestamp parsing wobble); per-bucket error rates are single
divisions of exact counts; burn = rate / (1 - slo); the alert fires
on short_burn > fast_threshold AND long_burn > slow_threshold
(14.4 / 6 — the canonical 2%-budget-in-an-hour pair). Every decision
compares doubles derived by one division from exact integers —
bit-identical across engines.

Scale shape: two hash aggregates + one broadcast-safe equi-join on
the long-bucket key; the budget report is one aggregate per
dimension value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["burn_rate_alerts", "error_budget_report"]


def burn_rate_alerts(df: DataFrame, id_col: str, err_col: str, *,
                     slo: float = 0.99, short_w: int = 200,
                     long_w: int = 1000, fast_thr: float = 14.4,
                     slow_thr: float = 6.0) -> DataFrame:
    """Per short bucket: (short_bucket, n_short, err_short,
    burn_short, burn_long, page).

    Requires ``long_w % short_w == 0`` (asserted): otherwise a short
    bucket straddles two long buckets, which both duplicates the
    short_bucket output rows and makes their relative order
    nondeterministic under the short_bucket-only sort.
    """
    if long_w % short_w != 0:
        raise ValueError(
            f"long_w ({long_w}) must be a multiple of short_w "
            f"({short_w}): a short bucket must map to exactly one "
            "long bucket")
    budget = 1.0 - slo
    d = df.select(F.expr(f"{id_col} DIV {short_w}").alias("sb"),
                  F.expr(f"{id_col} DIV {long_w}").alias("lb"),
                  F.col(err_col).cast("int").alias("e"))
    s = d.groupBy("sb", "lb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_short"),
        F.sum("e").cast("bigint").alias("err_short"))
    l = d.groupBy(F.col("lb").alias("_lb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_long"),
        F.sum("e").cast("bigint").alias("err_long"))
    j = s.join(F.broadcast(l), s.lb == l._lb)
    bs = (F.col("err_short").cast("double")
          / F.col("n_short").cast("double") / F.lit(budget))
    bl = (F.col("err_long").cast("double")
          / F.col("n_long").cast("double") / F.lit(budget))
    return (j.select(F.col("sb").alias("short_bucket"),
                     "n_short", "err_short",
                     F.round(bs, 6).alias("burn_short"),
                     F.round(bl, 6).alias("burn_long"),
                     ((bs > fast_thr) & (bl > slow_thr)).alias("page"))
            .orderBy("short_bucket"))


def error_budget_report(df: DataFrame, dim: str, err_col: str, *,
                        slo: float = 0.99) -> DataFrame:
    """Per dimension value: (dim, n, errors, err_rate, budget_used,
    budget_left_frac) — budget_used = rate / (1 - slo)."""
    budget = 1.0 - slo
    a = df.groupBy(dim).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(err_col).cast("int")).cast("bigint")
        .alias("errors"))
    rate = F.col("errors").cast("double") / F.col("n").cast("double")
    used = rate / F.lit(budget)
    return (a.select(dim, "n", "errors",
                     F.round(rate, 6).alias("err_rate"),
                     F.round(used, 6).alias("budget_used"),
                     F.round(F.lit(1.0) - used, 6)
                     .alias("budget_left_frac"))
            .orderBy(dim))
