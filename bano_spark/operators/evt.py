"""Extreme-value tail analytics — Hill tail-index estimation and
Generalized-Pareto peaks-over-threshold fitting (method of moments),
the standard heavy-tail toolkit (Hill 1975; Hosking & Wallis 1987 MoM;
complements the wave-66 Gumbel block-maxima operator with the POT
view).

Numeric discipline:
  * order statistics and thresholds are INTEGER dollars (floor cast),
    ranks are row_numbers — all engine-exact;
  * the Hill sum of log-ratios runs as an ORDERED fold over the
    sorted top-(k+1) array (identical float sequence both engines),
    rounded 6 at the end (libm-ulp absorption, the bm25 precedent);
  * GPD moment estimates are fixed-order arithmetic over exact
    integer sums (S1, S2 of excesses) — bit-exact unrounded;
  * return levels involve pow() -> rounded 6.

Scale shape: per-group keyed windows (one hash exchange), top-k via
row_number filter (per-partition heaps), excess sums map-side
combinable. No global windows, no Python.

Ref parity: tail screening for the reference's per-commune quality
counts; the POT threshold is the same keyed-order-statistic shape as
postal_smallest_polygon's area ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["hill_topk", "gpd_mom"]


def hill_topk(df: DataFrame, group_col: str, value_col: str,
              order_col: str, *, k: int = 50) -> DataFrame:
    """Per group: the Hill estimator over the top-k order statistics,

        hill_inv = (1/k) * sum_{i=1..k} ln(X_(i) / X_(k+1)),
        alpha    = 1 / hill_inv

    both rounded 6; X_(k+1) (the anchoring order statistic) reported
    as an exact integer."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc(value_col), F.asc(order_col))
    top = (df.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= k + 1))
    per = (top.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_top"),
                F.array_sort(F.collect_list(
                    F.col(value_col).cast("double"))).alias("xs")))
    # ascending: xs[1] is X_(k+1); fold ln(x / xs[1]) over xs[2..k+1]
    fold = F.expr(f"""
        aggregate(slice(xs, 2, {k}), CAST(0 AS DOUBLE),
                  (acc, x) -> acc + ln(x / element_at(xs, 1)))""")
    return (per.filter(F.col("n_top") == k + 1)
            .withColumn("hill_inv",
                        F.round(fold / F.lit(float(k)), 6))
            .withColumn("alpha",
                        F.round(F.lit(1.0) / (fold / F.lit(float(k))), 6))
            .withColumn("x_anchor",
                        F.element_at("xs", 1).cast("bigint"))
            .select(group_col, F.lit(k).cast("bigint").alias("k"),
                    "x_anchor", "hill_inv", "alpha"))


def gpd_mom(df: DataFrame, group_col: str, value_col: str,
            order_col: str) -> DataFrame:
    """Per group: POT threshold u = the (n div 10 + 1)-th largest
    integer value (deterministic row_number rank), strict excesses
    y = x - u, exact integer sums, and the GPD method-of-moments fit

        m = S1/n_exc,  s2 = (n_exc*S2 - S1^2) / (n_exc*(n_exc-1)),
        xi = 0.5*(1 - m^2/s2),  sigma = 0.5*m*(1 + m^2/s2)

    — fixed-order double arithmetic over exact integers, unrounded."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc(value_col), F.asc(order_col))
    wn = Window.partitionBy(group_col)
    d = (df.withColumn("rnk", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(wn)))
    thr = (d.filter(F.col("rnk") == F.expr("n div 10 + 1"))
           .select(F.col(group_col),
                   F.col(value_col).cast("bigint").alias("u"),
                   F.col("n").cast("bigint").alias("n")))
    exc = (df.join(thr, group_col)
           .filter(F.col(value_col) > F.col("u"))
           .withColumn("y", (F.col(value_col) - F.col("u"))
                       .cast("bigint")))
    agg = (exc.groupBy(group_col, "u", "n")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_exc"),
                F.sum("y").cast("bigint").alias("s1"),
                F.sum(F.expr("y * y")).cast("bigint").alias("s2"))
           .filter(F.col("n_exc") >= 2))
    m = F.col("s1").cast("double") / F.col("n_exc").cast("double")
    s2 = ((F.col("n_exc") * F.col("s2") - F.col("s1") * F.col("s1"))
          .cast("double")
          / (F.col("n_exc") * (F.col("n_exc") - 1)).cast("double"))
    ratio = (m * m) / s2
    return (agg
            .withColumn("xi", 0.5 * (F.lit(1.0) - ratio))
            .withColumn("sigma", 0.5 * m * (F.lit(1.0) + ratio)))
