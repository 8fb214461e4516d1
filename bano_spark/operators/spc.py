"""Statistical process control — the p-chart with Western Electric
runs rules — the classic SPC layer completing the drift family
(cusum_drift detects means, page_hinkley detects onsets; WE rules
flag the PATTERNS a control-room operator reads: beyond 3-sigma, 2
of 3 beyond 2-sigma one side, 4 of 5 beyond 1-sigma one side, 8 in a
row one side).

Mechanics: defect proportions per fixed-size subgroup (bucket =
id DIV w — exact integer membership), center line p-bar and sigma =
sqrt(p-bar (1 - p-bar) / w) from the whole series (one scalar
aggregate, broadcast back); zone scores per bucket are integer
(side, zone) codes; the runs rules are lag windows over the bucket
series — the bucket table is data/w sized, and the window partitions
on the chart key, so nothing here is a global single-partition funnel
beyond that bounded table.

Every rule decision compares identically-derived doubles (one sqrt
chain) or exact integers — bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["p_chart"]


def p_chart(df: DataFrame, chart: str, id_col: str, defect: str, *,
            w: int = 200) -> DataFrame:
    """Per (chart, bucket): proportion, zone code, and the four WE
    rule flags. Returns (chart, bucket, n, defects, p, z_score,
    rule1_3sigma, rule2_2of3_2sigma, rule3_4of5_1sigma,
    rule4_8inarow, out_of_control)."""
    d = df.select(F.col(chart).alias("c"),
                  F.expr(f"{id_col} DIV {w}").alias("b"),
                  F.col(defect).cast("int").alias("e"))
    g = d.groupBy("c", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("e").cast("bigint").alias("defects"))
    tot = d.groupBy(F.col("c").alias("_c")).agg(
        (F.sum("e").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("pbar"))
    j = g.join(F.broadcast(tot), g.c == tot._c).drop("_c")
    p = F.col("defects").cast("double") / F.col("n").cast("double")
    sig = F.sqrt(F.col("pbar") * (F.lit(1.0) - F.col("pbar"))
                 / F.lit(float(w)))
    z = (p - F.col("pbar")) / sig
    d2 = j.withColumn("p", p).withColumn("z", z) \
        .withColumn("side", F.when(F.col("z") > 0, 1).otherwise(-1)) \
        .withColumn("a1", (F.abs("z") > 1.0).cast("int")) \
        .withColumn("a2", (F.abs("z") > 2.0).cast("int")) \
        .withColumn("a3", (F.abs("z") > 3.0).cast("int"))
    wd = Window.partitionBy("c").orderBy("b")

    def lag_and(col, k, same_side=True):
        e = F.lag(col, k).over(wd)
        if same_side:
            return F.when(F.lag("side", k).over(wd) == F.col("side"),
                          e).otherwise(F.lit(None))
        return e

    # rule 2: 2 of the last 3 beyond 2 sigma, same side as current
    r2 = sum(F.coalesce(lag_and("a2", k), F.lit(0))
             for k in range(3)) >= 2
    # rule 3: 4 of the last 5 beyond 1 sigma, same side
    r3 = sum(F.coalesce(lag_and("a1", k), F.lit(0))
             for k in range(5)) >= 4
    # rule 4: 8 consecutive on the same side
    r4 = sum(F.when(F.lag("side", k).over(wd) == F.col("side"), 1)
             .otherwise(0) for k in range(8)) >= 8
    out = d2.select(
        F.col("c").alias(chart), F.col("b").alias("bucket"),
        "n", "defects", F.round("p", 6).alias("p"),
        F.round("z", 6).alias("z_score"),
        (F.col("a3") == 1).alias("rule1_3sigma"),
        r2.alias("rule2_2of3_2sigma"),
        r3.alias("rule3_4of5_1sigma"),
        r4.alias("rule4_8inarow"))
    return (out.withColumn(
        "out_of_control",
        F.col("rule1_3sigma") | F.col("rule2_2of3_2sigma")
        | F.col("rule3_4of5_1sigma") | F.col("rule4_8inarow"))
        .orderBy(chart, "bucket"))
