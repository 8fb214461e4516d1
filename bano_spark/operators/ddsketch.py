"""DDSketch — the relative-error quantile sketch (Masson, Rim & Lee,
VLDB 2019) as pure relational algebra: bucket index ceil(log_gamma x)
with gamma = (1+alpha)/(1-alpha), so every value in bucket i is within
relative alpha of the bucket's representative 2*gamma^i/(gamma+1).

Next to operators/sketches.py (KMV distinct) and hash_bottomk
(rank-error quantiles): DDSketch trades rank accuracy for a HARD
RELATIVE-VALUE guarantee — the p99 latency estimate is within 2% of
the true p99 value whatever the distribution's tail looks like, which
is what an SLO dashboard needs at 100 TB.

Scale design: the sketch IS a groupBy(key, bucket) count — map-side
combinable, mergeable across shards/streams by adding counts (the
sufficient statistic), O(log_gamma(range)) buckets per key. Quantile
extraction runs windows over the per-key bucket list (hundreds of
rows per key), never over raw data. The bounded-memory collapse mode
(merge lowest buckets into the floor) keeps the UPPER quantiles'
guarantee — exactly the production failure mode worth auditing.

Exactness: bucket index divides ln(x) by a PRECOMPUTED ln(gamma)
literal (both engines use the same double constant; libm ln(x) 1-ulp
differences only matter within ~1e-13 of a bucket boundary, which
integer fixtures never hit). Counts and ranks are exact integers.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["dd_gamma", "dd_bucket", "dd_sketch", "dd_quantiles",
           "dd_collapse"]


def dd_gamma(alpha: float) -> tuple[float, float]:
    """(gamma, ln_gamma) for a target relative accuracy alpha."""
    g = (1.0 + alpha) / (1.0 - alpha)
    return g, math.log(g)


def dd_bucket(x: Column, ln_gamma: float) -> Column:
    """ceil(ln x / ln gamma) for x > 0 — the DDSketch bucket index."""
    return F.ceil(F.log(x) / F.lit(ln_gamma)).cast("bigint")


def dd_sketch(df: DataFrame, key: str, x: str, alpha: float) -> DataFrame:
    """The sketch: (key, bucket, cnt). One map-side-combinable groupBy;
    merging shards = summing cnt on (key, bucket)."""
    _, lng = dd_gamma(alpha)
    return (df.filter(F.col(x) > 0)
            .groupBy(key, dd_bucket(F.col(x), lng).alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def dd_quantiles(sketch: DataFrame, key: str, qs: list[float],
                 alpha: float) -> DataFrame:
    """Quantile estimates from a sketch: for each q, the representative
    2*gamma^b/(gamma+1) of the first bucket whose cumulative count
    reaches rank max(1, ceil(q*n)). Windows are keyed (bounded bucket
    lists), the q list is a broadcast literal frame."""
    g, _ = dd_gamma(alpha)
    spark = sketch.sparkSession
    w = Window.partitionBy(key).orderBy("bucket")
    cum = (sketch
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(Window.partitionBy(key))))
    qdf = spark.createDataFrame([(q,) for q in qs], "q: double")
    hit = (cum.crossJoin(F.broadcast(qdf))
           .withColumn("rank", F.greatest(
               F.lit(1).cast("bigint"),
               F.ceil(F.col("q") * F.col("n")).cast("bigint")))
           .filter(F.col("cum") >= F.col("rank"))
           .groupBy(key, "q")
           .agg(F.min("bucket").alias("bucket"),
                F.min("n").alias("n")))
    est = (F.lit(2.0) * F.pow(F.lit(g), F.col("bucket"))
           / F.lit(g + 1.0))
    return hit.withColumn("est", est)


def dd_collapse(sketch: DataFrame, key: str, max_buckets: int) -> DataFrame:
    """Bounded-memory mode: keep the highest max_buckets-1 buckets per
    key and merge everything below into the floor bucket (the kept
    minimum) — upper quantiles keep the alpha guarantee, lower ones
    lose it. Keyed window over the bounded bucket list."""
    w = Window.partitionBy(key).orderBy(F.col("bucket").desc())
    ranked = sketch.withColumn("r", F.row_number().over(w))
    floor_b = (ranked.filter(F.col("r") <= max_buckets)
               .groupBy(key).agg(F.min("bucket").alias("floor_bucket")))
    return (ranked.join(floor_b, key)
            .withColumn("bucket", F.when(F.col("r") <= max_buckets,
                                         F.col("bucket"))
                        .otherwise(F.col("floor_bucket")))
            .groupBy(key, "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt")))
