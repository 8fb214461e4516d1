"""KMV (k-minimum-values) distinct-count sketch.

Completes the sketch family next to count-min (frequency,
queries_wave4 w110) and minhash (similarity, operators/dedup.py):
bottom-k estimation of per-group cardinality. BANO's batch stats count
distinct sources per commune exactly (ref bano/sql templates'
count(distinct ...)); at 10^12 rows an exact distinct per group is a
full shuffle of every distinct value — the KMV sketch bounds the
per-group state to k doubles with a provable (k-1)/u_k estimator
(Bar-Yossef et al. 2002).

Determinism contract: u = (first 13 md5 hex chars of the value string
as an integer + 0.5) / 16^13 — 52 bits, exactly representable in a
double, so ANY engine with md5 reproduces the sketch bit-for-bit and
a SQL oracle can replay the whole estimator.

Scale shape: dedup on (group, u) is one shuffle whose payload is a
group key + 8 bytes. The min-k selection never funnels a whole group
through one sort: a bucket pre-prune (floor(u * B) — the global min-k
is necessarily inside each bucket's min-k, so pruning is lossless)
caps every window partition at ~distinct/B rows, and the final
per-group window ranks at most B*k survivors. Sort-based windows
spill; no collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_HEX13 = 4503599627370496.0  # 16^13 = 2^52


def uniform_hash(col: Column) -> Column:
    """Content-derived uniform in (0, 1): md5 -> 13 hex chars -> int.
    52 bits keeps the integer->double conversion exact in every
    engine (the 15-hex variant would round differently per libm)."""
    v = F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10)
    return (v.cast("double") + 0.5) / F.lit(_HEX13)


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 32, prune_buckets: int = 16) -> DataFrame:
    """(group, sketch_size, kmv_estimate) per group.

    estimate = (k-1) / u_k when the group fills the sketch, else the
    sketch size itself (a sketch holding < k hashes has seen every
    distinct hash, so it IS the count). Estimate rounded to 6.
    """
    u = uniform_hash(F.col(value_col)).alias("u")
    d = df.select(F.col(group_col), u).distinct()
    bucket = F.least(F.floor(F.col("u") * prune_buckets),
                     F.lit(prune_buckets - 1))
    pre = Window.partitionBy(group_col, "bucket").orderBy("u")
    pruned = (d.withColumn("bucket", bucket)
              .withColumn("brn", F.row_number().over(pre))
              .filter(F.col("brn") <= k))
    fin = Window.partitionBy(group_col).orderBy("u")
    ranked = (pruned.withColumn("rn", F.row_number().over(fin))
              .filter(F.col("rn") <= k))
    return (ranked.groupBy(group_col)
            .agg(F.count("*").alias("sketch_size"),
                 F.max(F.when(F.col("rn") == k, F.col("u"))).alias("uk"))
            .select(group_col, "sketch_size",
                    F.round(F.when(F.col("sketch_size") < k,
                                   F.col("sketch_size").cast("double"))
                            .otherwise(F.lit(float(k - 1)) / F.col("uk")),
                            6).alias("kmv_estimate")))
