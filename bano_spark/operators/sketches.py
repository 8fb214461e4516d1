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


def kmv_sketches(df: DataFrame, group_col: str, value_col: str,
                 k: int = 32, prune_buckets: int = 16) -> DataFrame:
    """(group, sketch) — each group's bottom-k hash array, ascending.
    Same machinery as :func:`kmv_distinct` (lossless bucket pre-prune,
    spill-able windows); the array is the MERGEABLE form of the sketch
    — unions of groups are estimated from these k doubles alone,
    never re-reading the data."""
    u = uniform_hash(F.col(value_col)).alias("u")
    d = df.select(F.col(group_col), u).distinct()
    bucket = F.least(F.floor(F.col("u") * prune_buckets),
                     F.lit(prune_buckets - 1))
    pre = Window.partitionBy(group_col, "bucket").orderBy("u")
    pruned = (d.withColumn("bucket", bucket)
              .withColumn("brn", F.row_number().over(pre))
              .filter(F.col("brn") <= k))
    fin = Window.partitionBy(group_col).orderBy("u")
    return (pruned.withColumn("rn", F.row_number().over(fin))
            .filter(F.col("rn") <= k)
            .groupBy(group_col)
            .agg(F.array_sort(F.collect_list("u")).alias("sketch")))


def kmv_set_estimates(sketches: DataFrame, group_col: str,
                      k: int = 32) -> DataFrame:
    """Pairwise |A ∪ B| and |A ∩ B| estimates for every group pair
    (g1 < g2) from their bottom-k sketches (Beyer et al. 2007):
    the union's bottom-k is the first k of the merged distinct hash
    sets; intersection = (fraction of those present in BOTH sketches)
    × union estimate. Under-filled union sketches are exact counts.

    Scale shape: sketch rows are k doubles each; the pair join is
    O(groups^2) rows of 2k doubles — group counts are small by
    construction (sources, languages, depts), and everything after
    the sketch build is pure array expressions in codegen."""
    a = sketches.select(F.col(group_col).alias("g1"),
                        F.col("sketch").alias("sa"))
    b = sketches.select(F.col(group_col).alias("g2"),
                        F.col("sketch").alias("sb"))
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    merged = F.slice(F.array_sort(F.array_union("sa", "sb")), 1, k)
    kk = F.size(F.col("m"))
    full = kk >= k
    uk = F.element_at(F.col("m"), k)
    union_est = F.when(full, F.lit(float(k - 1)) / uk) \
        .otherwise(kk.cast("double"))
    inter_n = F.size(F.filter(
        "m", lambda v: F.array_contains("sa", v)
        & F.array_contains("sb", v)))
    inter_est = inter_n.cast("double") / kk.cast("double") * union_est
    return (pairs.withColumn("m", merged)
            .select("g1", "g2",
                    F.round(union_est, 6).alias("union_est"),
                    F.round(inter_est, 6).alias("intersect_est")))
