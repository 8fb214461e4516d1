"""Frequency sketches: Misra-Gries heavy hitters and Count-Min.

``misra_gries`` — the deterministic heavy-hitters summary, built the
way a 1000-executor job would: each shard runs the classic k-counter
MG fold over its rows (sequential, integer), then summaries merge
RELATIONALLY per Agarwal et al. 2012 ("Mergeable Summaries"):
pointwise-sum the counters across shards, subtract the (k+1)-th
largest total, keep positives.  The merged summary inherits the MG
guarantee: true_count - mg_count <= n / (k+1), so every key with
frequency > n/(k+1) survives.  A final exact pass (one filtered
aggregation over the raw data, keyed by the <= k survivors) upgrades
the estimates to exact counts — the standard 2-pass exact
heavy-hitters at scale.

``count_min`` — the Count-Min sketch materialized AS A TABLE of
(row j, bucket, counter): d pairwise-independent affine hashes, one
hash aggregation builds all d rows in a single shuffle (the sketch is
mergeable by construction — it IS a sum).  Point estimates are the
min over the key's d buckets; overestimate >= 0 always (counters only
ever add).

Ref parity: the reference tracks per-source/per-commune row counts in
batch tables and flags the dominating sources (bano/
outils_de_gestion.py, stats.sql top-N queries); MG/CM are the
bounded-memory versions of those "who dominates the stream" rollups.

Scale shape: MG's per-shard fold is the map phase (state = k
counters, O(k) memory regardless of shard size); the merge is one
hash aggregation over <= shards*k counter rows + one order statistic
on <= shards*k values.  CM is one groupBy producing d*w rows.  At
10^12 rows neither ships anything proportional to the data except
the initial grouped scan; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# affine hash constants for count_min rows (fixed spec, both engines)
CM_A = [2654435761, 2246822519, 3266489917, 668265263]
CM_B = [97, 1013904223, 374761393, 2654435769]
CM_P = 2147483647


def misra_gries_shard(df: DataFrame, key_col: str, order_col: str,
                      shard_col: str, k: int) -> DataFrame:
    """Per-shard MG summaries: one row per surviving counter,
    (shard, key, cnt). The fold keeps at most k counters: increment on
    hit, insert when room, otherwise decrement all (dropping zeros)."""
    row = F.struct(F.col(order_col).cast("bigint").alias("o"),
                   F.col(key_col).cast("bigint").alias("x"))
    per = (df.groupBy(F.col(shard_col).alias("shard"))
           .agg(F.array_sort(F.collect_list(row)).alias("xs")))
    fold = F.expr(f"""
        aggregate(
          xs,
          CAST(array() AS array<struct<key: bigint, cnt: bigint>>),
          (acc, r) -> CASE
            WHEN exists(acc, c -> c.key = r.x)
              THEN transform(acc, c -> named_struct(
                     'key', c.key,
                     'cnt', c.cnt + IF(c.key = r.x, 1, 0)))
            WHEN size(acc) < {k}
              THEN array_append(acc,
                     named_struct('key', r.x, 'cnt', CAST(1 AS BIGINT)))
            ELSE filter(transform(acc, c -> named_struct(
                   'key', c.key, 'cnt', c.cnt - 1)), c -> c.cnt > 0)
          END,
          acc -> acc)
    """)
    return (per.select("shard", F.explode(fold).alias("c"))
            .select("shard", F.col("c.key").alias("key"),
                    F.col("c.cnt").alias("cnt")))


def misra_gries_merge(shard_summaries: DataFrame, k: int) -> DataFrame:
    """Mergeable-summaries combine: pointwise sum per key, subtract
    the (k+1)-th largest total (0 when fewer than k+1 keys), keep
    positives. Returns (key, mg_count).

    The order statistic comes from a bounded global aggregate over the
    <= shards*k counter rows (collect + sort + slice — the
    transform-and-slice idiom, NOT a global row_number window, which
    would plan an unbounded single-partition exchange)."""
    tot = (shard_summaries.groupBy("key")
           .agg(F.sum("cnt").cast("bigint").alias("t")))
    arr = tot.agg(F.array_sort(F.collect_list(
        F.struct((-F.col("t")).alias("nt")))).alias("a"))
    sub = arr.select(
        F.when(F.size("a") >= k + 1,
               -F.element_at("a", k + 1)["nt"])
        .otherwise(F.lit(0)).cast("bigint").alias("sub"))
    return (tot.crossJoin(F.broadcast(sub))
            .withColumn("mg_count", F.col("t") - F.col("sub"))
            .filter(F.col("mg_count") > 0)
            .select("key", F.col("mg_count").cast("bigint")))


def heavy_hitters_exact(df: DataFrame, key_col: str, order_col: str,
                        shard_col: str, k: int) -> DataFrame:
    """2-pass exact heavy hitters: MG shard folds + merge give the
    <= k candidates (superset of every key with freq > n/(k+1)), then
    one exact filtered count upgrades them. Returns (key, mg_count,
    exact_count, guarantee_ok) ordered by exact desc."""
    summaries = misra_gries_shard(df, key_col, order_col, shard_col, k)
    merged = misra_gries_merge(summaries, k)
    exact = (df.groupBy(F.col(key_col).alias("key"))
             .agg(F.count("*").cast("bigint").alias("exact_count")))
    n = df.agg(F.count("*").cast("bigint").alias("n"))
    return (merged.join(exact, "key")
            .crossJoin(F.broadcast(n))
            .select("key", "mg_count", "exact_count",
                    (F.col("exact_count") - F.col("mg_count")
                     <= F.col("n") / (k + 1)).alias("guarantee_ok"))
            .orderBy(F.col("exact_count").desc(), F.col("key")))


def count_min(df: DataFrame, key_col: str, *, depth: int = 4,
              width: int = 256) -> DataFrame:
    """The CM sketch as a (j, bucket, counter) table — one hash
    aggregation builds all depth rows."""
    assert depth <= len(CM_A)
    key = F.col(key_col).cast("bigint")
    rows = [
        df.select(F.lit(j).alias("j"),
                  (((key * CM_A[j] + CM_B[j]) % CM_P + CM_P) % CM_P
                   % width).alias("bucket"))
        for j in range(depth)]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return (allrows.groupBy("j", "bucket")
            .agg(F.count("*").cast("bigint").alias("counter")))


def count_min_estimates(df: DataFrame, key_col: str, *, depth: int = 4,
                        width: int = 256) -> DataFrame:
    """Point estimates for every distinct key: min over the key's
    depth buckets, joined with exact counts. overestimate >= 0 by
    construction. Returns (key, exact_count, cm_estimate,
    overestimate)."""
    sk = count_min(df, key_col, depth=depth, width=width)
    key = F.col(key_col).cast("bigint")
    exact = (df.groupBy(key.alias("key"))
             .agg(F.count("*").cast("bigint").alias("exact_count")))
    probes = exact.select(
        "key", "exact_count",
        *[(((F.col("key") * CM_A[j] + CM_B[j]) % CM_P + CM_P) % CM_P
           % width).alias(f"b{j}") for j in range(depth)])
    est = probes
    for j in range(depth):
        est = est.join(
            F.broadcast(sk.filter(F.col("j") == j)
                        .select(F.col("bucket").alias(f"b{j}"),
                                F.col("counter").alias(f"c{j}"))),
            f"b{j}")
    mn = F.least(*[F.col(f"c{j}") for j in range(depth)])
    return (est.select("key", "exact_count",
                       mn.cast("bigint").alias("cm_estimate"),
                       (mn - F.col("exact_count")).cast("bigint")
                       .alias("overestimate"))
            .orderBy("key"))
