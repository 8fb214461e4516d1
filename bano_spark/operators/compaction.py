"""Small-files compaction planning and shuffle-skew advice — the two
table-maintenance decisions every large Spark/Iceberg deployment
automates.

``ffd_compaction_plan`` — first-fit-decreasing bin packing of each
partition's files into target-size output bins (the compaction
planner's core; FFD uses at most 11/9 OPT + 6/9 bins, Dosa 2007).
The per-partition fold is pure integer arithmetic over the
size-desc-sorted file list, so plans are bit-identical everywhere.

``join_skew_advisor`` — the pre-join diagnosis: per-key histogram ->
max/avg skew ratio -> integer salt factor (ceil of the ratio) ->
projected post-salt max task rows.  All ceilings are integer
((a + b - 1) div b), no floats except display columns.

Ref parity: the reference's nightly pipeline compacts per-department
outputs into fixed bundles and splits hot departments by commune
(cron_bano.sh parallel -j 4 over dept lists; bano/constants.py
dept granularity) — these operators make both decisions data-driven.

Scale shape: compaction folds one partition's file LIST (collect
bounded by files-per-partition — the quantity compaction exists to
bound); the advisor is two hash aggregates.  Nothing quadratic in the
table size, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ffd_compaction_plan(files: DataFrame, part_col: str, id_col: str,
                        size_col: str, capacity: int) -> DataFrame:
    """Per-partition FFD plan summary: (partition, n_files,
    total_bytes, n_bins, lb_bins, fill_rate, ffd_ok) where lb_bins =
    ceil(total/capacity) and ffd_ok checks the 11/9 OPT + 6/9 bound
    against the lower bound.  Oversized files (> capacity) get a bin
    of their own (first-fit never fits them), which keeps the plan
    total-exact; fill_rate can exceed 1 only in that case."""
    row = F.struct((-F.col(size_col)).cast("bigint").alias("ns"),
                   F.col(id_col).cast("bigint").alias("fid"))
    per = (files.groupBy(F.col(part_col).alias("part"))
           .agg(F.array_sort(F.collect_list(row)).alias("fs"),
                F.count("*").cast("bigint").alias("n_files"),
                F.sum(F.col(size_col)).cast("bigint")
                .alias("total_bytes")))
    # fold: acc = array of remaining capacities; place each file in
    # the lowest-indexed bin with room, else open a new bin.
    fold = F.expr(f"""
        aggregate(
          fs,
          CAST(array() AS array<bigint>),
          (acc, r) -> aggregate(
            array(IF(size(acc) = 0, CAST(NULL AS INT),
              array_min(filter(
                transform(sequence(1, size(acc)),
                          i -> IF(element_at(acc, i) >= -r.ns, i,
                                  CAST(NULL AS INT))),
                v -> v IS NOT NULL)))),
            acc,
            (a, ix) -> IF(ix IS NULL,
                          array_append(a, CAST({capacity} AS BIGINT)
                                          + r.ns),
                          concat(slice(a, 1, ix - 1),
                                 array(element_at(a, ix) + r.ns),
                                 slice(a, ix + 1, size(a)))),
            a -> a),
          acc -> size(acc))
    """)
    return (per.select("part", "n_files", "total_bytes",
                       fold.cast("bigint").alias("n_bins"))
            .withColumn("lb_bins", F.expr(
                f"(total_bytes + {capacity - 1}) div {capacity}")
                .cast("bigint"))
            .withColumn("fill_rate",
                        F.round(F.col("total_bytes")
                                / (F.col("n_bins") * F.lit(capacity)),
                                6) + F.lit(0.0))
            .withColumn("ffd_ok",
                        F.col("n_bins") * 9
                        <= F.col("lb_bins") * 11 + 6)
            .orderBy("part"))


def join_skew_advisor(df: DataFrame, key_col: str) -> DataFrame:
    """One-row shuffle-skew diagnosis for a prospective join/groupBy
    key: (n_rows, n_keys, max_key_rows, avg_rows_per_key, skew_ratio,
    salt_factor, post_salt_max_rows, post_salt_ratio).  salt_factor =
    ceil(max * n_keys / n_rows) — the integer factor that levels the
    hottest key down to the average."""
    hist = (df.groupBy(F.col(key_col).alias("k"))
            .agg(F.count("*").cast("bigint").alias("c")))
    agg = hist.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_key_rows"))
    salt = F.expr("(max_key_rows * n_keys + n_rows - 1) div n_rows") \
        .cast("bigint")
    out = (agg.withColumn("avg_rows_per_key",
                          F.round(F.col("n_rows") / F.col("n_keys"), 6)
                          + F.lit(0.0))
           .withColumn("skew_ratio",
                       F.round(F.col("max_key_rows") * F.col("n_keys")
                               / F.col("n_rows"), 6) + F.lit(0.0))
           .withColumn("salt_factor", salt))
    return (out.withColumn(
        "post_salt_max_rows",
        F.expr("(max_key_rows + salt_factor - 1) div salt_factor")
        .cast("bigint"))
        .withColumn("post_salt_ratio",
                    F.round(F.col("post_salt_max_rows")
                            * F.col("n_keys") / F.col("n_rows"), 6)
                    + F.lit(0.0)))
