"""Scale-safe ordered cumulative sums + token-budget corpus selection.

The naive cumulative sum — ``F.sum(v).over(Window.orderBy(...))`` with
no partitionBy — funnels the whole dataset through ONE task (Spark
plans a single-partition Exchange for an unpartitioned ordered
window), a non-starter at 100 TB. This module implements the classic
two-pass distributed prefix sum:

  1. bucket rows into range partitions of the global order. Bucket
     boundaries come from ``percentile_approx`` over the ordering
     column — a deterministic aggregation, unlike
     ``repartitionByRange`` whose reservoir sampling can re-draw
     different boundaries when the lineage is recomputed between the
     offsets job and the output job;
  2. per-bucket running sums via a window PARTITIONED by the bucket id
     (parallel — no single-partition exchange anywhere in the plan);
  3. per-bucket totals (one tiny row per bucket) are collected and
     turned into exclusive prefix offsets on the driver — O(buckets)
     driver work, independent of row count;
  4. global cumsum = bucket offset + within-bucket running sum.

Token-budget selection (the "take best documents until N tokens"
corpus-mixing step of LLM data pipelines) is a thin wrapper: keep rows
whose cumulative token count *before* the row is under budget — the
greedy quality-ordered prefix of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _bucket_expr(col: Column, bounds: list, descending: bool) -> Column:
    """Deterministic contiguous range-bucket id from sorted ascending
    boundary values: rows compare against literal bounds (pure codegen,
    one indicator per bound). Equal key values always share a bucket."""
    pid = F.lit(0)
    for b in bounds:
        if descending:
            pid = pid + F.when(F.lit(b) > col, 1).otherwise(0)
        else:
            pid = pid + F.when(col >= F.lit(b), 1).otherwise(0)
    return pid.cast("int")


def distributed_cumsum(df: DataFrame, range_col: str, order_by: list[Column],
                       value_col: str, out_col: str = "cum",
                       descending: bool = False,
                       num_buckets: int | None = None) -> DataFrame:
    """Global ordered cumulative sum of `value_col` without a
    single-partition exchange. `order_by` must be the full total order
    (include a unique tiebreak column); `range_col` is its leading
    numeric column, used for deterministic range bucketing, and MUST be
    non-null: a null range key would bucket first (comparisons are
    null-false) while sorting last, breaking bucket contiguity —
    coalesce upstream to a sentinel inside the key's value range."""
    n = int(num_buckets or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    qs = [i / n for i in range(1, n)]
    row = df.select(
        F.percentile_approx(range_col, qs, 10000).alias("b")).first()
    bounds = sorted(set(row["b"] or []))
    bucketed = df.withColumn(
        "_pid", _bucket_expr(F.col(range_col), bounds, descending))
    w = (Window.partitionBy("_pid").orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = bucketed.withColumn("_local_cum", F.sum(value_col).over(w))
    # one row per bucket — tiny driver-side pass, O(buckets) not O(rows)
    totals = bucketed.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    offsets, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["_tot"] or 0
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off bigint")
    return (local.join(F.broadcast(off_df), "_pid")
            .withColumn(out_col,
                        (F.col("_off") + F.col("_local_cum")).cast("bigint"))
            .drop("_pid", "_local_cum", "_off"))


def token_budget_select(scored: DataFrame, budget: int,
                        tokens_col: str = "n_tokens",
                        quality_col: str = "quality_rank",
                        id_col: str = "doc_id") -> DataFrame:
    """Greedy best-first selection: order by quality desc (id tiebreak),
    keep documents while the running token total before each document
    is under `budget`. Matches SQL
    ``sum(tokens) OVER (ORDER BY quality DESC, id) - tokens < budget``."""
    order = [F.desc(quality_col), F.asc(id_col)]
    cum = distributed_cumsum(scored, quality_col, order, tokens_col,
                             out_col="cum_tokens", descending=True)
    return cum.filter(F.col("cum_tokens") - F.col(tokens_col) < budget)
