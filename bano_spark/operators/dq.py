"""Data-quality expectation suite — the dbt-test / Great-Expectations
check family as composable one-row aggregates.

Each ``expect_*`` returns one row (check, n_checked, n_failed,
pass_rate, ok); ``quality_suite`` unions them into the audit table a
warehouse job would publish after every load.  Everything is a single
hash aggregate (or an anti-join for referential integrity) — exact
integers plus one division for the displayed rate.

Ref parity: the reference's load steps gate on exactly these
invariants — non-null INSEE codes, unique FANTOIR ids, accepted
source codes, addresses referencing a known commune (bano/sql/*.sql
NOT NULL / REFERENCES clauses and core.py sanity filters) — here they
are data, not schema, so they run on any table including external
ones the engine does not own.

Scale shape: not-null / range / accepted-values are map-side
combinable scans; uniqueness is one groupBy on the key (the same
shuffle any dedup pays); referential integrity is a LEFT ANTI join
that broadcasts the reference side's distinct keys when small.  No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _emit(df: DataFrame, check: str, failed) -> DataFrame:
    return df.agg(
        F.lit(check).alias("check"),
        F.count("*").cast("bigint").alias("n_checked"),
        F.sum(F.when(failed, 1).otherwise(0)).cast("bigint")
        .alias("n_failed"))


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return _emit(df, f"not_null:{col}", F.col(col).isNull())


def expect_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    c = F.col(col)
    return _emit(df, f"in_range:{col}[{lo},{hi}]",
                 c.isNull() | (c < lo) | (c > hi))


def expect_accepted(df: DataFrame, col: str,
                    values: list[str]) -> DataFrame:
    c = F.col(col)
    return _emit(df, f"accepted:{col}",
                 c.isNull() | ~c.isin(values))


def expect_unique(df: DataFrame, col: str) -> DataFrame:
    dup = (df.groupBy(F.col(col).alias("_k"))
           .agg(F.count("*").cast("bigint").alias("_c")))
    return dup.agg(
        F.lit(f"unique:{col}").alias("check"),
        F.sum("_c").cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
        .cast("bigint").alias("n_failed"))


def expect_subset(df: DataFrame, col: str, ref: DataFrame,
                  ref_col: str, ref_name: str) -> DataFrame:
    keys = ref.select(F.col(ref_col).alias("_rk")).distinct()
    orphans = (df.join(F.broadcast(keys),
                       df[col] == F.col("_rk"), "left_anti"))
    n = df.agg(F.count("*").cast("bigint").alias("n_checked"))
    bad = orphans.agg(F.count("*").cast("bigint").alias("n_failed"))
    return (n.crossJoin(F.broadcast(bad))
            .select(F.lit(f"subset:{col}->{ref_name}").alias("check"),
                    "n_checked", "n_failed"))


def quality_suite(checks: list[DataFrame]) -> DataFrame:
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return (out.withColumn(
        "pass_rate",
        F.round((F.col("n_checked") - F.col("n_failed"))
                / F.col("n_checked"), 6) + F.lit(0.0))
        .withColumn("ok", F.col("n_failed") == 0)
        .orderBy("check"))
