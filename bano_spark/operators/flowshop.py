"""Two-machine flow-shop scheduling — Johnson's rule (S. M. Johnson,
Naval Res. Logist. 1954) plus the EXACT makespan closed form, per
shop (keyed), with no sequential recurrence and no global window.

Johnson's rule (optimal for F2||Cmax): jobs with a < b run first in
ascending a; the rest run last in descending b. Implemented as one
keyed row_number over the integer sort key (cls, a or -b, job_id).

Makespan WITHOUT simulating the Lindley recurrence: for a fixed
sequence j1..jn,

    Cmax = max_k ( sum_{i<=k} a_i + sum_{i>=k} b_i )

— the critical job k where machine 2 goes idle-free afterwards. Both
prefix sums are keyed running windows; the max is one keyed aggregate.
Same scan-instead-of-recurrence discipline as the wave-100 Lindley
prefix-max queueing kernel.

All quantities are integers — exact across engines.

Scale shape: everything is partitioned by the shop key (one hash
exchange); per-shop sequences sort locally. At 10^12 jobs the shop
key IS the parallelism unit; a single astronomically-long sequence
would need the prefix-sum two-pass (distributed_cumsum) instead of a
keyed window — disclosed, not silently assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["johnson_sequence", "sequence_makespan"]


def johnson_sequence(jobs: DataFrame, shop_col: str = "shop",
                     job_col: str = "job_id", a_col: str = "a",
                     b_col: str = "b") -> DataFrame:
    """Adds cls (1 = a<b front class, 2 = back class), skey, and the
    optimal position seq per shop."""
    cls = F.when(F.col(a_col) < F.col(b_col), F.lit(1)).otherwise(F.lit(2))
    skey = F.when(F.col(a_col) < F.col(b_col), F.col(a_col)) \
        .otherwise(-F.col(b_col))
    w = Window.partitionBy(shop_col).orderBy("cls", "skey", job_col)
    return (jobs.withColumn("cls", cls.cast("bigint"))
            .withColumn("skey", skey.cast("bigint"))
            .withColumn("seq", F.row_number().over(w).cast("bigint")))


def sequence_makespan(seqd: DataFrame, shop_col: str = "shop",
                      seq_col: str = "seq", a_col: str = "a",
                      b_col: str = "b") -> DataFrame:
    """Per shop: n_jobs, sum_a, sum_b, makespan for the given
    sequence via the prefix/suffix closed form (exact integers)."""
    w = (Window.partitionBy(shop_col).orderBy(seq_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy(shop_col)
    d = (seqd
         .withColumn("pref_a", F.sum(a_col).over(w))
         .withColumn("pref_b", F.sum(b_col).over(w))
         .withColumn("tot_b", F.sum(b_col).over(wtot))
         .withColumn("crit", F.col("pref_a") + F.col("tot_b")
                     - F.col("pref_b") + F.col(b_col)))
    return (d.groupBy(shop_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_jobs"),
                 F.sum(a_col).cast("bigint").alias("sum_a"),
                 F.sum(b_col).cast("bigint").alias("sum_b"),
                 F.max("crit").cast("bigint").alias("makespan")))
