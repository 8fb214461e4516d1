"""Gap-based sessionization over an event stream.

The classic clickstream primitive: per user, order events by time and
cut a new session whenever the gap to the previous event exceeds the
threshold; the session id is the running count of cuts. The windows
are PARTITIONED by the user key — there is no global ordering anywhere
in the plan, so at 10^12 events this is one shuffle on user_id plus
per-user sorts (cf. the single-partition-Exchange hazard the
distributed prefix sum exists to avoid; here the natural key makes it
moot). Batch twin of the Structured Streaming session_window
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               tiebreak_col: str = "event_id") -> DataFrame:
    """Per-session rollup: (user, session_id 1-based, n_events,
    start/end epoch seconds, duration). Events whose gap to the
    previous event of the SAME user exceeds ``gap_seconds`` start a
    new session; the first event of a user always does."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col),
                                             F.asc(tiebreak_col))
    sec = F.unix_timestamp(F.col(ts_col))
    gapped = (events
              .withColumn("_sec", sec)
              .withColumn("_prev", F.lag("_sec").over(w))
              .withColumn(
                  "_new", (F.col("_prev").isNull()
                           | ((F.col("_sec") - F.col("_prev"))
                              > gap_seconds)).cast("int"))
              .withColumn("session_id", F.sum("_new").over(
                  w.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))))
    return (gapped.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("_sec").cast("bigint").alias("start_sec"),
        F.max("_sec").cast("bigint").alias("end_sec"))
        .withColumn("duration_sec",
                    (F.col("end_sec") - F.col("start_sec")).cast("bigint")))
