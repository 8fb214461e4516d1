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


def streaming_sessionize(events: DataFrame, user_col: str = "user_id",
                         ts_col: str = "ts", gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Structured Streaming twin of :func:`sessionize`, using the
    native ``session_window`` aggregation: per user, an event merges
    into the open session while its timestamp is <= the session's end
    (last event + ``gap``) INCLUSIVE — a gap of exactly ``gap`` still
    merges; only a STRICTLY larger gap starts a new session (the same
    ``> gap`` rule as the batch twin; the merged window is
    ``[first_event, last_event + gap]``). Microsecond-exact on raw
    timestamps. The watermark bounds session state under a
    live source (state for a user's session is evicted once the
    watermark passes its window end); under availableNow + complete
    output the full input is one deterministic pass, which is how the
    oracle checks this against a batch gap-scan twin.

    Scale shape: state is partitioned by (user, window) — one shuffle
    on the user key, no global order anywhere, same as the batch twin."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("_w"),
                     user_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .select(user_col,
                    F.col("_w.start").alias("session_start"),
                    F.col("_w.end").alias("session_end"),
                    "n_events"))


def interval_scheduling(df: DataFrame, group_col: str,
                        start_col: str, end_col: str) -> DataFrame:
    """Maximum number of non-overlapping intervals per group — the
    textbook earliest-deadline-first greedy (provably optimal): sort
    by (end, start), keep an interval iff its start >= the last kept
    end. Touching endpoints (start == previous end) do NOT overlap.
    Pure integer fold — exact parity with the DuckDB list-accumulator
    replay.

    Scale shape: session-fold contract — one bounded collect_list per
    group, one JVM aggregate() with O(1) state (kept count +
    last end). No window, no join."""
    row = F.struct(F.col(end_col).cast("bigint").alias("e"),
                   F.col(start_col).cast("bigint").alias("s"))
    per = (df.groupBy(F.col(group_col).alias("k"))
           .agg(F.array_sort(F.collect_list(row)).alias("iv")))
    fold = F.expr("""
        aggregate(
          iv,
          named_struct('cnt', CAST(0 AS BIGINT),
                       'last_e', CAST(-9223372036854775808 AS BIGINT)),
          (acc, r) -> IF(r.s >= acc.last_e,
                         named_struct('cnt', acc.cnt + 1,
                                      'last_e', r.e),
                         acc),
          acc -> acc.cnt)
    """)
    return (per.select(F.col("k").alias(group_col),
                       F.size("iv").cast("bigint").alias("n_intervals"),
                       fold.alias("max_non_overlapping"))
            .orderBy(group_col))


def lru_stack_distance(df: DataFrame, group_col: str,
                       order_cols: list[str], page_col: str, *,
                       caps: tuple = (4, 16)) -> DataFrame:
    """LRU stack-distance profile of each group's access stream
    (Mattson et al. 1970): the stack distance of an access is the
    page's 1-based position in the move-to-front (LRU) stack, so ONE
    pass yields the hit count for EVERY cache size at once — an
    access hits a size-C cache iff its distance <= C. Reports hits at
    the requested capacities plus distinct pages (= cold misses).
    Pure string/integer fold — exact parity.

    Scale shape: session-fold contract; the fold state is the LRU
    stack (<= distinct pages per key) plus per-capacity counters, all
    rebuilt fresh each step (the wave-74 DuckDB rule)."""
    assert len(caps) == 2, "exactly two capacities reported"
    c1, c2 = int(caps[0]), int(caps[1])
    row = F.struct(*[F.col(c) for c in order_cols],
                   F.col(page_col).cast("string").alias("pg"))
    per = (df.groupBy(F.col(group_col).alias("k"))
           .agg(F.array_sort(F.collect_list(row)).alias("rows"))
           .withColumn("ps", F.col("rows").getField("pg"))
           .drop("rows"))
    fold = F.expr(f"""
        aggregate(
          ps,
          named_struct('st', CAST(array() AS ARRAY<STRING>),
                       'h1', CAST(0 AS BIGINT),
                       'h2', CAST(0 AS BIGINT)),
          (acc, p) -> named_struct(
            'st', concat(array(p), filter(acc.st, q -> q != p)),
            'h1', acc.h1 + IF(array_position(acc.st, p) > 0
                              AND array_position(acc.st, p) <= {c1},
                              1, 0),
            'h2', acc.h2 + IF(array_position(acc.st, p) > 0
                              AND array_position(acc.st, p) <= {c2},
                              1, 0)),
          acc -> named_struct('h1', acc.h1, 'h2', acc.h2,
                              'np', size(acc.st)))
    """)
    return (per.withColumn("_f", fold)
            .select(F.col("k").alias(group_col),
                    F.size("ps").cast("bigint").alias("n_accesses"),
                    F.col("_f.h1").alias(f"hits_c{c1}"),
                    F.col("_f.h2").alias(f"hits_c{c2}"),
                    F.col("_f.np").cast("bigint").alias("distinct_pages"))
            .orderBy(group_col))
