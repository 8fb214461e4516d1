"""Custom stateful streaming operator (applyInPandasWithState).

The reference's cumulative tables (cumul_adresses row counts per
commune, batch metrics) are maintained by re-running SQL per commune.
Streaming-first: a grouped state operator keeps per-commune running
counters across micro-batches — the pattern for any accumulating
per-key statistic over an address feed (counts, bbox, last-seen
timestamps) without recomputing history.

State schema is explicit and versioned; timeouts are disabled (the
commune universe is closed); output is the updated row per key per
batch — an upsert feed for the serving table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               DoubleType)

STATE_SCHEMA = StructType([
    StructField("n_rows", LongType()),
    StructField("sum_value", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("n_rows", LongType()),
    StructField("sum_value", DoubleType()),
])


def running_commune_stats(grouped, value_col: str = "value"):
    """pdf-iterator state function: fold each micro-batch's rows into
    (n_rows, sum_value) per key."""

    def fn(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({"key": [key[0]], "n_rows": [n], "sum_value": [s]})

    return grouped.applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


def run_running_stats_stream(spark, src_dir: str, schema, key_col: str,
                             value_col: str, checkpoint: str):
    """availableNow pass folding a parquet feed into per-key running
    stats; returns the in-memory sink table name."""
    feed = spark.readStream.schema(schema).parquet(src_dir)
    out = running_commune_stats(
        feed.select(feed[key_col].alias("key"), feed[value_col].alias("value"))
        .groupBy("key"))
    q = (out.writeStream.format("memory").queryName("running_stats")
         .outputMode("update").option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return "running_stats"


DEDUP_STATE_SCHEMA = StructType([
    StructField("keeper", LongType()),
    StructField("n_seen", LongType()),
])

DEDUP_OUTPUT_SCHEMA = StructType([
    StructField("text_hash", StringType()),
    StructField("keeper", LongType()),
    StructField("n_dups", LongType()),
])


def streaming_exact_dedup(grouped, id_col: str = "doc_id"):
    """Stateful exact-dedup over a document stream: per content-hash
    group the state carries (keeper = min id seen so far, n_seen);
    each micro-batch emits the updated dedup row — an upsert feed for
    the dedup serving table, converging to exactly the batch
    `dedup.exact_dedup` result without ever recomputing history.
    Deterministic under replay: the keeper is the min id, not the
    arrival order."""

    def fn(key, pdfs, state: GroupState):
        keeper, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            mn = int(pdf[id_col].min())
            keeper = mn if keeper is None else min(keeper, mn)
        state.update((keeper, n))
        yield pd.DataFrame({"text_hash": [key[0]], "keeper": [keeper],
                            "n_dups": [n]})

    return grouped.applyInPandasWithState(
        fn, DEDUP_OUTPUT_SCHEMA, DEDUP_STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
