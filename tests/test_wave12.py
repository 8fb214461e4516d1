"""Wave-12 streaming test: the stateful HLL's converged register
state across multiple micro-batches equals the batch sketch exactly
(mergeable max-fold), so the streaming estimate is the batch
estimate."""

import pandas as pd
from pyspark.sql import functions as F


def test_streaming_hll_converges_to_batch_sketch(spark, tmp_path):
    from bano_spark.operators.sketches import hll_register_cols, hll_sketch
    from bano_spark.streaming.stateful import streaming_hll

    src = tmp_path / "feed"
    src.mkdir()
    # two files => two micro-batches; overlapping values across them
    pd.DataFrame({"g": ["a"] * 40 + ["b"] * 30,
                  "v": [f"u{i}" for i in range(40)]
                  + [f"u{i}" for i in range(30)]}).to_parquet(
        src / "f1.parquet")
    pd.DataFrame({"g": ["a"] * 20 + ["b"] * 25,
                  "v": [f"u{i}" for i in range(30, 50)]
                  + [f"w{i}" for i in range(25)]}).to_parquet(
        src / "f2.parquet")

    feed = (spark.readStream.schema("g string, v string")
            .option("maxFilesPerTrigger", 1).parquet(str(src)))
    idx, rank = hll_register_cols(F.col("v"), 6)
    out = streaming_hll(
        feed.select("g", idx.cast("int").alias("idx"),
                    rank.cast("int").alias("rank")).groupBy("g"),
        p=6, key_name="g")
    q = (out.writeStream.format("memory").queryName("hll_test")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    final = {}
    for r in spark.table("hll_test").collect():
        prev = final.get(r.g)
        if prev is None or r.n_seen >= prev[0]:
            final[r.g] = (r.n_seen, list(r.registers))

    batch = spark.createDataFrame(
        [("a", f"u{i}") for i in range(50)]
        + [("b", f"u{i}") for i in range(30)]
        + [("b", f"w{i}") for i in range(25)], "g string, v string")
    expected = {r["g"]: list(r["registers"])
                for r in hll_sketch(batch, "g", "v", p=6).collect()}
    assert final["a"][1] == expected["a"]
    assert final["b"][1] == expected["b"]
    assert final["a"][0] == 60 and final["b"][0] == 55  # rows folded


def test_streaming_cusum_across_batch_seams(spark, tmp_path):
    """The carry-in reflection fold across two micro-batches equals
    the single-pass recursion: the level shift lands mid-stream and
    the alarm fires in batch 2 with state carried from batch 1."""
    from bano_spark.streaming.stateful import streaming_cusum

    xs = [3.0, 1.0, 7.0, 0.0, 9.0, 9.0, 2.0, 8.0, 8.0, 8.0]
    target, slack, h = 4.0, 1.0, 6.0
    s, smax, alarms, first = 0.0, 0.0, 0, None
    for i, x in enumerate(xs, 1):
        s = max(0.0, s + x - target - slack)
        smax = max(smax, s)
        if s > h:
            alarms += 1
            first = first or i

    src = tmp_path / "feed"
    src.mkdir()
    pd.DataFrame({"k": [1] * 5, "seq": list(range(1, 6)),
                  "v": xs[:5]}).to_parquet(src / "f1.parquet")
    pd.DataFrame({"k": [1] * 5, "seq": list(range(6, 11)),
                  "v": xs[5:]}).to_parquet(src / "f2.parquet")
    feed = (spark.readStream.schema("k long, seq long, v double")
            .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = streaming_cusum(feed.groupBy("k"), target, slack, h,
                          key_name="k")
    q = (out.writeStream.format("memory").queryName("cusum_test")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    final = None
    for r in spark.table("cusum_test").collect():
        if final is None or r.n_seen >= final.n_seen:
            final = r
    assert final.n_seen == 10
    assert final.max_cusum == smax
    assert final.n_alarms == alarms
    assert final.first_alarm_seq == first


def test_streaming_reservoir_converges_to_batch_draw(spark, tmp_path):
    """Merge-and-truncate top-n across batch seams equals the batch
    per-group A-ES draw regardless of how rows split into batches."""
    from bano_spark.operators.selection import (aes_group_key,
                                                weighted_sample_per_group)
    from bano_spark.streaming.stateful import streaming_reservoir

    rows = [("s1", i, 10 + (i * 7) % 50) for i in range(40)] \
        + [("s2", i + 100, 5 + (i * 3) % 30) for i in range(25)]
    src = tmp_path / "feed"
    src.mkdir()
    pd.DataFrame(rows[:30], columns=["source", "doc_id", "n_chars"]) \
        .to_parquet(src / "f1.parquet")
    pd.DataFrame(rows[30:], columns=["source", "doc_id", "n_chars"]) \
        .to_parquet(src / "f2.parquet")
    feed = (spark.readStream
            .schema("source string, doc_id long, n_chars long")
            .option("maxFilesPerTrigger", 1).parquet(str(src)))
    keyed = feed.select(
        "source", "doc_id", F.col("n_chars").cast("double").alias("w"),
        aes_group_key("source", "doc_id", "n_chars").alias("sample_key"))
    out = streaming_reservoir(keyed.groupBy("source"), n=5,
                              weight_col="w")
    q = (out.writeStream.format("memory").queryName("res_test")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    final = {}
    for r in spark.table("res_test").collect():
        prev = final.get(r.source)
        if prev is None or r.n_seen >= prev[0]:
            final[r.source] = (r.n_seen, sorted(r.ids))

    batch_df = spark.createDataFrame(rows,
                                     "source string, doc_id long, "
                                     "n_chars long")
    expected = {}
    for r in weighted_sample_per_group(batch_df, "n_chars", 5,
                                       "source").collect():
        expected.setdefault(r["source"], []).append(r["doc_id"])
    assert final["s1"][1] == sorted(expected["s1"])
    assert final["s2"][1] == sorted(expected["s2"])
    assert final["s1"][0] == 40 and final["s2"][0] == 25
