"""Measure the bloom-pruned join's shuffle reduction.

Regime: probe >> build, build ABOVE the broadcast threshold (the case
runtime bloom / explicit pruning exists for — a broadcastable build
side needs no bloom). Broadcast joins are disabled so both variants
plan a shuffled join; the bloom variant filters the probe BEFORE its
shuffle, so the probe exchange carries only true-matches + false
positives instead of every row.

Reports wall time, rows entering the join shuffle (the shuffle-volume
proxy: rows x fixed row width), and asserts both variants produce
identical results.

Usage: python tools/bench_bloom.py [probe_rows] [build_keys] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bano_spark.operators.bloom import bloom_might_contain, build_bloom_words
from bano_spark.session import get_session


def main() -> None:
    probe_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    build_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pad_bytes = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    spark = get_session("bench-bloom", cpus=cpus, shuffle_partitions=cpus * 4,
                        extra={"spark.sql.autoBroadcastJoinThreshold": "-1"})
    spark.sparkContext.setLogLevel("ERROR")

    # probe: key space 100x the build keyspace -> ~1% of rows match
    probe = (spark.range(probe_rows)
             .select((F.col("id") * 2654435761 % (build_keys * 100))
                     .cast("long").alias("k"),
                     F.col("id").alias("payload")))
    if pad_bytes:
        # webtext regime: wide rows make the shuffle the cost center
        probe = probe.withColumn("pad", F.repeat(F.lit("x"), pad_bytes))
    build = (spark.range(build_keys)
             .select((F.col("id") * 97 % (build_keys * 100))
                     .cast("long").alias("k"))
             .distinct())

    def agg(df):
        # sum(length(pad)) forces the pad column THROUGH the join
        # shuffle (a payload-free agg would let Catalyst prune it and
        # the wide-row regime would silently vanish)
        aggs = [F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")]
        if pad_bytes:
            aggs.append(F.sum(F.length("pad")).alias("p"))
        r = df.groupBy().agg(*aggs).first()
        return (r["n"], r["s"])

    def timed(fn, reps=3):
        runs = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            runs.append(time.time() - t0)
        return out, sorted(runs)[reps // 2], runs

    # warm both paths once (JIT; each executor compiles the codegen)
    agg(probe.join(build, "k"))
    build_bloom_words(build, "k", num_bits=1 << 17)

    plain, t_plain, runs_plain = timed(lambda: agg(probe.join(build, "k")))
    words, t_build, _ = timed(
        lambda: build_bloom_words(build, "k", num_bits=1 << 17))
    pruned = probe.filter(bloom_might_contain(words, F.col("k")))
    bloomed, t_probe, runs_bloom = timed(lambda: agg(pruned.join(build, "k")))
    t_bloom = t_build + t_probe

    shuffled_rows = pruned.count()
    assert plain == bloomed, (plain, bloomed)

    print(json.dumps({
        "metric": "bloom_pruned_join",
        "probe_rows": probe_rows,
        "build_keys": build_keys,
        "matching_rows": plain[0],
        "probe_rows_into_shuffle_plain": probe_rows,
        "probe_rows_into_shuffle_bloom": shuffled_rows,
        "shuffle_row_reduction_x": round(probe_rows / max(shuffled_rows, 1), 1),
        "pad_bytes": pad_bytes,
        "wall_plain_sec": round(t_plain, 2),
        "wall_bloom_sec": round(t_bloom, 2),
        "wall_bloom_build_sec": round(t_build, 2),
        "runs_plain_sec": [round(r, 2) for r in runs_plain],
        "runs_bloom_sec": [round(r, 2) for r in runs_bloom],
        "outputs_identical": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
