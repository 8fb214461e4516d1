"""External-sort planning — natural (ascending) run statistics and
the k-way merge-pass advisor — the spill-aware operator the engine's
own shuffle story leans on: how many sorted runs does this stream
already contain, and how many merge passes does a fan-in-k external
sort need?

The scalable trick (and the reason this operator exists as a
pattern): counting GLOBAL natural runs needs every adjacent pair
compared, but a global lag window is a single-partition funnel. So
the sequence is CHUNKED on a key prefix (id DIV chunk): within-chunk
breaks come from per-chunk lag windows (partition-bounded), and the
chunk-boundary breaks compare each chunk's last value with the NEXT
NON-EMPTY chunk's first value (min_by/max_by on the unique order
key) — runs = 1 + sum(in-chunk breaks) + sum(boundary breaks),
exactly, even when the order key is sparse enough that whole chunks
are empty (a naive c -> c+1 equi-join would skip the c -> c+2
boundary and undercount). The boundary pass is the repo's bounded
aggregate-slice idiom: ONE scalar aggregate collects the sorted
(c, first, last) chunk-summary array — O(n/chunk) entries, 24 B
each; raise `chunk` so it fits (chunk=2^20 at 10^12 rows is a 24 MB
state) — and an integer fold counts next.first < cur.last over
consecutive entries. No global sort/window exchange anywhere.

Merge passes: p(k) = ceil(log_k runs) computed EXACTLY by an integer
fold (double k's power until it covers runs — no log/ceil float
edge), so fan-in advice never suffers a log-precision off-by-one.

All integers end-to-end; the only division is avg run length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["natural_runs_per_key", "merge_pass_advisor"]


def natural_runs_per_key(df: DataFrame, key: str, order: str,
                         val: str) -> DataFrame:
    """Per key: ascending-run stats of the value sequence. Returns
    (key, n, n_runs, avg_run_len, longest_run)."""
    w = Window.partitionBy(key).orderBy(order)
    d = (df.select(F.col(key).alias("k"), F.col(order).alias("o"),
                   F.col(val).cast("bigint").alias("v"))
         .withColumn("brk", F.when(
             F.col("v") < F.lag("v").over(w), 1).otherwise(0))
         .withColumn("rid", F.sum("brk").over(
             w.rowsBetween(Window.unboundedPreceding, 0))))
    runs = (d.groupBy("k", "rid")
            .agg(F.count(F.lit(1)).cast("bigint").alias("rl")))
    return (runs.groupBy(F.col("k").alias(key))
            .agg(F.sum("rl").cast("bigint").alias("n"),
                 F.count(F.lit(1)).cast("bigint").alias("n_runs"),
                 F.max("rl").cast("bigint").alias("longest_run"))
            .select(key, "n", "n_runs",
                    F.round(F.col("n").cast("double")
                            / F.col("n_runs").cast("double"), 6)
                    .alias("avg_run_len"), "longest_run"))


def merge_pass_advisor(df: DataFrame, order: str, val: str, *,
                       chunk: int = 512,
                       fanins: list[int] = (2, 4, 8, 16)) -> DataFrame:
    """Global natural-run count via the chunked-window + boundary-join
    pattern, then exact merge passes per fan-in. Returns one row per
    fan-in: (fan_in, n_rows, n_runs, passes)."""
    d = df.select(F.col(order).cast("bigint").alias("o"),
                  F.col(val).cast("bigint").alias("v")) \
        .withColumn("c", F.expr(f"o DIV {chunk}"))
    w = Window.partitionBy("c").orderBy("o")
    per = (d.withColumn("brk", F.when(
        F.col("v") < F.lag("v").over(w), 1).otherwise(0))
        .groupBy("c")
        .agg(F.sum("brk").cast("bigint").alias("cb"),
             F.min_by("v", "o").alias("fv"),
             F.max_by("v", "o").alias("lv"),
             F.count(F.lit(1)).cast("bigint").alias("cn")))
    # boundary breaks between consecutive NON-EMPTY chunks — a
    # (c, c+1) equi-join would miss the boundary across an empty
    # chunk and undercount n_runs; a global lead window would be a
    # single-partition funnel. Instead: one scalar aggregate collects
    # the sorted chunk-summary array (O(n/chunk), disclosed) and an
    # integer fold counts next.fv < cur.lv pairs.
    tot = per.agg(
        F.sum("cn").cast("bigint").alias("n_rows"),
        F.sum("cb").cast("bigint").alias("icb"),
        F.array_sort(F.collect_list(F.struct("c", "fv", "lv")))
        .alias("bnd"))
    # sequence(2, 1) counts DOWN in Spark — guard the <2-chunk case
    bb = ("IF(size(bnd) < 2, CAST(0 AS BIGINT), "
          "aggregate(sequence(2, size(bnd)), CAST(0 AS BIGINT), "
          "(s, i) -> s + IF(element_at(bnd, i).fv "
          "< element_at(bnd, i - 1).lv, "
          "CAST(1 AS BIGINT), CAST(0 AS BIGINT))))")
    tot = tot.select(
        "n_rows",
        (F.lit(1) + F.col("icb") + F.expr(bb)).cast("bigint")
        .alias("n_runs"))
    structs = []
    for k in fanins:
        # exact ceil(log_k runs): double k's power until >= runs
        p = (f"aggregate(sequence(1, 40), "
             f"named_struct('p', CAST(0 AS BIGINT), "
             f"'pw', CAST(1 AS BIGINT)), "
             f"(s, i) -> IF(s.pw >= n_runs, s, "
             f"named_struct('p', s.p + CAST(1 AS BIGINT), "
             f"'pw', s.pw * {k}))).p")
        structs.append(f"named_struct('fan_in', {k}, 'passes', {p})")
    return (tot.select("n_rows", "n_runs",
                       F.explode(F.expr("array("
                                        + ", ".join(structs) + ")"))
                       .alias("x"))
            .select(F.col("x.fan_in").alias("fan_in"), "n_rows",
                    "n_runs", F.col("x.passes").alias("passes"))
            .orderBy("fan_in"))
