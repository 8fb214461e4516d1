"""Choropleth classification schemes — the cartographic classing
step every BANO-style per-commune statistic needs before it can be
mapped (reference analogue: the adm_weight / importance bucketing the
reference feeds its rendering exports, bano/sql M1-M3): Jenks natural
breaks (exact dynamic program over the value histogram), equal
intervals, quantile classes, and head/tail breaks (Jiang 2013) for
heavy-tailed data.

Scale shape: every scheme collapses the data to ONE row per distinct
(quantized) value first — map-side combine carries the reduction, the
classing math runs on the bounded histogram. Jenks' DP is O(V^2) per
stage on that histogram (V = distinct values, the same disclosed
bounded-candidate contract as the silhouette / Kendall families), with
localCheckpoint per stage keeping lineage flat. All DP arithmetic is
exact-integer prefix sums with one double division per cell, so
opt values — and therefore the chosen breaks — are bit-identical
across engines (ties broken on the smallest split index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .selection import distributed_cumsum


def _histogram(df: DataFrame, value_col: str) -> DataFrame:
    """(_v, _c) counts per distinct INTEGER value, with 1-based rank
    _i and inclusive prefix sums _W (count), _S (sum), _Q (sum of
    squares) — all exact longs."""
    h = (df.select(F.col(value_col).cast("long").alias("_v"))
         .filter(F.col("_v").isNotNull())
         .groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
         .withColumn("_one", F.lit(1))
         .withColumn("_cv", F.col("_c") * F.col("_v"))
         .withColumn("_cvv", F.col("_c") * F.col("_v") * F.col("_v")))
    h = distributed_cumsum(h, "_v", [F.asc("_v")], "_one", out_col="_i")
    h = distributed_cumsum(h, "_v", [F.asc("_v")], "_c", out_col="_W")
    h = distributed_cumsum(h, "_v", [F.asc("_v")], "_cv", out_col="_S")
    h = distributed_cumsum(h, "_v", [F.asc("_v")], "_cvv", out_col="_Q")
    return h.select("_v", "_i", "_W", "_S", "_Q")


def jenks_natural_breaks(df: DataFrame, value_col: str, k: int = 4, *,
                         round_to: int = 6) -> DataFrame:
    """Exact Jenks natural-breaks classification (Fisher's optimal
    1-D k-segmentation: contiguous classes minimizing total
    within-class sum of squared deviations) over an INTEGER-valued
    column — quantize floats upstream (floor / cents-cast), which is
    also what keeps the DP bit-identical across engines.

    Relational DP: stage j's table opt_j(i) = best SSE of the first i
    distinct values in j classes is built from stage j-1 by a bounded
    non-equi join against the prefix-sum histogram
    (SSE(m+1..i) = (Q_i-Q_m) - (S_i-S_m)^2/(W_i-W_m)), argmin taken as
    min(struct(value, m)) — smallest split on ties. Breaks backtrack
    through k-1 one-row joins. Returns k rows
    (class, upper_bound, gvf) where gvf = 1 - SSE_k/SSE_1 is the
    goodness-of-variance fit (constant across rows)."""
    if k < 2:
        raise ValueError("jenks_natural_breaks: k must be >= 2")
    p = _histogram(df, value_col).localCheckpoint(eager=False)
    d1 = p.select(
        F.col("_i").alias("i"),
        (F.col("_Q") - F.col("_S") * F.col("_S") / F.col("_W"))
        .alias("opt"),
        F.lit(0).cast("long").alias("m"))
    dps = {1: d1}
    for j in range(2, k + 1):
        prev = (dps[j - 1].filter(F.col("i") >= j - 1)
                .join(p.select(F.col("_i").alias("_mi"),
                               F.col("_W").alias("_Wm"),
                               F.col("_S").alias("_Sm"),
                               F.col("_Q").alias("_Qm")),
                      F.col("i") == F.col("_mi"))
                .select(F.col("i").alias("_m"), F.col("opt").alias("_po"),
                        "_Wm", "_Sm", "_Qm"))
        sse = ((F.col("_Q") - F.col("_Qm"))
               - (F.col("_S") - F.col("_Sm"))
               * (F.col("_S") - F.col("_Sm"))
               / (F.col("_W") - F.col("_Wm")))
        dps[j] = (p.join(F.broadcast(prev), F.col("_m") < F.col("_i"))
                  .select(F.col("_i").alias("i"),
                          (F.col("_po") + sse).alias("_val"),
                          F.col("_m"))
                  .groupBy("i")
                  .agg(F.min(F.struct(F.col("_val").alias("v"),
                                      F.col("_m").alias("m")))
                       .alias("_b"))
                  .select("i", F.col("_b.v").alias("opt"),
                          F.col("_b.m").alias("m"))
                  .localCheckpoint(eager=False))
    last = p.agg(F.max("_i").alias("i"))
    # backtrack: e_k = V, e_{j-1} = argmin m of stage j at e_j
    ends = {k: last}
    for j in range(k, 1, -1):
        ends[j - 1] = (dps[j]
                       .join(ends[j].select(F.col("i").alias("_e")),
                             F.col("i") == F.col("_e"))
                       .select(F.col("m").alias("i")))
    sse_k = (dps[k].join(last.select(F.col("i").alias("_e")),
                         F.col("i") == F.col("_e"))
             .select(F.col("opt").alias("_sk")))
    sse_1 = (d1.join(last.select(F.col("i").alias("_e")),
                     F.col("i") == F.col("_e"))
             .select(F.col("opt").alias("_s1")))
    parts = []
    for j in range(1, k + 1):
        parts.append(
            ends[j].join(p, F.col("i") == F.col("_i"))
            .select(F.lit(j).alias("class"),
                    F.col("_v").cast("bigint").alias("upper_bound")))
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return (out.crossJoin(F.broadcast(sse_k))
            .crossJoin(F.broadcast(sse_1))
            .select("class", "upper_bound",
                    F.round(1 - F.col("_sk") / F.col("_s1"), round_to)
                    .alias("gvf"))
            .orderBy("class"))


def equal_interval_classes(df: DataFrame, value_col: str,
                           k: int = 5) -> DataFrame:
    """Equal-interval classing: k classes of width (max-min)/k,
    class = min(floor((v - min)/width), k-1). Two aggregation passes
    (min/max scalars broadcast, one groupBy(class)). Returns
    (class, n_values, min_v, max_v) for non-empty classes."""
    v = F.col(value_col).cast("double")
    s = df.select(v.alias("_v")).filter(F.col("_v").isNotNull())
    mm = s.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    cls = F.least(
        F.floor((F.col("_v") - F.col("_lo"))
                / ((F.col("_hi") - F.col("_lo")) / k)),
        F.lit(k - 1)).cast("bigint")
    return (s.crossJoin(F.broadcast(mm))
            .select(cls.alias("class"), "_v")
            .groupBy("class")
            .agg(F.count(F.lit(1)).alias("n_values"),
                 F.min("_v").alias("min_v"), F.max("_v").alias("max_v"))
            .orderBy("class"))


def quantile_classes(df: DataFrame, value_col: str,
                     k: int = 4) -> DataFrame:
    """Quantile (equal-count) classing with deterministic tie
    handling: every row of a tied value lands in the SAME class,
    class = ceil(F(v) * k / n) on the inclusive distinct-value
    cumulative count F — computed with the bucketed distributed
    prefix sum, no global sort. Returns (class, n_values, min_v,
    max_v)."""
    s = (df.select(F.col(value_col).cast("double").alias("_v"))
         .filter(F.col("_v").isNotNull())
         .groupBy("_v").agg(F.count(F.lit(1)).alias("_c")))
    cum = distributed_cumsum(s, "_v", [F.asc("_v")], "_c", out_col="_f")
    tot = s.agg(F.sum("_c").alias("_n"))
    cls = F.floor((F.col("_f") * k + F.col("_n") - 1) / F.col("_n")) \
        .cast("bigint")
    return (cum.crossJoin(F.broadcast(tot))
            .select(cls.alias("class"), "_v", "_c")
            .groupBy("class")
            .agg(F.sum("_c").cast("bigint").alias("n_values"),
                 F.min("_v").alias("min_v"), F.max("_v").alias("max_v"))
            .orderBy("class"))


def head_tail_breaks(df: DataFrame, value_col: str, levels: int = 3, *,
                     round_to: int = 6) -> DataFrame:
    """Head/tail breaks (Jiang 2013) for heavy-tailed distributions:
    split at the mean, recurse into the head, ``levels`` times. Pass
    an INTEGER-quantized column (cents-cast) so the level means are
    exact-sum divisions — bit-identical across engines.

    One aggregation pass per level over a shrinking filter — O(levels)
    scans, no state. Returns one row per level
    (level, break_mean, n_head, head_frac)."""
    v = F.col(value_col).cast("long")
    cur = df.select(v.alias("_v")).filter(F.col("_v").isNotNull())
    out = None
    for lv in range(1, levels + 1):
        agg = cur.agg(
            F.count(F.lit(1)).alias("_n"),
            (F.sum("_v") / F.count(F.lit(1))).alias("_m"))
        head_stats = (cur.crossJoin(F.broadcast(agg))
                      .filter(F.col("_v") > F.col("_m"))
                      .agg(F.lit(lv).alias("level"),
                           F.max("_m").alias("_mm"),
                           F.count(F.lit(1)).alias("n_head"),
                           (F.count(F.lit(1))
                            / F.max("_n").cast("double")).alias("_hf")))
        row = head_stats.select(
            "level", F.round("_mm", round_to).alias("break_mean"),
            F.col("n_head").cast("bigint").alias("n_head"),
            F.round("_hf", round_to).alias("head_frac"))
        out = row if out is None else out.unionByName(row)
        cur = (cur.crossJoin(F.broadcast(
            agg.select(F.col("_m").alias("_cut"))))
            .filter(F.col("_v") > F.col("_cut")).select("_v")
            .localCheckpoint(eager=False))
    return out.orderBy("level")
