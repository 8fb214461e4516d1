"""Scheduling-theory folds — weighted interval scheduling (the DP
optimum, completing interval_scheduling's unweighted greedy) and LPT
multiprocessor makespan (Graham's 4/3-1/(3m) list scheduling) — the
planner layer next to johnson_schedule / cpm / knapsack_01.

Weighted interval scheduling: the classic DP opt[j] = max(opt[j-1],
w_j + opt[p(j)]) over intervals sorted by end, where p(j) is the
number of intervals ending at or before start_j. The p(j) lookup is
precomputed DISTRIBUTEDLY with the stacked-events trick: union
(end, typ=0) marker rows with (start, typ=1) probe rows, one
per-group window ordered by (value, typ, id) whose running count of
markers at each probe row IS p(j) — no self-join, no per-row search.
The fold then walks intervals in end order with an append-only opt
array, so the lookup is element_at(acc, p+1): O(1) per step, O(n)
state. The same pass folds the unweighted by-end greedy to expose
the "greedy is optimal in count, arbitrarily bad in weight" gap.

LPT makespan: jobs sorted by (duration DESC, id) fold through an
m-slot load vector, each job to the least-loaded machine (ties to the
lowest index — the same deterministic slot discipline as
cachesim.cache_replay); output carries the LP lower bound
max(ceil(total/m), max_job) and Graham's 4/3 - 1/(3m) bound check.

Scale shape: one window shuffle + one groupBy shuffle per operator;
all state integer-valued doubles (exact — no rounding anywhere except
the final ratio), no Python, no global exchange. Per-group trace
arrays are the group's size: shard unbounded groups first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["weighted_interval_opt", "lpt_makespan"]


def weighted_interval_opt(df: DataFrame, grp: str, start_col: str,
                          end_col: str, weight_col: str,
                          id_col: str) -> DataFrame:
    """Per group: the DP-optimal total weight of a non-overlapping
    subset (touching endpoints compatible) vs the unweighted by-end
    greedy's count and weight. Returns (grp, n_intervals, opt_weight,
    greedy_count, greedy_weight)."""
    s, e = F.col(start_col).cast("bigint"), F.col(end_col).cast("bigint")
    wgt, i = F.col(weight_col).cast("bigint"), F.col(id_col)
    # positive length is a correctness precondition (p(j) < j needs
    # end > start); enforce rather than document
    df = df.filter(e > s)
    ends = df.select(F.col(grp).alias("g"), e.alias("v"),
                     F.lit(0).alias("typ"), i.alias("id"),
                     F.lit(0).alias("w"), F.lit(0).alias("en"),
                     F.lit(0).alias("st"))
    probes = df.select(F.col(grp).alias("g"), s.alias("v"),
                       F.lit(1).alias("typ"), i.alias("id"),
                       wgt.alias("w"), e.alias("en"), s.alias("st"))
    w = (Window.partitionBy("g")
         .orderBy("v", "typ", "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    stacked = (ends.unionByName(probes)
               .withColumn("p", F.sum(1 - F.col("typ")).over(w))
               .filter(F.col("typ") == 1))
    row = F.struct(F.col("en").cast("double").alias("en"),
                   F.col("st").cast("double").alias("st"),
                   F.col("id").cast("double").alias("id"),
                   F.col("w").cast("double").alias("w"),
                   F.col("p").cast("double").alias("p"))
    agged = stacked.groupBy("g").agg(
        F.array_sort(F.collect_list(row)).alias("iv"))
    dp = F.expr("""
      aggregate(iv, array(CAST(0 AS DOUBLE)),
        (a, v) -> concat(a, array(greatest(
          element_at(a, size(a)),
          v.w + element_at(a, CAST(v.p AS INT) + 1)))))""")
    greedy = F.expr("""
      aggregate(iv,
        named_struct('last', CAST(-1e18 AS DOUBLE),
                     'c', CAST(0 AS DOUBLE), 'wt', CAST(0 AS DOUBLE)),
        (s, v) -> IF(v.st >= s.last,
          named_struct('last', v.en, 'c', s.c + 1.0,
                       'wt', s.wt + v.w),
          s))""")
    return (agged.select(F.col("g").alias(grp),
                         F.size("iv").cast("bigint").alias("n_intervals"),
                         dp.alias("_dp"), greedy.alias("_gr"))
            .select(grp, "n_intervals",
                    F.expr("element_at(_dp, size(_dp))").cast("bigint")
                    .alias("opt_weight"),
                    F.col("_gr.c").cast("bigint").alias("greedy_count"),
                    F.col("_gr.wt").cast("bigint").alias("greedy_weight")))


def lpt_makespan(df: DataFrame, grp: str, dur_col: str, id_col: str, *,
                 machines: int = 4) -> DataFrame:
    """Per group: LPT list-scheduling makespan on `machines` identical
    machines vs the LP lower bound. Returns (grp, n_jobs, total_dur,
    max_dur, makespan, lower_bound, ratio, ratio_le_lpt_bound).

    Note: Graham's 4/3 - 1/(3m) guarantee is against OPT; the ratio
    here divides by the LP lower bound <= OPT, so a False flag is not
    a violated theorem — it measures LB slack (the kernel test pins a
    case where LB < OPT makes the flag False legitimately)."""
    if not 2 <= machines <= 8:
        raise ValueError("lpt_makespan: machines must be in 2..8")
    m = machines
    d = F.col(dur_col).cast("bigint")
    row = F.struct((-d).cast("double").alias("nd"),
                   F.col(id_col).cast("double").alias("id"))
    agged = df.groupBy(F.col(grp).alias("g")).agg(
        F.array_sort(F.collect_list(row)).alias("js"),
        F.sum(d).alias("total_dur"), F.max(d).alias("max_dur"),
        F.count(F.lit(1)).cast("bigint").alias("n_jobs"))
    init = ", ".join(f"'l{i}', CAST(0 AS DOUBLE)" for i in range(1, m + 1))
    conds = []
    for i in range(1, m + 1):
        c = " AND ".join(f"s.l{i} <= s.l{j}" for j in range(i + 1, m + 1))
        conds.append(f"WHEN {c} THEN {i}" if c else f"ELSE {i}")
    idx = "CASE " + " ".join(conds[:-1]) + " " + conds[-1] + " END"
    fields = ", ".join(
        f"'l{i}', IF({idx} = {i}, s.l{i} + (0.0 - v.nd), s.l{i})"
        for i in range(1, m + 1))
    fold = (f"aggregate(js, named_struct({init}), "
            f"(s, v) -> named_struct({fields}))")
    mk = ("greatest(" + ", ".join(f"_st.l{i}" for i in range(1, m + 1))
          + ")")
    # DIV (integer division) — NOT double-divide-then-cast, whose
    # truncation (Spark) vs rounding (DuckDB) semantics differ
    lb = F.greatest(F.expr(f"(total_dur + {m - 1}) DIV {m}"),
                    F.col("max_dur"))
    out = (agged.withColumn("_st", F.expr(fold))
           .withColumn("makespan", F.expr(mk).cast("bigint"))
           .withColumn("lower_bound", lb))
    ratio = (F.col("makespan").cast("double")
             / F.col("lower_bound").cast("double"))
    bound = 4.0 / 3.0 - 1.0 / (3.0 * m)
    return out.select(
        F.col("g").alias(grp), "n_jobs", "total_dur", "max_dur",
        "makespan", "lower_bound",
        F.round(ratio, 6).alias("ratio"),
        (ratio <= F.lit(bound) + F.lit(1e-12))
        .alias("ratio_le_lpt_bound"))
