"""Lossy Counting (Manku & Motwani, VLDB 2002) — the deterministic
ε-deficient heavy-hitter sketch, completing the frequency-sketch
family next to misra_gries_heavy_hitters (which bounds SPACE by k)
and count-min (which is randomized): lossy counting bounds ERROR by
ε = 1/w with a provable underestimate ≤ floor(N/w) and survives any
stream order — the properties the audit query checks against exact
counts.

Mechanics: per group, ONE fold over the time-sorted stream with state
(position, entry array of (key, count, delta)): each element
increments its entry or inserts (k, 1, b_cur - 1); at every bucket
boundary (pos % w == 0) entries with count + delta <= b_cur are
pruned. All state is integer-valued doubles — exact, order-free of
float concerns; the DuckDB oracle replays the identical logic over a
flat list-of-lists accumulator (layout differs, transition function
is semantically identical, and every quantity is an exact integer).

Scale shape: one groupBy shuffle on the stream key; fold state is
bounded by the classic (1/eps) * log(eps * N) space guarantee (also
audited); the final bound check is a broadcast-sized join of the
exploded sketch against exact per-key counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["lossy_count_sketch", "lossy_hitters_audit"]


def _fold(w: int) -> str:
    wd = f"{float(w)!r}"
    bcur = f"CAST(floor((s.pos + 1.0 + {wd} - 1.0) / {wd}) AS DOUBLE)"
    ins = (f"concat(s.es, array(named_struct("
           f"'k', v.k, 'c', CAST(1 AS DOUBLE), 'd', x.b - 1.0)))")
    upd = ("transform(s.es, e -> IF(e.k = v.k, "
           "named_struct('k', e.k, 'c', e.c + 1.0, 'd', e.d), e))")
    return f"""
      aggregate(tr,
        named_struct('pos', CAST(0 AS DOUBLE),
          'es', CAST(array() AS array<struct<k: double, c: double,
                                            d: double>>)),
        (s, v) -> aggregate(
          array(named_struct('b', {bcur})), s,
          (s2, x) -> aggregate(
            array(IF(exists(s2.es, e -> e.k = v.k), {upd.replace("s.es", "s2.es")},
                     {ins.replace("s.es", "s2.es")})),
            s2,
            (s3, es1) -> named_struct(
              'pos', s3.pos + 1.0,
              'es', IF(CAST(s3.pos + 1.0 AS BIGINT) % {w} = 0,
                       filter(es1, e -> e.c + e.d > x.b), es1)))))"""


def lossy_count_sketch(df: DataFrame, grp: str, t_col: str,
                       key_col: str, *, w: int = 50) -> DataFrame:
    """Run the sketch per group; returns one row per SURVIVING entry
    (grp, key, est_count, delta) plus the group's stream length
    n_stream. ε = 1/w."""
    if w < 2:
        raise ValueError("lossy_count_sketch: w must be >= 2")
    row = F.struct(F.col(t_col).cast("double").alias("t"),
                   F.col(key_col).cast("double").alias("k"))
    agged = (df.groupBy(F.col(grp).alias("g"))
             .agg(F.array_sort(F.collect_list(row)).alias("tr")))
    st = F.expr(_fold(w))
    return (agged.select("g", F.size("tr").cast("bigint")
                         .alias("n_stream"), st.alias("_st"))
            .select("g", "n_stream",
                    F.explode(F.col("_st.es")).alias("e"))
            .select(F.col("g").alias(grp), "n_stream",
                    F.col("e.k").cast("bigint").alias("key"),
                    F.col("e.c").cast("bigint").alias("est_count"),
                    F.col("e.d").cast("bigint").alias("delta")))


def lossy_hitters_audit(df: DataFrame, grp: str, t_col: str,
                        key_col: str, *, w: int = 50,
                        support: float = 0.05) -> DataFrame:
    """Report keys the sketch certifies at `support` (est >= (s-ε)N)
    joined with exact counts: the deficiency guarantees est <= true
    and true - est <= floor(N/w), both audited as columns. Returns
    (grp, key, est_count, true_count, underestimate, max_allowed,
    within_bound, true_is_frequent)."""
    sk = lossy_count_sketch(df, grp, t_col, key_col, w=w)
    exact = (df.groupBy(F.col(grp).alias("_g"),
                        F.col(key_col).cast("bigint").alias("_k"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("true_count")))
    thresh = ((F.lit(float(support)) - 1.0 / w)
              * F.col("n_stream").cast("double"))
    cand = sk.filter(F.col("est_count").cast("double") >= thresh)
    j = cand.join(exact, (F.col(grp) == F.col("_g"))
                  & (F.col("key") == F.col("_k")))
    max_allowed = F.expr(f"n_stream DIV {w}")
    return (j.select(
        grp, "key", "est_count", "true_count",
        (F.col("true_count") - F.col("est_count")).alias("underestimate"),
        max_allowed.alias("max_allowed"),
        ((F.col("est_count") <= F.col("true_count"))
         & (F.col("true_count") - F.col("est_count") <= max_allowed))
        .alias("within_bound"),
        (F.col("true_count").cast("double")
         >= F.lit(float(support)) * F.col("n_stream").cast("double"))
        .alias("true_is_frequent")))
