"""Alias-method table construction (Walker 1977, Vose 1991) — the
O(1)-per-draw weighted-sampling structure a trillion-row sampler
precomputes per stratum, completing weighted_sample / dsir /
stratified_sample (which pay O(log n) or a full scan per draw; the
alias table pays two array reads).

Vose's worklist runs as ONE fold per group over a fixed n-step
sequence: state (q scaled-probability vector, small FIFO, large
FIFO, flattened output triples); each step pairs the head small
index s with the head large index l, emits (s, q_s, l), folds
q_l <- (q_l + q_s) - 1, and re-queues l at the BACK of whichever
queue its new mass selects (the published deterministic tie-break of
this operator — classic stacks give a different but equally valid
table). Exhausted queues make remaining steps no-ops; leftovers emit
(i, 1, i). Queue updates are slice+concat (index-free, so the DuckDB
list replay is textually parallel — DuckDB lacks index-aware
list_transform).

Correctness invariant (the audit operator): for every index i,
(p_i + sum_{j: alias_j = i} (1 - p_j)) / n reconstructs w_i / W to
float precision — computed by an in-array fixed-order fold, never a
cross-row double sum.

Scale shape: two groupBys build the per-group weight vector; the
construction is O(n) fold work on O(groups) rows; n (categories per
stratum) is model-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["alias_table", "alias_mass_audit"]

_EMPTY = "slice(array(CAST(0 AS DOUBLE)), 1, 0)"


def _fold(n_expr: str = "size(ws)") -> str:
    qs = "element_at(s.q, CAST(s.sm[0] AS INT))"
    qlp = (f"(element_at(s.q, CAST(s.lg[0] AS INT)) + {qs}) - 1.0")
    upd_q = ("concat(concat(slice(s2.q, 1, CAST(x.li AS INT) - 1), "
             "array(x.qlp)), "
             "slice(s2.q, CAST(x.li AS INT) + 1, size(s2.q)))")
    new_sm = ("concat(slice(s2.sm, 2, size(s2.sm)), "
              "IF(x.qlp < 1.0, array(x.li), " + _EMPTY + "))")
    new_lg = ("IF(x.qlp < 1.0, slice(s2.lg, 2, size(s2.lg)), "
              "concat(slice(s2.lg, 2, size(s2.lg)), array(x.li)))")
    new_out = "concat(s2.out, array(x.si, x.qs, x.li))"
    return f"""
      aggregate(sequence(1, {n_expr}),
        named_struct('q', qs0, 'sm', sm0, 'lg', lg0,
                     'out', {_EMPTY}),
        (s, step) -> IF(size(s.sm) > 0 AND size(s.lg) > 0,
          aggregate(array(named_struct(
              'si', s.sm[0], 'li', s.lg[0],
              'qs', {qs}, 'qlp', {qlp})), s,
            (s2, x) -> named_struct(
              'q', {upd_q}, 'sm', {new_sm}, 'lg', {new_lg},
              'out', {new_out})),
          s))"""


def _frame(df: DataFrame, grp: str, key: str) -> DataFrame:
    freq = (df.groupBy(F.col(grp).alias("g"),
                       F.col(key).cast("bigint").alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    d = (freq.groupBy("g")
         .agg(F.expr("array_sort(collect_list(struct(k, c)))")
              .alias("vc"))
         .withColumn("ks", F.expr("transform(vc, x -> x.k)"))
         .withColumn("ws", F.expr("transform(vc, x -> "
                                  "CAST(x.c AS DOUBLE))"))
         # NB: Spark resolves identifiers case-insensitively — a column
         # named W is shadowed by a lambda param w, so: wtot / wv
         .withColumn("wtot", F.expr("aggregate(ws, CAST(0 AS DOUBLE), "
                                    "(t, wv) -> t + wv)"))
         .withColumn("qs0", F.expr(
             "transform(ws, wv -> "
             "CAST(size(ws) AS DOUBLE) * wv / wtot)"))
         .withColumn("sm0", F.expr(
             "filter(transform(sequence(1, size(ws)), "
             "i -> CAST(i AS DOUBLE)), "
             "i -> element_at(qs0, CAST(i AS INT)) < 1.0)"))
         .withColumn("lg0", F.expr(
             "filter(transform(sequence(1, size(ws)), "
             "i -> CAST(i AS DOUBLE)), "
             "i -> NOT (element_at(qs0, CAST(i AS INT)) < 1.0))"))
         .withColumn("st", F.expr(_fold())))
    # final = emitted triples ++ leftovers (i, 1, i), flattened
    return d.withColumn("fin", F.expr(
        "concat(st.out, flatten(transform(concat(st.sm, st.lg), "
        "i -> array(i, CAST(1 AS DOUBLE), i))))"))


def alias_table(df: DataFrame, grp: str, key: str) -> DataFrame:
    """Returns one row per category: (grp, key, prob, alias_key) —
    prob is the within-cell acceptance probability, alias_key the
    fallback draw."""
    d = _frame(df, grp, key)
    tri = ("transform(sequence(1, size(fin) DIV 3), t -> named_struct("
           "'i', element_at(fin, CAST(3 * t - 2 AS INT)), "
           "'p', element_at(fin, CAST(3 * t - 1 AS INT)), "
           "'a', element_at(fin, CAST(3 * t AS INT))))")
    return (d.select("g", "ks", F.explode(F.expr(tri)).alias("e"))
            .select(F.col("g").alias(grp),
                    F.expr("element_at(ks, CAST(e.i AS INT))")
                    .alias("key"),
                    F.round("e.p", 6).alias("prob"),
                    F.expr("element_at(ks, CAST(e.a AS INT))")
                    .alias("alias_key"))
            .orderBy(grp, "key"))


def alias_mass_audit(df: DataFrame, grp: str, key: str, *,
                     tol: float = 1e-9) -> DataFrame:
    """Per category: reconstructed sampling mass vs the true w/W.
    Returns (grp, key, p_true, mass, abs_err, ok). The mass fold
    walks the emitted triples in construction order — fixed-order
    IEEE, no cross-row sums."""
    d = _frame(df, grp, key)
    mass = ("transform(sequence(1, size(ws)), i -> "
            "(get(filter(" + _TRI + ", e -> e.i = CAST(i AS DOUBLE)), "
            "0).p "
            "+ aggregate(" + _TRI + ", CAST(0 AS DOUBLE), "
            "(t, e) -> t + IF(e.a = CAST(i AS DOUBLE) "
            "AND e.i <> CAST(i AS DOUBLE), 1.0 - e.p, 0.0))) "
            "/ CAST(size(ws) AS DOUBLE))")
    d = d.withColumn("mass", F.expr(mass))
    rows = ("transform(sequence(1, size(ws)), i -> named_struct("
            "'k', element_at(ks, CAST(i AS INT)), "
            "'pt', element_at(ws, CAST(i AS INT)) / wtot, "
            "'m', element_at(mass, CAST(i AS INT))))")
    return (d.select("g", F.explode(F.expr(rows)).alias("e"))
            .select(F.col("g").alias(grp), F.col("e.k").alias("key"),
                    F.round("e.pt", 6).alias("p_true"),
                    F.round("e.m", 6).alias("mass"),
                    F.round(F.abs(F.col("e.m") - F.col("e.pt")), 9)
                    .alias("abs_err"),
                    (F.abs(F.col("e.m") - F.col("e.pt"))
                     < F.lit(float(tol))).alias("ok"))
            .orderBy(grp, "key"))


_TRI = ("transform(sequence(1, size(fin) DIV 3), t -> named_struct("
        "'i', element_at(fin, CAST(3 * t - 2 AS INT)), "
        "'p', element_at(fin, CAST(3 * t - 1 AS INT)), "
        "'a', element_at(fin, CAST(3 * t AS INT))))")
