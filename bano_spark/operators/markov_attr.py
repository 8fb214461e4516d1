"""Markov-chain (removal-effect) multi-touch attribution.

Anderl et al. 2014: model journeys as a first-order chain over
START -> channels -> CONV/NULL; a channel's contribution is its
removal effect RE(c) = 1 - p_removed(START) / p_full(START), where
the removed chain redirects every transition INTO c to NULL; shares
normalize RE over channels.  Conversion probability is evaluated to a
FIXED horizon H of synchronous value-iteration steps (absorbing
CONV = 1, NULL = 0) — a documented truncation with geometric
convergence (kernel-tested against the exact fixpoint).

Float discipline: states are INTEGER-INDEXED and the whole solve is
ONE fold — per step, each state's update folds the (src, dst,
cnt)-sorted transition array, so every double addition happens in the
same order on every engine/topology; p is bit-identical, no rounding
games needed.

Ref parity: wave-88 Shapley credits channel SETS; the Markov model
credits SEQUENTIAL structure — together they bracket the reference's
static source-priority weights (bano/models.py poids).

Scale shape: journeys reduce to the O(states^2) transition-count
table in one hash aggregate; the solve then runs on a model-sized
array (a few dozen cells) inside a single JVM expression.  At 10^12
events the only data-sized work is that first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chain_conversion_prob(trans: DataFrame, *, n_states: int,
                          start: int, conv: int, null: int,
                          horizon: int) -> DataFrame:
    """trans: (src, dst, cnt) integer-indexed. Returns a 1-row frame
    (p_start double) after `horizon` synchronous steps."""
    row = F.struct(F.col("src").cast("bigint").alias("src"),
                   F.col("dst").cast("bigint").alias("dst"),
                   F.col("cnt").cast("bigint").alias("cnt"))
    ta = trans.agg(F.array_sort(F.collect_list(row)).alias("ta"))
    fold = F.expr(f"""
        aggregate(
          sequence(1, {horizon}),
          transform(sequence(0, {n_states - 1}),
                    i -> IF(i = {conv}, CAST(1.0 AS DOUBLE),
                            CAST(0.0 AS DOUBLE))),
          (p, t) -> transform(sequence(0, {n_states - 1}), s ->
            CASE WHEN s = {conv} THEN CAST(1.0 AS DOUBLE)
                 WHEN s = {null} THEN CAST(0.0 AS DOUBLE)
                 ELSE aggregate(ta,
                        named_struct('num', CAST(0.0 AS DOUBLE),
                                     'den', CAST(0.0 AS DOUBLE)),
                        (b, e) -> IF(e.src = s,
                          named_struct('num', b.num + e.cnt
                            * element_at(p, CAST(e.dst AS INT) + 1),
                                       'den', b.den + e.cnt),
                          named_struct('num', b.num + CAST(0.0
                            AS DOUBLE), 'den', b.den)),
                        b -> IF(b.den > 0, b.num / b.den,
                                CAST(0.0 AS DOUBLE))) END),
          p -> element_at(p, {start + 1}))
    """)
    return ta.select(fold.alias("p_start"))


def markov_removal_attribution(trans: DataFrame,
                               channel_idx: list[int],
                               channel_names: list[str], *,
                               n_states: int, start: int, conv: int,
                               null: int,
                               horizon: int = 12) -> DataFrame:
    """Returns one row per channel: (channel, p_full, p_removed,
    removal_effect, share)."""
    kw = dict(n_states=n_states, start=start, conv=conv, null=null,
              horizon=horizon)
    p_full = chain_conversion_prob(trans, **kw) \
        .select(F.col("p_start").alias("p_full"))
    rows = []
    for ci, cn in zip(channel_idx, channel_names):
        red = (trans.filter(F.col("src") != ci)
               .select("src",
                       F.when(F.col("dst") == ci, F.lit(null))
                       .otherwise(F.col("dst")).alias("dst"), "cnt")
               .groupBy("src", "dst")
               .agg(F.sum("cnt").cast("bigint").alias("cnt")))
        pr = chain_conversion_prob(red, **kw).select(
            F.lit(cn).alias("channel"),
            F.col("p_start").alias("p_removed"))
        rows.append(pr)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    j = out.crossJoin(F.broadcast(p_full)).withColumn(
        "removal_effect",
        F.lit(1.0) - F.col("p_removed") / F.col("p_full"))
    # deterministic total: fold channel REs in channel-name order
    tot = j.agg(F.array_sort(F.collect_list(
        F.struct("channel", "removal_effect"))).alias("a")) \
        .select(F.expr(
            "aggregate(a, CAST(0.0 AS DOUBLE), "
            "(s, r) -> s + r.removal_effect, s -> s)")
            .alias("re_total"))
    return (j.crossJoin(F.broadcast(tot))
            .select("channel",
                    (F.col("p_full") + F.lit(0.0)).alias("p_full"),
                    (F.col("p_removed") + F.lit(0.0))
                    .alias("p_removed"),
                    (F.col("removal_effect") + F.lit(0.0))
                    .alias("removal_effect"),
                    (F.col("removal_effect") / F.col("re_total")
                     + F.lit(0.0)).alias("share"))
            .orderBy("channel"))
