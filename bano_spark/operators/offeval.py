"""Counterfactual ranker/policy evaluation.

``ips_policy_value`` — inverse-propensity-scored offline evaluation
(Horvitz-Thompson; Bottou et al. 2013): with uniform logging over k
actions, the value of a deterministic target policy pi is estimated
by IPS = (k/n) sum r_i [pi(x_i) = a_i] and the self-normalized
SNIPS = sum r_i w_i / sum w_i (w_i = k [pi(x_i) = a_i]).  Uniform
propensities make both estimators single divisions of exact integer
sums.

``team_draft_interleave`` — Radlinski, Kurup & Joachims (CIKM 2008):
to compare two rankers online, interleave their lists per query with
team-draft drafting (a deterministic hash coin decides which team
picks first each round), attribute clicks to the team that
contributed the clicked doc, and count per-query wins.  The draft and
attribution run as one integer fold per query.

Ref parity: the reference A/B-compares address-source priority orders
by diffing per-commune match counts between runs (stats.sql deltas);
interleaving and IPS are the modern unbiased versions of that
comparison.

Scale shape: IPS is one filtered aggregate.  Interleaving is the
session-fold contract — per-query state is the two ranked lists plus
the drafted set (bounded by list length), clicks join positionally,
and the verdict rollup is one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ips_policy_value(logged: DataFrame, action_col: str,
                     reward_col: str, target_col: str, *,
                     k: int) -> DataFrame:
    """logged rows: (action, reward, target action).  Returns one row
    (n, n_matched, matched_reward, direct, ips, snips)."""
    match = (F.col(action_col) == F.col(target_col)).cast("bigint")
    r = F.col(reward_col).cast("bigint")
    agg = logged.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(match).cast("bigint").alias("n_matched"),
        F.sum(match * r).cast("bigint").alias("matched_reward"))
    return agg.select(
        "n", "n_matched", "matched_reward",
        (F.col("matched_reward").cast("double")
         / F.greatest(F.col("n_matched"), F.lit(1)) + F.lit(0.0))
        .alias("direct"),
        (F.col("matched_reward").cast("double") * k / F.col("n")
         + F.lit(0.0)).alias("ips"),
        (F.col("matched_reward").cast("double")
         / F.greatest(F.col("n_matched"), F.lit(1)) + F.lit(0.0))
        .alias("snips"))


def team_draft_interleave(rankings: DataFrame, query_col: str,
                          doc_col: str, rank_a_col: str,
                          rank_b_col: str, click_col: str, *,
                          depth: int) -> DataFrame:
    """rankings: one row per (query, doc) with the doc's 1-based rank
    under ranker A and B plus a 0/1 click flag for the doc (click
    model applied upstream).  Drafts `depth` slots per query; the
    coin for round t is md5(query || '|' || t) parity.  Returns one
    row per query: (query, clicks_a, clicks_b, verdict) with verdict
    1 (A wins), -1 (B wins), 0 (tie)."""
    row = F.struct(F.col(rank_a_col).cast("bigint").alias("ra"),
                   F.col(rank_b_col).cast("bigint").alias("rb"),
                   F.col(doc_col).cast("bigint").alias("d"),
                   F.col(click_col).cast("bigint").alias("c"))
    per = (rankings.groupBy(F.col(query_col).alias("q"))
           .agg(F.array_sort(F.collect_list(row)).alias("docs")))
    # fold over draft rounds 1..depth: state = (taken doc ids,
    # clicks_a, clicks_b). Each round the coin team picks its
    # best-ranked untaken doc, then the other team picks.
    pick = """
      aggregate(docs,
        named_struct('r', CAST(9223372036854775807 AS BIGINT),
                     'd', CAST(-1 AS BIGINT), 'c', CAST(0 AS BIGINT)),
        (p, x) -> IF(NOT array_contains(TK, x.d) AND RK < p.r,
                     named_struct('r', RK, 'd', x.d, 'c', x.c),
                     named_struct('r', p.r, 'd', p.d, 'c', p.c)),
        p -> p)
    """
    pick_a = pick.replace("TK", "acc.taken").replace("RK", "x.ra")
    pick_b1 = pick.replace("TK", "acc.taken").replace("RK", "x.rb")
    pick_a2 = pick.replace("TK", "array_append(acc.taken, FIRSTD)") \
        .replace("RK", "x.ra")
    pick_b2 = pick.replace("TK", "array_append(acc.taken, FIRSTD)") \
        .replace("RK", "x.rb")
    fold = F.expr(f"""
        aggregate(
          sequence(1, {depth}),
          named_struct('taken', CAST(array() AS array<bigint>),
                       'ca', CAST(0 AS BIGINT),
                       'cb', CAST(0 AS BIGINT)),
          (acc, t) -> IF(
            CAST(conv(substring(md5(concat(CAST(q AS STRING), '|',
                                           CAST(t AS STRING))),
                                1, 8), 16, 10) AS BIGINT) % 2 = 0,
            aggregate(array({pick_a}), acc, (a, fa) ->
              aggregate(array({pick_b2.replace('FIRSTD', 'fa.d')}),
                a, (a2, sb) -> named_struct(
                  'taken', filter(array_append(
                             array_append(a2.taken, fa.d), sb.d),
                             v -> v >= 0),
                  'ca', a2.ca + IF(fa.d >= 0, fa.c, 0),
                  'cb', a2.cb + IF(sb.d >= 0, sb.c, 0)),
                a2 -> a2),
              a -> a),
            aggregate(array({pick_b1}), acc, (a, fb) ->
              aggregate(array({pick_a2.replace('FIRSTD', 'fb.d')}),
                a, (a2, sa) -> named_struct(
                  'taken', filter(array_append(
                             array_append(a2.taken, fb.d), sa.d),
                             v -> v >= 0),
                  'ca', a2.ca + IF(sa.d >= 0, sa.c, 0),
                  'cb', a2.cb + IF(fb.d >= 0, fb.c, 0)),
                a2 -> a2),
              a -> a)),
          acc -> named_struct('ca', acc.ca, 'cb', acc.cb))
    """)
    return (per.select("q", fold.alias("st"))
            .select(F.col("q").alias(query_col),
                    F.col("st.ca").alias("clicks_a"),
                    F.col("st.cb").alias("clicks_b"),
                    F.when(F.col("st.ca") > F.col("st.cb"), 1)
                    .when(F.col("st.cb") > F.col("st.ca"), -1)
                    .otherwise(0).cast("bigint").alias("verdict"))
            .orderBy(query_col))
