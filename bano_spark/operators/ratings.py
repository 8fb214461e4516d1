"""Online rating and bandit-replay folds.

``elo_ratings`` — the classic online Elo update over a per-league
match stream: expected score E_a = 1 / (1 + 10^((r_b - r_a)/400)),
r_a += K (S_a - E_a).  Every new rating is RE-QUANTIZED to 6 decimals
inside the fold, so a sub-ulp libm difference cannot accumulate over
thousands of sequential updates — ratings are reproducible to the
displayed precision on any engine.

``ucb1_replay`` — offline bandit evaluation by the replay method (Li
et al., WSDM 2011): walk the logged stream; at each event UCB1 picks
argmax_i mean_i + sqrt(2 ln N / n_i) (untried arms first, ties to the
lowest arm); the event counts and updates the policy ONLY when the
logged arm equals the policy's choice — an unbiased offline estimate
of the policy's reward on uniformly-logged data.

Ref parity: the reference's source-priority weights are static
(bano/models.py poids); Elo is the online version of "which source
wins head-to-head", and the bandit replay is how one would TEST a new
priority policy offline on logged conciliation decisions.

Scale shape: session-fold contract — one shuffle to the
league/experiment shard, one bounded collect, O(#players) / O(#arms)
fold state, no Python.  Streams longer than a task's memory shard by
epoch and chain via the carry pattern (wave-83 asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def elo_ratings(matches: DataFrame, league_col: str, seq_col: str,
                a_col: str, b_col: str, score_a_col: str, *,
                n_players: int, k: int = 16,
                init: int = 1000) -> DataFrame:
    """Final ratings per (league, player) after folding the league's
    matches in seq order.  ``score_a_col`` is 1 (A wins) or 0.
    Returns (league, player, rating, n_matches) per player 0..n-1."""
    row = F.struct(F.col(seq_col).cast("bigint").alias("o"),
                   F.col(a_col).cast("int").alias("a"),
                   F.col(b_col).cast("int").alias("b"),
                   F.col(score_a_col).cast("double").alias("sa"))
    per = (matches.groupBy(F.col(league_col).alias("lg"))
           .agg(F.array_sort(F.collect_list(row)).alias("ms")))
    fold = F.expr(f"""
        aggregate(
          ms,
          transform(sequence(1, {n_players}),
                    i -> CAST({init} AS DOUBLE)),
          (acc, m) -> aggregate(
            array(CAST(1.0 AS DOUBLE)
                  / (CAST(1.0 AS DOUBLE)
                     + exp((element_at(acc, m.b + 1)
                            - element_at(acc, m.a + 1))
                           * ln(CAST(10.0 AS DOUBLE)) / 400))),
            acc,
            (r, ea) -> transform(sequence(1, {n_players}),
              i -> CASE
                WHEN i = m.a + 1
                  THEN round(element_at(r, i)
                             + {k} * (m.sa - ea), 6)
                WHEN i = m.b + 1
                  THEN round(element_at(r, i)
                             + {k} * ((1 - m.sa) - (1 - ea)), 6)
                ELSE element_at(r, i) END),
            r -> r),
          acc -> acc)
    """)
    played = F.expr("""
        aggregate(ms, transform(sequence(1, {n}), i -> CAST(0 AS BIGINT)),
          (acc, m) -> transform(sequence(1, {n}),
            i -> element_at(acc, i)
                 + IF(i = m.a + 1 OR i = m.b + 1, 1, 0)),
          acc -> acc)
    """.format(n=n_players))
    out = per.select("lg", fold.alias("rs"), played.alias("np"))
    return (out.select("lg", F.posexplode("rs").alias("p", "rating"),
                       F.col("np"))
            .select(F.col("lg").alias(league_col),
                    F.col("p").cast("bigint").alias("player"),
                    (F.col("rating") + F.lit(0.0)).alias("rating"),
                    F.expr("element_at(np, CAST(p + 1 AS INT))")
                    .cast("bigint").alias("n_matches"))
            .orderBy(league_col, "player"))


def ucb1_replay(events: DataFrame, shard_col: str, seq_col: str,
                arm_col: str, reward_col: str, *,
                n_arms: int) -> DataFrame:
    """Replay-method UCB1 evaluation per shard.  Returns (shard,
    n_events, n_matched, total_reward, pulls_0..pulls_{n-1},
    mean_reward)."""
    row = F.struct(F.col(seq_col).cast("bigint").alias("o"),
                   F.col(arm_col).cast("int").alias("arm"),
                   F.col(reward_col).cast("bigint").alias("rw"))
    per = (events.groupBy(F.col(shard_col).alias("shard"))
           .agg(F.array_sort(F.collect_list(row)).alias("ev")))
    # state: struct(n array, s array, matched, reward)
    # choice: first untried arm, else argmax mean + sqrt(2 ln N / n_i)
    choice = f"""
        IF(exists(acc.n, c -> c = 0),
           aggregate(sequence(0, {n_arms - 1}), CAST(-1 AS INT),
             (b, i) -> IF(b = -1 AND element_at(acc.n, i + 1) = 0,
                          CAST(i AS INT), b),
             b -> b),
           aggregate(sequence(0, {n_arms - 1}),
             named_struct('v', CAST(-1.0e18 AS DOUBLE),
                          'i', CAST(-1 AS INT)),
             (b, i) -> aggregate(
               array(element_at(acc.s, i + 1)
                     / element_at(acc.n, i + 1)
                     + sqrt(2 * ln(CAST(aggregate(acc.n,
                           CAST(0 AS BIGINT), (x, y) -> x + y)
                           AS DOUBLE))
                            / element_at(acc.n, i + 1))),
               b,
               (bb, ucb) -> IF(ucb > bb.v,
                               named_struct('v', ucb,
                                            'i', CAST(i AS INT)),
                               named_struct('v', bb.v, 'i', bb.i)),
               bb -> bb),
             b -> b.i))
    """
    fold = F.expr(f"""
        aggregate(
          ev,
          named_struct(
            'n', transform(sequence(1, {n_arms}),
                           i -> CAST(0 AS BIGINT)),
            's', transform(sequence(1, {n_arms}),
                           i -> CAST(0 AS BIGINT)),
            'matched', CAST(0 AS BIGINT),
            'reward', CAST(0 AS BIGINT)),
          (acc, e) -> aggregate(
            array({choice}),
            acc,
            (a, ch) -> IF(ch = e.arm,
              named_struct(
                'n', transform(sequence(1, {n_arms}),
                       i -> element_at(a.n, i)
                            + IF(i = ch + 1, 1, 0)),
                's', transform(sequence(1, {n_arms}),
                       i -> element_at(a.s, i)
                            + IF(i = ch + 1, e.rw, CAST(0 AS BIGINT))),
                'matched', a.matched + 1,
                'reward', a.reward + e.rw),
              named_struct('n', transform(a.n, v -> v),
                           's', transform(a.s, v -> v),
                           'matched', a.matched,
                           'reward', a.reward)),
            a -> a),
          acc -> acc)
    """)
    out = per.select("shard", F.size("ev").cast("bigint")
                     .alias("n_events"), fold.alias("st"))
    pulls = [F.col("st.n")[i].cast("bigint").alias(f"pulls_{i}")
             for i in range(n_arms)]
    return (out.select(
        "shard", "n_events", F.col("st.matched").alias("n_matched"),
        F.col("st.reward").alias("total_reward"), *pulls,
        (F.round(F.col("st.reward")
                 / F.greatest(F.col("st.matched"), F.lit(1)), 6)
         + F.lit(0.0)).alias("mean_reward"))
        .orderBy("shard"))
