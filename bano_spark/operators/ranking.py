"""Ranking / retrieval evaluation metrics: MRR, NDCG@k, average
precision, ROC-AUC.

The engine already *produces* rankings (BM25 top-k `search.py`, ANN
`similarity.py`, kNN name-match `knn_join.py` mirroring the reference
rapprochement loop `bano/models.py` best-match selection) — these
operators close the loop by *evaluating* a ranking against binary
relevance labels, the standard acceptance gate for any retrieval or
dedup-candidate stage of a training-data pipeline.

Scale shape: every per-query metric is one `row_number` window
partitioned by the query key (partitioned exchange only, never a
global sort) followed by one groupBy(query). ROC-AUC is the
Mann-Whitney mid-rank formulation rewritten relationally: group by
distinct score (map-side combine collapses 100 TB of rows to one row
per distinct score), then a bucketed distributed prefix sum over the
distinct-score order (`selection.distributed_cumsum` — O(buckets)
driver state, no single-partition window), then one scalar
aggregation. No step holds a per-query list in memory; nothing
depends on query-list length fitting anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .selection import distributed_cumsum


def _rank_window(query_col: str, order: list[Column]) -> Window:
    return Window.partitionBy(query_col).orderBy(*order)


def reciprocal_rank_summary(df: DataFrame, query_col: str,
                            order: list[Column],
                            rel_col: str) -> DataFrame:
    """Mean reciprocal rank over ALL queries (a query with no relevant
    item contributes 0, the TREC convention), plus the query universe
    sizes. `order` must be a total order within each query (include a
    unique tiebreak) so the rank — and therefore the metric — is
    deterministic under score ties."""
    rn = F.row_number().over(_rank_window(query_col, order))
    per_q = (df.withColumn("_rn", rn)
             .groupBy(query_col)
             .agg(F.min(F.when(F.col(rel_col), F.col("_rn")))
                  .alias("_first_rel")))
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.count("_first_rel").alias("n_with_relevant"),
        F.round(F.sum(F.coalesce(1.0 / F.col("_first_rel"), F.lit(0.0)))
                / F.count(F.lit(1)), 6).alias("mrr"))


def ndcg_at_k(df: DataFrame, query_col: str, order: list[Column],
              rel_col: str, k: int = 10) -> DataFrame:
    """Per-query NDCG@k with binary gains: DCG@k = sum of
    1/log2(rank+1) over relevant items ranked <= k; the ideal DCG
    places the query's n_rel relevant items first, so IDCG@k is the
    same sum over ranks 1..min(k, n_rel) — evaluated per query from
    n_rel alone (an O(k) array fold, no second ranking pass).
    Queries with no relevant item score 0."""
    rn = F.row_number().over(_rank_window(query_col, order))
    per_q = (df.withColumn("_rn", rn)
             .groupBy(query_col)
             .agg(F.sum(F.when(F.col(rel_col), 1).otherwise(0))
                  .alias("n_rel"),
                  F.sum(F.when(F.col(rel_col) & (F.col("_rn") <= k),
                               1.0 / F.log2(F.col("_rn") + 1.0)))
                  .alias("_dcg")))
    ideal_n = F.least(F.col("n_rel"), F.lit(k))
    idcg = F.when(ideal_n > 0, F.aggregate(
        F.sequence(F.lit(1), ideal_n),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0)))
    return per_q.select(
        query_col,
        F.col("n_rel").cast("long").alias("n_rel"),
        F.round(F.coalesce(F.col("_dcg") / idcg, F.lit(0.0)), 6)
        .alias(f"ndcg_{k}"))


def average_precision(df: DataFrame, query_col: str, order: list[Column],
                      rel_col: str) -> DataFrame:
    """Per-query average precision: mean over relevant items of
    precision@(item's rank). The running relevant-count is the same
    partitioned rank window framed to the current row — one exchange
    serves both. Queries with no relevant item score 0."""
    w = _rank_window(query_col, order)
    rn = F.row_number().over(w)
    cum_rel = F.sum(F.when(F.col(rel_col), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    scored = df.withColumn("_rn", rn).withColumn("_cum_rel", cum_rel)
    per_q = (scored.groupBy(query_col)
             .agg(F.sum(F.when(F.col(rel_col), 1).otherwise(0))
                  .alias("n_rel"),
                  F.sum(F.when(F.col(rel_col),
                               F.col("_cum_rel") / F.col("_rn")))
                  .alias("_ap_num")))
    return per_q.select(
        query_col,
        F.col("n_rel").cast("long").alias("n_rel"),
        F.round(F.coalesce(F.col("_ap_num") / F.col("n_rel"),
                           F.lit(0.0)), 6).alias("ap"))


def roc_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Global ROC-AUC via the Mann-Whitney mid-rank identity,
    tie-correct: AUC = P(s+ > s-) + 0.5 * P(s+ = s-).

    Relational plan (no global sort, no per-row rank): collapse to one
    row per distinct score with (n_pos, n_neg) counts — map-side
    combine does the heavy lifting — then a bucketed prefix sum of
    negatives over ascending score gives, for every distinct score,
    the negatives strictly below it; each positive at that score beats
    those and half-ties the co-located negatives. One scalar agg
    finishes. Driver state is O(buckets); ties need no special-casing
    because tied rows share their distinct-score group by
    construction."""
    lab = F.col(label_col).cast("int")
    g = (df.select(F.col(score_col).cast("double").alias("_s"), lab.alias("_y"))
         .filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
         .groupBy("_s")
         .agg(F.sum("_y").alias("_pos"),
              F.sum(1 - F.col("_y")).alias("_neg")))
    cum = distributed_cumsum(g, "_s", [F.asc("_s")], "_neg",
                             out_col="_cum_neg")
    # inclusive cumsum ⇒ strictly-below = _cum_neg - _neg; mid-rank
    # tie credit = 0.5 * _neg ⇒ per-score term = _pos*(_cum_neg - 0.5*_neg)
    return (cum.agg(
        F.sum(F.col("_pos") * (F.col("_cum_neg") - 0.5 * F.col("_neg")))
        .alias("_num"),
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"))
        .select(F.col("n_pos").cast("long").alias("n_pos"),
                F.col("n_neg").cast("long").alias("n_neg"),
                F.round(F.col("_num")
                        / (F.col("n_pos") * F.col("n_neg")), 6)
                .alias("auc")))


def precision_recall_at_k(df: DataFrame, query_col: str,
                          order: list[Column], rel_col: str,
                          k: int = 10, *,
                          round_to: int = 6) -> DataFrame:
    """Per-query precision@k and recall@k with binary relevance:
    P@k = hits in the top k / k (the fixed-denominator IR convention —
    a query with fewer than k ranked items is penalized, as a cut-off
    evaluation should), R@k = hits in the top k / n_rel, 0 when the
    query has no relevant item (the same all-queries convention as
    `reciprocal_rank_summary`). `order` must be a total order within
    each query (unique tiebreak) so ranks are deterministic.

    Scale shape: one row_number window partitioned by the query key +
    one groupBy(query) — identical exchange profile to ndcg_at_k.
    Returns (query, n_rel, precision_{k}, recall_{k})."""
    rn = F.row_number().over(_rank_window(query_col, order))
    rel = F.col(rel_col).cast("boolean")
    per_q = (df.withColumn("_rn", rn)
             .groupBy(query_col)
             .agg(F.sum(F.when(rel, 1).otherwise(0))
                  .cast("bigint").alias("n_rel"),
                  F.sum(F.when(rel & (F.col("_rn") <= k), 1)
                        .otherwise(0)).alias("_hits")))
    return per_q.select(
        query_col, "n_rel",
        F.round(F.col("_hits") / float(k), round_to)
        .alias(f"precision_{k}"),
        F.round(F.when(F.col("n_rel") > 0,
                       F.col("_hits") / F.col("n_rel").cast("double"))
                .otherwise(F.lit(0.0)), round_to).alias(f"recall_{k}"))


def bradley_terry(outcomes: DataFrame, *, winner_col: str = "winner",
                  loser_col: str = "loser", iters: int = 5,
                  round_iter: int = 12,
                  round_to: int = 6) -> DataFrame:
    """Bradley-Terry paired-comparison strengths via Hunter's (2004)
    MM fixed point — the classical model behind pairwise
    preference / LLM-judge win-rate aggregation:

        w_i' = W_i / sum_j N_ij / (w_i + w_j),   then normalize

    with W_i the total wins of item i and N_ij the games between i
    and j. Fixed ``iters`` unroll from the uniform start; each
    iteration's strengths round to ``round_iter`` decimals (pagerank
    trajectory pinning — the per-item sums run over O(items) rational
    terms whose aggregation order differs across engines at ~1e-17).

    Scale shape: outcomes collapse to one row per ordered pair
    (map-side combine); each iteration is one broadcast join of the
    O(items) strength vector onto the O(items^2) pair table plus two
    bounded aggregates. Returns (item, wins, strength)."""
    w = (outcomes.groupBy(F.col(winner_col).alias("_i"))
         .agg(F.count(F.lit(1)).alias("_wins")))
    games = (outcomes
             .select(F.col(winner_col).alias("_a"),
                     F.col(loser_col).alias("_b"))
             .unionByName(outcomes.select(
                 F.col(loser_col).alias("_a"),
                 F.col(winner_col).alias("_b")))
             .groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_n")))
    items = (games.select(F.col("_a").alias("_i")).distinct())
    s = items.withColumn("_w", F.lit(1.0))
    for _ in range(iters):
        num = (items.join(w, "_i", "left")
               .select("_i", F.coalesce("_wins", F.lit(0))
                       .cast("double").alias("_win")))
        den = (games
               .join(F.broadcast(s.select(F.col("_i").alias("_a"),
                                          F.col("_w").alias("_wa"))), "_a")
               .join(F.broadcast(s.select(F.col("_i").alias("_b"),
                                          F.col("_w").alias("_wb"))), "_b")
               .groupBy(F.col("_a").alias("_i"))
               .agg(F.sum(F.col("_n")
                          / F.nullif(F.col("_wa") + F.col("_wb"),
                                     F.lit(0.0))).alias("_d")))
        raw = (num.join(den, "_i")
               .select("_i", (F.col("_win") / F.col("_d")).alias("_r")))
        tot = raw.agg(F.sum("_r").alias("_t"))
        s = (raw.crossJoin(F.broadcast(tot))
             .select("_i", F.round(F.col("_r") / F.col("_t"), round_iter)
                     .alias("_w"))
             .localCheckpoint(eager=False))
    return (s.join(w, "_i", "left")
            .select(F.col("_i").alias("item"),
                    F.coalesce("_wins", F.lit(0)).cast("bigint")
                    .alias("wins"),
                    F.round("_w", round_to).alias("strength"))
            .orderBy("item"))
