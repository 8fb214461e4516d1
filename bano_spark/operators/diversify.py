"""Result diversification: greedy Maximal Marginal Relevance (MMR).

MMR (Carbonell & Goldstein 1998) re-ranks a candidate set so each
pick balances relevance against redundancy with what is already
selected:

    pick_r = argmax_{c not selected} ( w_rel * rel(c)
                                       - max_{s in selected} sim(c, s) )

This module runs the greedy loop DISTRIBUTED OVER QUERIES: each round
is (anti-join remaining) -> (join remaining x selected within query)
-> (left-join the similarity table) -> (groupBy candidate: max
penalty) -> (one keyed window argmax per query).  k rounds = k such
stages; every shuffle is keyed on the query id, so a million queries
re-rank in parallel and the per-round cost is bounded by |candidates|
x r, never all-pairs of the corpus.

Integer exactness: relevance and similarity are integers (the fixture
uses token-overlap counts), the MMR objective is w_rel * rel - max_sim
(integer), ties break to the smallest doc id — bit-identical across
engines, no float comparisons anywhere.

Scale design: candidate sets come bounded from an upstream retriever
(BM25 / ANN top-N), so |cand| per query is a constant (10^2-10^3);
the similarity table is built ONCE via a token equi-join on candidate
docs only (never corpus x corpus) and reused by every round; each
round `localCheckpoint`s the selection to keep Catalyst lineage linear
(the components.py discipline).

Ref parity: the reference deduplicates candidate address matches per
commune before export (bano/sql/export_csv_dept.sql batch-window
dedup); MMR is the ranked generalization — drop near-duplicates
unless their relevance buys their redundancy back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["mmr_select", "pairwise_overlap"]


def pairwise_overlap(doc_terms: DataFrame, doc: str = "doc_id",
                     term: str = "term") -> DataFrame:
    """Symmetric integer similarity: count of shared distinct terms
    per ordered doc pair (both directions emitted so lookups are
    equi-joins).  Input must be distinct (doc, term)."""
    a = doc_terms.select(F.col(doc).alias("d1"), F.col(term).alias("t"))
    b = doc_terms.select(F.col(doc).alias("d2"), F.col(term).alias("t"))
    return (a.join(b, "t")
            .filter(F.col("d1") != F.col("d2"))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("sim")))


def mmr_select(cand: DataFrame, sim: DataFrame, k: int,
               query: str = "q", doc: str = "doc_id",
               rel: str = "rel", w_rel: int = 2) -> DataFrame:
    """Greedy MMR top-k per query.

    cand: (query, doc, rel) — bounded candidate set per query.
    sim:  (d1, d2, sim) — symmetric integer similarity (both
          directions present); absent pairs count as 0.
    Returns (query, rank, doc, mmr_score) with rank 1..k; a query with
    fewer than k candidates returns them all.
    """
    remaining = cand
    selected = None
    for r in range(1, k + 1):
        if r == 1:
            scored = remaining.withColumn(
                "mmr_score", (F.lit(w_rel) * F.col(rel)).cast("bigint"))
        else:
            pairs = (remaining.select(query, doc, rel)
                     .join(selected.select(query,
                                           F.col(doc).alias("d2")),
                           query))
            pairs = pairs.join(
                sim.withColumnRenamed("d1", doc), [doc, "d2"], "left")
            scored = (pairs.groupBy(query, doc, rel)
                      .agg(F.max(F.coalesce(F.col("sim"), F.lit(0)))
                           .alias("penalty"))
                      .withColumn("mmr_score",
                                  (F.lit(w_rel) * F.col(rel)
                                   - F.col("penalty")).cast("bigint")))
        w = Window.partitionBy(query).orderBy(
            F.col("mmr_score").desc(), F.col(doc).asc())
        pick = (scored.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select(query, doc, F.col(rel).alias("rel"),
                        "mmr_score")
                .withColumn("rank", F.lit(r).cast("bigint"))
                .localCheckpoint(eager=False))
        selected = pick if selected is None else selected.unionByName(pick)
        remaining = remaining.join(pick.select(query, doc),
                                   [query, doc], "left_anti")
    return selected.select(query, "rank", doc, "mmr_score")
