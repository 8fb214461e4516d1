"""Neighborhood collaborative filtering.

``item_cosine_topk`` — item-item cosine similarity over the user
rating vectors with an EXACTLY-reproducible ranking: pairs are ordered
by cos^2 = (dot*dot) / (ss_i*ss_j), a single IEEE division of two
exactly-representable integers, so the ordering (and the tie-break on
the neighbor id) is bit-identical on any engine/topology; sqrt is
applied only to the DISPLAYED cosine (IEEE sqrt is correctly rounded,
so it too matches bit-for-bit).

``slope_one_predict`` — weighted Slope One (Lemire & Maclachlan 2005):
deviation dev(j,i) = sum_u (r_uj - r_ui) / |S_ij| and prediction
P(u,j) = sum_i (num_ji + r_ui * c_ji) / sum_i c_ji.  Both numerator
and denominator stay INTEGER until one final division — fully exact.

Ref parity: the reference ranks candidate address matches per street
by hand-tuned source-agreement scores (bano/core.py rapprochement,
models.py poids); item-item neighborhoods are the data-driven version
of "entities that co-occur across many observers are interchangeable".

Scale shape: the classic co-occurrence pipeline — one shuffle groups
ratings by user, per-user pair explosion is bounded by the per-user
basket size (cap it upstream for power users; the fixture's is ~60),
then everything is hash aggregation on (i, j).  Top-k per item is a
window partitioned BY ITEM (bounded groups, never a global sort).
Slope One's prediction join ships the O(#items^2) deviation table —
broadcast when small, hash join on i otherwise — and aggregates by
(user, candidate); no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def item_cosine_topk(ratings: DataFrame, user_col: str, item_col: str,
                     rating_col: str, k: int = 5) -> DataFrame:
    """Top-k neighbors per item by cosine over user-rating vectors.
    Returns (item_i, item_j, n_common, cosine, rank), rank 1..k by
    (cos^2 DESC, item_j ASC)."""
    r = ratings.select(F.col(user_col).alias("u"),
                       F.col(item_col).alias("i"),
                       F.col(rating_col).cast("bigint").alias("r"))
    a = r.alias("a")
    b = r.alias("b")
    pairs = (a.join(b, (F.col("a.u") == F.col("b.u"))
                    & (F.col("a.i") != F.col("b.i")))
             .groupBy(F.col("a.i").alias("item_i"),
                      F.col("b.i").alias("item_j"))
             .agg(F.count("*").cast("bigint").alias("n_common"),
                  F.sum(F.col("a.r") * F.col("b.r")).cast("bigint")
                  .alias("dot")))
    ss = (r.groupBy("i")
          .agg(F.sum(F.col("r") * F.col("r")).cast("bigint").alias("ss")))
    j = (pairs
         .join(ss.select(F.col("i").alias("item_i"),
                         F.col("ss").alias("ss_i")), "item_i")
         .join(ss.select(F.col("i").alias("item_j"),
                         F.col("ss").alias("ss_j")), "item_j")
         .withColumn("cos2", (F.col("dot") * F.col("dot"))
                     .cast("double")
                     / (F.col("ss_i") * F.col("ss_j")).cast("double")))
    w = Window.partitionBy("item_i").orderBy(
        F.col("cos2").desc(), F.col("item_j").asc())
    return (j.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select("item_i", "item_j", "n_common",
                    (F.round(F.sqrt(F.col("cos2")), 6) + F.lit(0.0))
                    .alias("cosine"), "rank")
            .orderBy("item_i", "rank"))


def slope_one_predict(ratings: DataFrame, user_col: str, item_col: str,
                      rating_col: str, top_n: int = 3) -> DataFrame:
    """Weighted Slope One predictions for (user, item) pairs the user
    has NOT rated; top_n per user by (prediction DESC, item ASC).
    Returns (user, item, n_support, prediction, rank)."""
    r = ratings.select(F.col(user_col).alias("u"),
                       F.col(item_col).alias("i"),
                       F.col(rating_col).cast("bigint").alias("r"))
    a = r.alias("a")
    b = r.alias("b")
    # dev numerator/count for ordered pairs (j = target, i = source)
    dev = (a.join(b, (F.col("a.u") == F.col("b.u"))
                  & (F.col("a.i") != F.col("b.i")))
           .groupBy(F.col("a.i").alias("tgt"),
                    F.col("b.i").alias("src"))
           .agg(F.sum(F.col("a.r") - F.col("b.r")).cast("bigint")
                .alias("num"),
                F.count("*").cast("bigint").alias("c")))
    cand = (r.join(dev, r["i"] == dev["src"])
            .groupBy(F.col("u"), F.col("tgt").alias("item"))
            .agg(F.sum(F.col("num") + F.col("r") * F.col("c"))
                 .cast("bigint").alias("pnum"),
                 F.sum("c").cast("bigint").alias("den")))
    rated = r.select("u", F.col("i").alias("item"))
    unseen = cand.join(rated, ["u", "item"], "left_anti")
    w = Window.partitionBy("u").orderBy(
        (F.col("pnum").cast("double") / F.col("den").cast("double"))
        .desc(), F.col("item").asc())
    return (unseen
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= top_n)
            .select(F.col("u").alias(user_col), "item",
                    F.col("den").alias("n_support"),
                    (F.round(F.col("pnum").cast("double")
                             / F.col("den").cast("double"), 6)
                     + F.lit(0.0)).alias("prediction"), "rank")
            .orderBy(user_col, "rank"))
