"""Frequent-itemset mining (Apriori level-wise candidate pruning)
over transaction tables — market-basket association discovery, the
corpus-curation cousin of `pmi_cooccurrence` (which scores WINDOWED
adjacency; this scores SET co-presence with support pruning, the
discipline that bounds candidates at any scale).

Reference anchor: generalizes the reference's tag-combination
statistics (bano stats.sql per-source cross-tabs) into the standard
association-rule form.

Scale shape (the whole point of Apriori): the item universe is
pruned to FREQUENT items before any pair is generated, so the
candidate self-join is bounded by per-transaction frequent-item
count, not vocabulary — a transaction with k frequent items emits
k(k-1)/2 pairs, and infrequent long-tail items (the mass of any
Zipfian vocabulary) never enter the join. One distinct, one
groupBy(item), one within-transaction self-join, one groupBy(pair):
all equi-shuffles on bounded inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_pairs(tx: DataFrame, tx_col: str, item_col: str,
                   min_count: int, *, round_to: int = 6) -> DataFrame:
    """Association rules over item PAIRS with support >= min_count
    transactions: support, directional confidences, and lift
    (n_tx * c_ab / (c_a * c_b) — integer products, one exact
    division). Items are deduplicated per transaction first
    (set semantics). Returns (item_a, item_b, pair_count, support,
    conf_a_to_b, conf_b_to_a, lift) with item_a < item_b."""
    items = (tx.select(F.col(tx_col).alias("_tx"),
                       F.col(item_col).alias("_it"))
             .distinct())
    n_tx = items.select("_tx").distinct().count()
    l1 = (items.groupBy("_it")
          .agg(F.count(F.lit(1)).alias("_c"))
          .filter(F.col("_c") >= min_count))
    # Apriori prune: only frequent items enter pair generation
    fi = items.join(F.broadcast(l1), "_it")
    a = fi.select("_tx", F.col("_it").alias("item_a"),
                  F.col("_c").alias("_ca"))
    b = fi.select("_tx", F.col("_it").alias("item_b"),
                  F.col("_c").alias("_cb"))
    l2 = (a.join(b, "_tx")
          .filter(F.col("item_a") < F.col("item_b"))
          .groupBy("item_a", "item_b", "_ca", "_cb")
          .agg(F.count(F.lit(1)).alias("_cab"))
          .filter(F.col("_cab") >= min_count))
    return l2.select(
        "item_a", "item_b",
        F.col("_cab").cast("bigint").alias("pair_count"),
        F.round(F.col("_cab") / F.lit(float(n_tx)), round_to)
        .alias("support"),
        F.round(F.col("_cab") / F.col("_ca"), round_to)
        .alias("conf_a_to_b"),
        F.round(F.col("_cab") / F.col("_cb"), round_to)
        .alias("conf_b_to_a"),
        F.round(F.lit(n_tx) * F.col("_cab")
                / (F.col("_ca") * F.col("_cb")), round_to)
        .alias("lift"))
