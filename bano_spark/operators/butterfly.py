"""Bipartite butterfly (4-cycle) counting — the bipartite analogue of
triangle counting, the standard cohesion/motif statistic for
user-item, host-token, and crawl link graphs (Wang et al., "Butterfly
Counting in Bipartite Networks", and the Sanei-Mehri et al. VLDB'18
per-side cost model).

A butterfly is (u1, v1, u2, v2) with all four edges present — i.e. a
pair of left vertices sharing >= 2 right neighbors. Exact counting via
wedges: for each right vertex v, every unordered pair of its left
neighbors forms a wedge; butterflies = sum over left pairs of
C(#shared, 2).

Scale design (what survives 100x): wedge volume is sum_v C(d_v, 2) —
quadratic in the HUB side's degree. The operator therefore (a) exposes
`side_costs` so callers pivot to the cheaper side (count wedges
through the side with the smaller sum of squared degrees — butterfly
count is side-symmetric), and (b) keeps everything as equi-joins +
map-side-combinable aggregates: edges dedup (hash agg), self-join on
the pivot key, pairwise count, one integer rollup. The hub-skew
mitigation at 10^12 edges is the same salting playbook as the PIP
join; `side_costs` IS the advisor that says when it's needed.

All outputs are exact integers — no float drift across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["wedge_pairs", "butterflies_per_pair", "side_costs",
           "global_motifs"]


def wedge_pairs(edges: DataFrame, left: str, right: str) -> DataFrame:
    """Unordered left-vertex pairs per shared right neighbor (one row
    per wedge): self-join of the (deduped) edge list on the right key
    with a < tie-break — Catalyst plans a single shuffle on ``right``.
    """
    a = edges.select(F.col(left).alias("u1"), F.col(right).alias("v"))
    b = edges.select(F.col(left).alias("u2"), F.col(right).alias("v"))
    return a.join(b, "v").filter(F.col("u1") < F.col("u2"))


def butterflies_per_pair(edges: DataFrame, left: str,
                         right: str) -> DataFrame:
    """Per left pair (u1 < u2): shared-neighbor count w and the pair's
    butterfly count C(w, 2)."""
    return (wedge_pairs(edges, left, right)
            .groupBy("u1", "u2")
            .agg(F.count(F.lit(1)).alias("w"))
            .withColumn("bf", F.expr("w * (w - 1) div 2").cast("bigint")))


def side_costs(edges: DataFrame, left: str, right: str) -> DataFrame:
    """Wedge volume through each side: sum_v C(d_v, 2) pivoting on
    right vs sum_u C(d_u, 2) pivoting on left — the planner statistic
    that picks the cheap pivot side (both give the same butterfly
    total; the costs differ by orders of magnitude under skew)."""
    def vol(key: str, name: str) -> DataFrame:
        return (edges.groupBy(key)
                .agg(F.count(F.lit(1)).alias("d"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
                     F.max("d").cast("bigint").alias("max_degree"),
                     F.sum(F.expr("d * (d - 1) div 2")).cast("bigint")
                     .alias("wedges"))
                .withColumn("pivot_side", F.lit(name)))

    return (vol(right, "right").unionByName(vol(left, "left"))
            .select("pivot_side", "n_vertices", "max_degree", "wedges"))


def global_motifs(edges: DataFrame, left: str, right: str) -> DataFrame:
    """One-row global motif census: edges, wedges (through the right
    side), butterflies, caterpillars (3-paths, sum over edges of
    (d_u - 1)(d_v - 1)), and the bipartite clustering coefficient
    4*butterflies / caterpillars (single exact-integer division)."""
    dl = edges.groupBy(left).agg(F.count(F.lit(1)).alias("du"))
    dr = edges.groupBy(right).agg(F.count(F.lit(1)).alias("dv"))
    cat = (edges.join(dl, left).join(dr, right)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"),
                F.sum(F.expr("(du - 1) * (dv - 1)")).cast("bigint")
                .alias("caterpillars")))
    bf = (butterflies_per_pair(edges, left, right)
          .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("bigint")
               .alias("wedges"),
               F.coalesce(F.sum("bf"), F.lit(0)).cast("bigint")
               .alias("butterflies")))
    return (cat.crossJoin(bf)
            .withColumn("clustering",
                        F.lit(4) * F.col("butterflies").cast("double")
                        / F.col("caterpillars").cast("double")))
