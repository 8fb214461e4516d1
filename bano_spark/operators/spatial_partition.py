"""Sort-Tile-Recursive (STR) spatial bulk packing — THE partitioning
strategy a distributed spatial engine loads points with (Leutenegger
et al. 1997): rank by x into nx vertical slabs, rank each slab by y
into ny leaves, so every leaf holds ~n/(nx*ny) spatially-coherent
points and leaf bboxes tile the data with minimal overlap. The leaf
id IS the partition key every downstream spatial join would
co-locate on.

Scale shape: the x-ranks come from the engine's distributed_cumsum
(composite-bucketed prefix sums — NO single-partition exchange, the
token_budget_selection discipline); the y-rank inside each slab is an
ordinary partitioned window. One extra shuffle total versus the
naive global-sort formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .selection import distributed_cumsum


def str_pack(points: DataFrame, nx: int, ny: int, *,
             id_col: str = "pid", x: str = "x", y: str = "y",
             round_to: int = 6) -> DataFrame:
    """Per-leaf packing summary: (slab, leaf, n_points, xmin, xmax,
    ymin, ymax). Slab = floor(global x-rank * nx / n) over the total
    order (x, id); leaf = floor(slab y-rank * ny / slab size) over
    (y, id) — deterministic for any input, ties broken by id."""
    pts = points.select(F.col(id_col).alias("_id"),
                        F.col(x).cast("double").alias("_x"),
                        F.col(y).cast("double").alias("_y"))
    n = pts.count()
    ranked = distributed_cumsum(
        pts.withColumn("_one", F.lit(1)),
        "_x", [F.col("_x"), F.col("_id")], "_one",
        out_col="_rx", tiebreak_col="_id")
    slab = (((F.col("_rx") - 1) * nx) / n).cast("long")
    slabbed = ranked.withColumn("_slab", slab)
    w = Window.partitionBy("_slab").orderBy("_y", "_id")
    cnt = Window.partitionBy("_slab")
    leaf = (((F.row_number().over(w) - 1) * ny)
            / F.count(F.lit(1)).over(cnt)).cast("long")
    leaves = slabbed.withColumn("_leaf", leaf)
    return (leaves.groupBy(F.col("_slab").alias("slab"),
                           F.col("_leaf").alias("leaf"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"),
                 F.round(F.min("_x"), round_to).alias("xmin"),
                 F.round(F.max("_x"), round_to).alias("xmax"),
                 F.round(F.min("_y"), round_to).alias("ymin"),
                 F.round(F.max("_y"), round_to).alias("ymax")))


def rendezvous_assign(items, id_col: str, n_shards: int, *,
                      mul: int = 2654435761, step: int = 40503,
                      mod: int = 1000003):
    """Rendezvous (highest-random-weight) shard assignment — the
    consistent-placement primitive behind shuffle-free rebalancing:
    item i goes to argmax_s h(i, s), so removing one shard moves ONLY
    that shard's items (minimal disruption), unlike modulo hashing
    which reshuffles ~everything.

    h is an exact-integer affine-multiplicative hash (engine-neutral
    BIGINT arithmetic); ties break to the smallest shard id. Returns
    (id, shard). Pure per-row column arithmetic over an
    O(n_shards) literal array — no join, no shuffle."""
    from pyspark.sql import functions as F

    i = F.col(id_col).cast("bigint")
    best = F.array_min(F.array(*[
        F.struct((-((i * mul + s * step) % mod)).alias("nh"),
                 F.lit(s).alias("s"))
        for s in range(n_shards)]))
    return items.select(F.col(id_col),
                        best["s"].cast("bigint").alias("shard"))
