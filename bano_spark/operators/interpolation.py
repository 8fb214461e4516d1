"""Address-range interpolation along street segments.

The reference attaches housenumbers to streets exactly
(bano/sql/point_par_rue_*: closest point per rue); national address
products additionally publish TIGER-style INTERPOLATION RANGES per
street side — "segment S, odd side, numbers 1-17" — so a geocoder can
place numbers it has never seen. This operator derives those ranges
from snapped housenumber points:

1. snap each numbered point to its nearest segment
   (operators/mapmatch.snap_to_segments, ``with_t=True`` for the
   position along the axis);
2. side = parity of the housenumber (the French/US convention the
   reference's rapprochement relies on);
3. per (segment, side): min/max number, the t-extent of the snapped
   points, count, and whether numbers are monotone along the axis
   (the quality bit a geocoder checks before trusting linear
   interpolation).

Monotonicity is decided with a per-group window (corr of rank vs
number would need a second pass; instead we count order inversions of
the (t, num) sequence — zero inversions in either direction =
monotone).

Scale shape: the snap join is mapmatch's (bounded cover explode +
equi-join + per-point window); everything after is one window and one
groupBy keyed by (seg_id, side) — shuffle O(matched points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .mapmatch import snap_to_segments


def address_ranges(
    points: DataFrame,
    segments: DataFrame,
    max_dist: float = 100.0,
    *,
    point_id: str = "point_id",
    num_col: str = "num",
    seg_id: str = "seg_id",
) -> DataFrame:
    """Interpolation ranges per (segment, parity side) from numbered
    points: (seg_id, side, n_points, num_min, num_max, t_min, t_max,
    monotone). ``points`` carries (point_id, num, x, y)."""
    snapped = snap_to_segments(points.select(point_id, "x", "y"),
                               segments, max_dist,
                               point_id=point_id, seg_id=seg_id,
                               with_t=True)
    joined = (snapped.join(points.select(point_id, num_col), point_id)
              .withColumn("side", F.when(F.col(num_col) % 2 == 0, "even")
                          .otherwise("odd")))
    w = (Window.partitionBy(seg_id, "side")
         .orderBy(F.asc("t"), F.asc(num_col), F.asc(point_id)))
    seq = (joined
           .withColumn("_prev_num", F.lag(num_col).over(w))
           .withColumn("_inv_up", F.when(
               F.col("_prev_num").isNotNull()
               & (F.col(num_col) < F.col("_prev_num")), 1).otherwise(0))
           .withColumn("_inv_dn", F.when(
               F.col("_prev_num").isNotNull()
               & (F.col(num_col) > F.col("_prev_num")), 1).otherwise(0)))
    return (seq.groupBy(seg_id, "side")
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.min(num_col).alias("num_min"),
                 F.max(num_col).alias("num_max"),
                 F.round(F.min("t"), 6).alias("t_min"),
                 F.round(F.max("t"), 6).alias("t_max"),
                 ((F.sum("_inv_up") == 0) | (F.sum("_inv_dn") == 0))
                 .alias("monotone")))


def idw_interpolate(nodes: DataFrame, samples: DataFrame, radius: float,
                    power: int = 2,
                    node_id: str = "node_id", nx: str = "nx", ny: str = "ny",
                    x_col: str = "x", y_col: str = "y",
                    value_col: str = "value") -> DataFrame:
    """Inverse-distance-weighted interpolation (Shepard 1968): the
    value at each node is sum(w_i v_i) / sum(w_i) over the samples
    within ``radius``, w_i = 1 / d_i^power. Nodes with no sample in
    range are dropped (a geostatistics NULL, not a zero).

    Scale shape: the node <-> sample pairing is a k-ring bucketed
    equi-join at cell size ``radius`` — each node sees only the
    samples of its 9 surrounding cells, so the join output is
    O(nodes * local sample density), never nodes x samples. The
    weight/value sums are one map-side-combinable groupBy(node).
    Only power=2 keeps d^power exact (d2 itself); other powers go
    through pow() doubles.
    """
    cell = float(radius)
    s = samples.select(
        F.col(x_col).alias("sx"), F.col(y_col).alias("sy"),
        F.col(value_col).alias("sv"),
        F.floor(F.col(x_col) / cell).alias("cx"),
        F.floor(F.col(y_col) / cell).alias("cy"))
    offs = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    n = (nodes.select(node_id, nx, ny, offs)
         .select(node_id, nx, ny,
                 (F.floor(F.col(nx) / cell) + F.col("o.dx")).alias("cx"),
                 (F.floor(F.col(ny) / cell) + F.col("o.dy")).alias("cy")))
    d2 = ((F.col(nx) - F.col("sx")) ** 2 + (F.col(ny) - F.col("sy")) ** 2)
    w = (F.lit(1.0) / d2 if power == 2
         else F.lit(1.0) / F.pow(F.sqrt(d2), float(power)))
    j = (n.join(s, ["cx", "cy"])
         .filter(d2 <= F.lit(cell * cell))
         .select(node_id, nx, ny, w.alias("w"),
                 (w * F.col("sv")).alias("wv")))
    return (j.groupBy(node_id, nx, ny)
            .agg((F.sum("wv") / F.sum("w")).alias("idw_value"),
                 F.count(F.lit(1)).alias("n_samples")))
