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
