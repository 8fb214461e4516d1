"""Raster map algebra over sparse cell tables.

The reference's raster side is commune-boundary rasterization for
expired-tile accounting (``bano/sql/tiles_*``, mirrored by
``operators/tiling.py`` and the raster->vector tracer). This module
adds the two classic raster analytics members on the same sparse
(tx, ty, value) representation — at web scale a raster IS a cell
table; dense 2-D arrays don't exist at 10^12 cells:

- ``zonal_stats``: per-zone aggregates of cell values, zones given as
  arbitrary polygon rings. Implemented by treating cell CENTERS as
  points through the cell-bucketed PIP ``spatial_join`` (center-in-
  zone is the standard raster zonal rule), then one partial-agg
  rollup on the zone id. Inherits the join's scale machinery:
  broadcast-or-shuffle auto-probe, quadtree covers, skew salting.
- ``focal_mean``: 3x3 neighborhood mean (map-algebra focal op) on a
  sparse raster — absent neighbors are absent, not zero. One explode
  of the 9 offsets + one partial-agg groupBy on the target cell +
  a semi-join back to the input cell set: shuffle volume is 9x the
  cell count of BIGINT triples, no matter how wide the raster.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .pip_join import spatial_join


def zonal_stats(cells: DataFrame, polygons: DataFrame, *,
                x: str = "x", y: str = "y", value: str = "val",
                zone_id: str = "poly_id", verts_col: str = "verts",
                zoom: int = 15, **join_kwargs) -> DataFrame:
    """Per-zone (n_cells, mean, sum) of ``value`` over cells whose
    center (x, y) falls inside the zone polygon. Overlapping zones
    each receive the cell (inner-join semantics)."""
    joined = spatial_join(cells, polygons, x=x, y=y, id_col=zone_id,
                          verts_col=verts_col, zoom=zoom, **join_kwargs)
    return joined.groupBy(zone_id).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.avg(value), 6).alias("mean_val"),
        F.round(F.sum(value), 6).alias("sum_val"))


def focal_mean(cells: DataFrame, *, tx: str = "tx", ty: str = "ty",
               value: str = "val", include_center: bool = True) -> DataFrame:
    """3x3 focal mean on a sparse raster: for every input cell, the
    mean of ``value`` over its existing neighbors (and itself when
    ``include_center``). Cells absent from the input contribute
    nothing and produce no output row."""
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if include_center or (dx, dy) != (0, 0)]
    off_df = cells.sparkSession.createDataFrame(offs, "dx int, dy int")
    contrib = (cells.crossJoin(F.broadcast(off_df))
               .select((F.col(tx) + F.col("dx")).alias(tx),
                       (F.col(ty) + F.col("dy")).alias(ty),
                       F.col(value)))
    agg = contrib.groupBy(tx, ty).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
        F.round(F.avg(value), 6).alias("focal_mean"))
    return agg.join(cells.select(tx, ty).distinct(), [tx, ty])


def slope_aspect(dem: DataFrame, cell: float, *, gx: str = "gx",
                 gy: str = "gy", z: str = "z",
                 round_to: int = 6) -> DataFrame:
    """Slope and aspect per INTERIOR raster cell by Horn's method
    (Horn 1981 — the 3x3 weighted finite difference every GIS ships
    as its terrain kernel):

        dz/dx = ((ne + 2e + se) - (nw + 2w + sw)) / (8 * cell)
        dz/dy = ((nw + 2n + ne) - (sw + 2s + se)) / (8 * cell)

    (x east, y north), slope_deg = degrees(atan(sqrt(gx^2 + gy^2))),
    aspect_deg = degrees(atan2(dz/dy, dz/dx)) normalized to [0, 360).
    Cells missing any of their 8 neighbors (raster border, nodata
    holes) drop — interior-only semantics, mirrored by the oracle.

    Scale shape: ONE bounded 8-offset explode + one hash aggregation
    keyed by the center cell + an occupied-cell join-back — the same
    focal discipline as :func:`focal_mean`; weights ride the offset
    structs so the aggregation is a plain weighted sum. Integer DEMs
    keep the gradient sums exact, so both engines emit identical
    doubles into atan/atan2."""
    # (dx, dy, wx, wy): weight of neighbor (cx+dx, cy+dy) in dz/dx, dz/dy
    offs = [(1, 1, 1, 1), (1, 0, 2, 0), (1, -1, 1, -1),
            (-1, 1, -1, 1), (-1, 0, -2, 0), (-1, -1, -1, -1),
            (0, 1, 0, 2), (0, -1, 0, -2)]
    arr = F.array(*[F.struct(F.lit(a).alias("dx"), F.lit(b).alias("dy"),
                             F.lit(wx).alias("wx"), F.lit(wy).alias("wy"))
                    for a, b, wx, wy in offs])
    # Each cell acts as the NEIGHBOR: it contributes its z, weighted
    # by (wx, wy), to the center at (its position - offset) — so the
    # center receives exactly weight(dx, dy) * z(center + (dx, dy)).
    contrib = (dem.select(gx, gy, z, F.explode(arr).alias("o"))
               .select((F.col(gx) - F.col("o.dx")).alias(gx),
                       (F.col(gy) - F.col("o.dy")).alias(gy),
                       (F.col(z) * F.col("o.wx")).alias("_cx"),
                       (F.col(z) * F.col("o.wy")).alias("_cy")))
    sums = (contrib.groupBy(gx, gy)
            .agg(F.sum("_cx").alias("_sx"), F.sum("_cy").alias("_sy"),
                 F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") == 8))
    out = sums.join(dem.select(gx, gy).distinct(), [gx, gy])
    d = 8.0 * float(cell)
    gxv = F.col("_sx") / F.lit(d)
    gyv = F.col("_sy") / F.lit(d)
    deg = 180.0 / math.pi
    aspect = F.atan2(gyv, gxv) * F.lit(deg)
    aspect = F.when(aspect < 0, aspect + 360.0).otherwise(aspect)
    return out.select(
        gx, gy,
        F.round(gxv, round_to).alias("dz_dx"),
        F.round(gyv, round_to).alias("dz_dy"),
        F.round(F.atan(F.sqrt(gxv * gxv + gyv * gyv)) * F.lit(deg),
                round_to).alias("slope_deg"),
        F.round(aspect, round_to).alias("aspect_deg"))


def segment_supercover(segments: DataFrame, cell: float, *,
                       seg_id: str = "seg_id", x1: str = "x1",
                       y1: str = "y1", x2: str = "x2",
                       y2: str = "y2") -> DataFrame:
    """EXACT supercover rasterization: every grid cell a segment
    passes through (vector -> raster, the inverse of
    tiling.tiles_vectorize; the per-cell expansion BANO's expire-tiles
    machinery wants when a changed WAY, not a point, must dirty its
    tiles — ref bano/expire_tiles.py walks point buffers only).

    Method: a segment crosses cell borders exactly at the parameters
    t where x(t) or y(t) hits a grid line. Collect those t (plus the
    0/1 sentinels), sort, and the MIDPOINT of each consecutive pair
    lies strictly inside one covered cell — floor it. This is
    Amanatides-Woo traversal re-expressed as set algebra: no loop, no
    state, just explode + window + floor, and it handles vertical,
    horizontal, degenerate (point) and anti-diagonal segments with no
    special cases. Corner-exact crossings yield zero-length intervals
    whose midpoints duplicate a neighbor cell — the final distinct
    absorbs them.

    Scale shape: the explode is bounded by the segment's cell span
    (length/cell + 2 per axis — linear, the pip_join cover
    discipline); one partitioned window orders each segment's
    crossings; one distinct dedupes. Returns (seg_id, cx, cy)."""
    from pyspark.sql import Window

    g = float(cell)
    s = segments.select(
        seg_id, F.col(x1).alias("_x1"), F.col(y1).alias("_y1"),
        (F.col(x2) - F.col(x1)).alias("_dx"),
        (F.col(y2) - F.col(y1)).alias("_dy"))

    def crossings(p0: str, dp: str) -> str:
        lo = f"CAST(ceil(least({p0}, {p0} + {dp}) / {g}d) AS BIGINT)"
        hi = f"CAST(floor(greatest({p0}, {p0} + {dp}) / {g}d) AS BIGINT)"
        return (f"CASE WHEN {dp} <> 0 AND {lo} <= {hi} THEN "
                f"transform(sequence({lo}, {hi}),"
                f" k -> (k * {g}d - {p0}) / {dp}) "
                f"ELSE array() END")

    ts = (f"filter(concat(array(0.0d, 1.0d), {crossings('_x1', '_dx')},"
          f" {crossings('_y1', '_dy')}), t -> t >= 0.0d AND t <= 1.0d)")
    tcol = (s.select(seg_id, "_x1", "_y1", "_dx", "_dy",
                     F.explode(F.expr(ts)).alias("_t")))
    w = Window.partitionBy(seg_id).orderBy("_t")
    mid = (tcol.withColumn("_tn", F.lead("_t").over(w))
           .filter(F.col("_tn").isNotNull() & (F.col("_tn") > F.col("_t")))
           .withColumn("_tm", (F.col("_t") + F.col("_tn")) / 2))
    return (mid.select(
        seg_id,
        F.floor((F.col("_x1") + F.col("_tm") * F.col("_dx")) / g)
        .alias("cx"),
        F.floor((F.col("_y1") + F.col("_tm") * F.col("_dy")) / g)
        .alias("cy"))
        .distinct())
