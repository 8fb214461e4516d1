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
