"""Map-matching-lite: snap points to their nearest street segment.

The reference computes per-street closest points driver-side with
PostGIS ``ST_ClosestPoint`` (bano/sql/point_par_rue_insee_nocache.sql:41
— already ported as the w31 column kernel); this operator is the JOIN
form a web-scale pipeline needs: for each point, find the nearest
segment among millions and emit the snapped coordinate — GPS-trace
map-matching's inner step, or BANO's "attach housenumber to street
axis" at corpus scale.

Algorithm (never a cross product):

1. Each segment emits the slippy cells its bbox EXPANDED BY
   ``max_dist`` covers, at a zoom whose cell edge >= ``max_dist``
   (same completeness argument as knn_join.dwithin_pairs: any point
   within ``max_dist`` of the segment lies in the expanded bbox, and
   the expanded bbox's cell cover contains the point's home cell).
   The per-segment cell count is bounded by
   (len/cell + 2) * (len/cell + 2) — a bounded explode, linear in
   segment length, exactly pip_join's cover discipline.
2. Points join on their single home cell (equi-join on the cell key;
   hot cells salt like pip_join).
3. Exact clamped-projection distance^2 per candidate (pure column
   arithmetic: one division and fused mul/adds, IEEE-identical across
   engines), filter <= max_dist^2.
4. Nearest per point via a window over (d2, seg_id) — PARTITIONED BY
   the point id, deterministic under distance ties.

Scale shape: one bounded explode + one equi-join + one partitioned
window. Shuffle volume is O(candidates) keyed by cell then point id;
the segment side is broadcast below ``broadcast_max_rows`` exploded
rows (street graphs of a country fit; continental corpora take the
shuffled path automatically).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..geo import tiles


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    max_dist: float,
    *,
    point_id: str = "event_id",
    seg_id: str = "seg_id",
    x: str = "x",
    y: str = "y",
    max_zoom: int = 18,
    broadcast_segments: bool | None = None,
    broadcast_max_rows: int = 1_000_000,
    with_t: bool = False,
) -> DataFrame:
    """Nearest segment within ``max_dist`` meters per point. Segments
    carry (seg_id, x1, y1, x2, y2). Returns (point_id, seg_id, snap_x,
    snap_y, dist_m); points with no segment in range are dropped.
    ``with_t=True`` appends ``t`` — the clamped projection parameter in
    [0, 1] along the segment (address-interpolation consumers).

    Ties on exact distance^2 break deterministically by seg_id."""
    zoom = min(max_zoom, max(0, int(math.floor(
        math.log2(tiles.WORLD / float(max_dist))))))
    grow = F.lit(float(max_dist))

    # 1. expanded-bbox cell cover per segment (bounded explode)
    sx0 = F.least("x1", "x2") - grow
    sx1 = F.greatest("x1", "x2") + grow
    sy0 = F.least("y1", "y2") - grow
    sy1 = F.greatest("y1", "y2") + grow
    segs = (segments
            .withColumn("_cx", F.explode(F.sequence(
                tiles.tile_x(sx0, zoom), tiles.tile_x(sx1, zoom))))
            .withColumn("_cy", F.explode(F.sequence(
                tiles.tile_y(sy1, zoom), tiles.tile_y(sy0, zoom)))))
    # (tile_y grows downward: sy1 maps to the smaller tile index)
    if broadcast_segments is None:
        span = int(float(max_dist) * 2 // tiles.cell_size(zoom)) + 3
        cap = max(broadcast_max_rows // (span * span), 1)
        broadcast_segments = (
            segments.select(seg_id).limit(cap + 1).count() <= cap)
    if broadcast_segments:
        segs = F.broadcast(segs)

    # 2. points join on their home cell
    pts = (points.select(point_id, x, y)
           .withColumn("_cx", tiles.tile_x(F.col(x), zoom))
           .withColumn("_cy", tiles.tile_y(F.col(y), zoom)))
    cand = pts.join(segs, ["_cx", "_cy"]).drop("_cx", "_cy")

    # 3. exact clamped projection (w31 kernel as join arithmetic)
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    d2seg = dx * dx + dy * dy
    t_raw = F.when(
        d2seg > 0,
        ((F.col(x) - F.col("x1")) * dx + (F.col(y) - F.col("y1")) * dy)
        / d2seg).otherwise(F.lit(0.0))
    tc = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    snap_x = F.col("x1") + tc * dx
    snap_y = F.col("y1") + tc * dy
    d2 = ((F.col(x) - snap_x) ** 2 + (F.col(y) - snap_y) ** 2)
    scored = (cand.withColumn("_sx", snap_x).withColumn("_sy", snap_y)
              .withColumn("_tc", tc)
              .withColumn("_d2", d2)
              .filter(F.col("_d2") <= F.lit(float(max_dist) ** 2)))

    # 4. nearest per point, deterministic tie-break
    w = Window.partitionBy(point_id).orderBy(F.asc("_d2"), F.asc(seg_id))
    cols = [point_id, seg_id,
            F.round("_sx", 6).alias("snap_x"),
            F.round("_sy", 6).alias("snap_y"),
            F.round(F.sqrt("_d2"), 3).alias("dist_m")]
    if with_t:
        cols.append(F.col("_tc").alias("t"))
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(*cols))


def route_chainage(points: DataFrame, routes: DataFrame, *,
                   route_key: str = "route_id", point_id: str = "event_id",
                   x: str = "x", y: str = "y", seq: str = "seq",
                   round_to: int = 6) -> DataFrame:
    """Linear referencing: project each point onto ITS OWN route (the
    key-join variant of :func:`snap_to_segments` — the route is known,
    e.g. a vehicle's assigned line or a GPS head already matched) and
    return the CHAINAGE, the distance along the route to the snapped
    point — PostGIS ``ST_LineLocatePoint`` * ``ST_Length`` as a join.

    ``routes`` carries ordered vertices (route_key, seq, x, y); the
    route's segments are (seq, seq+1) vertex pairs. Per (point,
    segment): clamped-projection distance^2 and the candidate chainage
    = (cumulative length before the segment) + t * segment length.
    The winner is the min (d2, seq) struct — deterministic under
    exact-distance ties, nearest-then-earliest.

    Scale shape: one partitioned window (per-route cumulative length),
    one equi-join on the route key (candidates = points x route's own
    segments — bounded by route length, never a spatial cross), one
    min-struct aggregation per point. No Python."""
    from pyspark.sql import Window

    w = Window.partitionBy(route_key).orderBy(seq)
    v = routes.select(route_key, F.col(seq).alias("_s"),
                      F.col(x).alias("_vx"), F.col(y).alias("_vy"))
    segs = (v.withColumn("_nx", F.lead("_vx").over(
        Window.partitionBy(route_key).orderBy("_s")))
        .withColumn("_ny", F.lead("_vy").over(
            Window.partitionBy(route_key).orderBy("_s")))
        .filter(F.col("_nx").isNotNull()))
    seglen = F.sqrt((F.col("_nx") - F.col("_vx")) ** 2
                    + (F.col("_ny") - F.col("_vy")) ** 2)
    segs = segs.withColumn("_len", seglen).withColumn(
        "_chain0",
        F.sum("_len").over(Window.partitionBy(route_key).orderBy("_s")
                           .rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow))
        - F.col("_len"))

    p = points.select(point_id, route_key, F.col(x).alias("_px"),
                      F.col(y).alias("_py"))
    cand = p.join(segs, route_key)
    dx = F.col("_nx") - F.col("_vx")
    dy = F.col("_ny") - F.col("_vy")
    d2seg = dx * dx + dy * dy
    t_raw = F.when(d2seg > 0,
                   ((F.col("_px") - F.col("_vx")) * dx
                    + (F.col("_py") - F.col("_vy")) * dy) / d2seg) \
        .otherwise(F.lit(0.0))
    tc = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    sx = F.col("_vx") + tc * dx
    sy = F.col("_vy") + tc * dy
    d2 = (F.col("_px") - sx) ** 2 + (F.col("_py") - sy) ** 2
    scored = cand.select(
        point_id, route_key,
        F.struct(d2.alias("d2"), F.col("_s").alias("s"),
                 (F.col("_chain0") + tc * F.col("_len")).alias("chain"),
                 sx.alias("sx"), sy.alias("sy")).alias("_c"))
    best = (scored.groupBy(point_id, route_key)
            .agg(F.min("_c").alias("b")))
    return best.select(
        point_id, route_key,
        F.round(F.sqrt(F.col("b.d2")), round_to).alias("dist_m"),
        F.round(F.col("b.chain"), round_to).alias("chainage_m"),
        F.round(F.col("b.sx"), round_to).alias("snap_x"),
        F.round(F.col("b.sy"), round_to).alias("snap_y"))
