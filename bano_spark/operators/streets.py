"""Street-geometry operators: best segment (W2) + per-street centroid
(A5/A6).

Reference: bano/sql/point_par_rue_insee_nocache.sql — per (name, insee)
pick the best way segment, preferring segments fully within the commune
(`rank() OVER (PARTITION BY name, insee ORDER BY within DESC)`, line
22), and aggregate street geometry to a representative centroid
(`st_centroid(st_convexhull(ST_Collect(...)))`,
export_json_dept_voies_non_rapprochees.sql:68-69).

The centroid is the true convex-hull centroid (shoelace over the hull
ring), computed in two stages so the shuffle carries only partial-hull
vertices; degenerate inputs follow PostGIS (point -> itself,
collinear -> hull-segment midpoint).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def best_segment(segments: DataFrame, keys: Sequence[str] = ("street_id",),
                 seg_col: str = "seg_id", within_col: str = "within") -> DataFrame:
    """Top-1 segment per street, preferring within-commune segments;
    deterministic tie-break on the segment id (the reference inherits
    Postgres scan order — we make it explicit)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(within_col), F.col(seg_col))
    return (
        segments.withColumn("_rang", F.rank().over(w))
        .filter(F.col("_rang") == 1)
        .drop("_rang")
    )


def street_centroid(points: DataFrame, keys: Sequence[str] = ("street_id",),
                    x: str = "x", y: str = "y") -> DataFrame:
    """A5: per-street `st_centroid(st_convexhull(ST_Collect(pts)))`
    (export_json_dept_voies_non_rapprochees.sql:68-69) — the true hull
    centroid, not a bbox midpoint.

    Two-stage for scale: per-partition partial hulls first (mapInPandas,
    no shuffle), so the groupBy shuffle carries only hull vertices —
    O(hull size) per (partition, street), not O(points). The final
    kernel hulls the partial vertices and takes the shoelace centroid;
    PostGIS degenerate semantics are kept (single point -> the point,
    collinear -> midpoint of the extreme points of the hull segment)."""
    import pandas as pd

    from ..geo.geometry import convex_hull, polygon_area_centroid

    kt = {f.name: f.dataType.simpleString() for f in points.schema}
    key_schema = ", ".join(f"{k} {kt[k]}" for k in keys)
    klist = list(keys)

    def partial(it):
        for pdf in it:
            outs = []
            for kv, g in pdf.groupby(klist, sort=False):
                hull = convex_hull(g[[x, y]].to_numpy())
                o = pd.DataFrame(hull, columns=[x, y])
                if not isinstance(kv, tuple):
                    kv = (kv,)
                for k, v in zip(klist, kv):
                    o[k] = v
                outs.append(o[klist + [x, y]])
            if outs:
                yield pd.concat(outs)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = convex_hull(pdf[[x, y]].to_numpy())
        if len(hull) == 1:
            cx, cy = float(hull[0, 0]), float(hull[0, 1])
        elif len(hull) == 2:
            cx, cy = float(hull[:, 0].mean()), float(hull[:, 1].mean())
        else:
            _, cx, cy = polygon_area_centroid(hull)
        row = {k: pdf[k].iloc[0] for k in klist}
        row.update({"cx": cx, "cy": cy})
        return pd.DataFrame([row])

    partials = points.mapInPandas(partial,
                                  schema=f"{key_schema}, {x} double, {y} double")
    cents = partials.groupBy(*keys).applyInPandas(
        final, f"{key_schema}, cx double, cy double")
    counts = points.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))
    return cents.join(counts, klist)


def merge_street_lines(segments: DataFrame, keys: Sequence[str] = ("street_id",),
                       cols: Sequence[str] = ("x1", "y1", "x2", "y2")) -> DataFrame:
    """ST_LineMerge per street (A6): applyInPandas group kernel over
    geometry.line_merge. Returns per-street merged-line stats
    (n_lines, n_points_longest)."""
    import pandas as pd

    from ..geo.geometry import line_merge

    out_schema = ", ".join(
        [f"{k} {dict((f.name, f.dataType.simpleString()) for f in segments.schema)[k]}"
         for k in keys]) + ", n_lines int, n_points_longest int"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lines = line_merge(pdf[list(cols)].to_numpy())
        row = {k: pdf[k].iloc[0] for k in keys}
        row["n_lines"] = len(lines)
        row["n_points_longest"] = max((len(l) for l in lines), default=0)
        return pd.DataFrame([row])

    return segments.groupBy(*keys).applyInPandas(merge, out_schema)
