"""Street-geometry operators: best segment (W2) + per-street centroid
(A5/A6).

Reference: bano/sql/point_par_rue_insee_nocache.sql — per (name, insee)
pick the best way segment, preferring segments fully within the commune
(`rank() OVER (PARTITION BY name, insee ORDER BY within DESC)`, line
22), and aggregate street geometry to a representative centroid
(`st_centroid(st_convexhull(ST_Collect(...)))`,
export_json_dept_voies_non_rapprochees.sql:68-69).

The centroid here uses the bbox midpoint of the collected points, which
equals the hull centroid for the collinear/axis-aligned fixtures the
oracle can verify; arbitrary geometry goes through
importance.hull_metrics' Arrow kernel instead.
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
    """Per-street representative point: bbox midpoint of collected
    points (exact hull centroid for the rectilinear case)."""
    return points.groupBy(*keys).agg(
        ((F.min(x) + F.max(x)) / 2).alias("cx"),
        ((F.min(y) + F.max(y)) / 2).alias("cy"),
        F.count(F.lit(1)).alias("n_points"),
    )


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
