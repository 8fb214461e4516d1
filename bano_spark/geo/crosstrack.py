"""Great-circle cross-track / along-track distances (the standard
aviation XTD/ATD formulas) — the navigation-QA layer completing
geodesy.haversine_m / great_circle_destination /
rhumb_line_navigation: "how far off the planned route is each fix,
and how far along it?" — with a corridor-membership audit.

Per-row closed forms over a FIXED route (anchor and its initial
bearing are Python-precomputed literals embedded in both engines):
    d13   = haversine central angle anchor -> point
    th13  = atan2 initial bearing anchor -> point
    XTD   = asin(sin(d13) * sin(th13 - th12))
    ATD   = acos(clamp(cos(d13) / cos(XTD))) -- clamped for the
            1-ulp acos domain spill
The chains are shared (name, sql) pairs (the wave-135 discipline):
per-row libm wobble is absorbed by round-6 / quantized aggregates;
corridor counts compare identical doubles on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["xtd_chain", "cross_track_band_stats", "corridor_counts"]

_D2R = repr(0.017453292519943295)
R_KM = 6371.0088
_Q = "1048576.0"

# route: (0E, 45N) -> (30E, 50N)
_PHI1 = repr(0.7853981633974483)
_TH12 = repr(1.1391218793946567)


def _q(e: str) -> str:
    return f"floor(({e}) * {_Q}) / {_Q}"


def xtd_chain() -> list[tuple[str, str]]:
    """Shared SQL chain; expects columns lon, lat (degrees)."""
    return [
        ("phi3", f"lat * {_D2R}"),
        ("dlam", f"lon * {_D2R}"),
        ("d13", f"2.0 * asin(sqrt(sin((phi3 - {_PHI1}) / 2.0) "
                f"* sin((phi3 - {_PHI1}) / 2.0) "
                f"+ cos({_PHI1}) * cos(phi3) "
                f"* sin(dlam / 2.0) * sin(dlam / 2.0)))"),
        ("th13", f"atan2(sin(dlam) * cos(phi3), "
                 f"cos({_PHI1}) * sin(phi3) "
                 f"- sin({_PHI1}) * cos(phi3) * cos(dlam))"),
        ("xtd", f"asin(sin(d13) * sin(th13 - {_TH12}))"),
        ("xtd_km", f"xtd * {R_KM!r}"),
        ("atd_km", f"acos(least(1.0, greatest(-1.0, "
                   f"cos(d13) / cos(xtd)))) * {R_KM!r}"),
        ("qax", _q("abs(xtd_km)")),
        ("qat", _q("atd_km")),
        ("band", "CAST(floor(lon / 10.0) AS INT)"),
    ]


def _apply(df: DataFrame) -> DataFrame:
    for name, sql in xtd_chain():
        df = df.selectExpr("*", f"{sql} AS {name}")
    return df


def cross_track_band_stats(df: DataFrame) -> DataFrame:
    """Per 10-degree longitude band: n, mean |XTD| km, max ATD km
    (quantized sums / order-free max). Returns (band, n,
    mean_abs_xtd_km, max_atd_km)."""
    d = _apply(df)
    return (d.groupBy("band")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("qax").alias("_sx"),
                 F.max("atd_km").alias("_ma"))
            .select("band", "n",
                    F.round(F.col("_sx") / F.col("n").cast("double"), 6)
                    .alias("mean_abs_xtd_km"),
                    F.round("_ma", 6).alias("max_atd_km")))


def corridor_counts(df: DataFrame,
                    widths_km: list[float]) -> DataFrame:
    """Per (band, corridor width): fixes within |XTD| < width.
    Returns (band, width_km, n_in, frac_in)."""
    d = _apply(df)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i, w in enumerate(widths_km):
        aggs.append(F.sum(F.when(F.abs(F.col("xtd_km"))
                                 < F.lit(float(w)), 1).otherwise(0))
                    .cast("bigint").alias(f"c{i}"))
    a = d.groupBy("band").agg(*aggs)
    structs = ", ".join(
        f"named_struct('w', CAST({float(w)!r} AS DOUBLE), 'c', c{i})"
        for i, w in enumerate(widths_km))
    return (a.select("band", "n",
                     F.explode(F.expr(f"array({structs})")).alias("x"))
            .select("band", F.col("x.w").alias("width_km"),
                    F.col("x.c").alias("n_in"),
                    F.round(F.col("x.c").cast("double")
                            / F.col("n").cast("double"), 6)
                    .alias("frac_in")))
