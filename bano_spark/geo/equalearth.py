"""Equal Earth projection (Savric, Patterson & Jenny 2018) and UTM
point scale factor — the modern equal-area pseudocylindrical and the
conformal workhorse, completing the projection family
(geo/reproject.py Lambert-93, lonlat_to_mercator, albers,
tissot_mercator_distortion).

Both are per-row closed forms built as SHARED SQL chains (one helper
emits the identical text for the engine's selectExpr and the oracle's
CTEs), so the only cross-engine freedom is libm's 1-ulp wobble on
sin/cos/asin — which the per-row round-to-6 absorbs (the
vincenty_vs_haversine precedent), and which never reaches an
aggregate: every summed quantity is MICRO-QUANTIZED to the 2^-24
dyadic grid first (exact sums, order-free), with max() the only raw-
double aggregate (order-free by definition).

Equal Earth forward (theta the auxiliary latitude):
    theta = asin((sqrt(3)/2) sin(phi))
    x = (2 sqrt(3)/3) lambda cos(theta) / dy(theta)
    y = theta (A1 + A2 t2 + t6 (A3 + A4 t2))
    dy = A1 + 3 A2 t2 + t6 (7 A3 + 9 A4 t2)
UTM (spherical point scale, k0 = 0.9996):
    k = k0 / sqrt(1 - (cos(phi) sin(lambda - lambda0))^2)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["EE_CHAIN", "UTM_CHAIN", "equal_earth_bands",
           "utm_scale_audit"]

_D2R = repr(0.017453292519943295)
_A1, _A2, _A3, _A4 = 1.340264, -0.081106, 0.000893, 0.003796
_Q = "16777216.0"


def _q(e: str) -> str:
    return f"floor(({e}) * {_Q}) / {_Q}"


# (name, sql) chain shared verbatim by engine and oracle; assumes
# input columns lon, lat in degrees
EE_CHAIN: list[tuple[str, str]] = [
    ("lonr", f"lon * {_D2R}"),
    ("th", f"asin({repr(0.8660254037844386)} * sin(lat * {_D2R}))"),
    ("t2", "th * th"),
    ("t6", "(th * th) * (th * th) * (th * th)"),
    ("eex", f"{repr(1.1547005383792515)} * lonr * cos(th) / "
            f"({_A1!r} + {3 * _A2!r} * t2 + t6 * "
            f"({7 * _A3!r} + {9 * _A4!r} * t2))"),
    ("eey", f"th * ({_A1!r} + {_A2!r} * t2 + t6 * "
            f"({_A3!r} + {_A4!r} * t2))"),
    ("qax", _q("abs(eex)")),
    ("qy", _q("eey")),
    ("band", "CAST(floor(lat / 10.0) AS INT)"),
]

UTM_CHAIN: list[tuple[str, str]] = [
    ("zone", "CAST(floor((lon + 180.0) / 6.0) AS INT) + 1"),
    ("lam0", "CAST(zone * 6 - 183 AS DOUBLE)"),
    ("bb", f"cos(lat * {_D2R}) * sin((lon - lam0) * {_D2R})"),
    ("kk", f"{repr(0.9996)} / sqrt(1.0 - bb * bb)"),
    ("qk", _q("kk")),
]


def _apply(df: DataFrame, chain) -> DataFrame:
    for name, sql in chain:
        df = df.selectExpr("*", f"{sql} AS {name}")
    return df


def equal_earth_bands(df: DataFrame) -> DataFrame:
    """Project (lon, lat) rows and roll up per 10-degree latitude
    band: n, mean |x| and mean y of the projection (micro-quantized
    before the exact sums). Returns (band, n, mean_abs_x, mean_y)."""
    d = _apply(df, EE_CHAIN)
    return (d.groupBy("band")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("qax").alias("_sx"), F.sum("qy").alias("_sy"))
            .select("band", "n",
                    F.round(F.col("_sx") / F.col("n").cast("double"), 6)
                    .alias("mean_abs_x"),
                    F.round(F.col("_sy") / F.col("n").cast("double"), 6)
                    .alias("mean_y")))


def utm_scale_audit(df: DataFrame, *, tol: float = 1.0005) -> DataFrame:
    """Assign UTM zones and audit the point scale factor per zone:
    n, max k (raw double — max is order-free), mean k (quantized
    sums), and the count beyond `tol`. Returns (zone, n, max_k,
    mean_k, n_over_tol)."""
    d = _apply(df, UTM_CHAIN)
    return (d.groupBy("zone")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.max("kk").alias("_mx"), F.sum("qk").alias("_sk"),
                 F.sum(F.when(F.col("kk") > tol, 1).otherwise(0))
                 .cast("bigint").alias("n_over_tol"))
            .select("zone", "n", F.round("_mx", 6).alias("max_k"),
                    F.round(F.col("_sk") / F.col("n").cast("double"), 6)
                    .alias("mean_k"), "n_over_tol"))
