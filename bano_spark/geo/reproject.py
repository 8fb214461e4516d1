"""Coordinate reprojection kernels (S9: shp2pgsql -s 2154:4326).

The reference reprojects cadastre building shapefiles from Lambert-93
(EPSG:2154, the French legal projection) to WGS84 via shp2pgsql
(update_cadastre_batiments.sh:19-22). Here the inverse Lambert
conformal conic is implemented from the published EPSG formulas as a
vectorized numpy kernel wrapped in a pandas UDF — the engine's pattern
for geodesy math (no GDAL/pyproj dependency, Arrow-batched, scales
with partitions).

Constants are the EPSG:2154 definition (GRS80 ellipsoid, standard
parallels 44/49, origin 46.5N 3E, false origin 700000/6600000) —
public parameters, precomputed once at import to plain floats so the
SQL oracle can embed the identical literals.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

# EPSG:2154 / GRS80
A = 6378137.0
F_INV = 298.257222101
LAT0 = math.radians(46.5)
LAT1 = math.radians(44.0)
LAT2 = math.radians(49.0)
LON0 = math.radians(3.0)
X0 = 700000.0
Y0 = 6600000.0

_f = 1.0 / F_INV
E = math.sqrt(2.0 * _f - _f * _f)  # eccentricity
N_ITER = 7  # fixed-count latitude iteration (deterministic everywhere)


def _m(lat: float) -> float:
    return math.cos(lat) / math.sqrt(1.0 - (E * math.sin(lat)) ** 2)


def _t(lat: float) -> float:
    return math.tan(math.pi / 4.0 - lat / 2.0) / (
        (1.0 - E * math.sin(lat)) / (1.0 + E * math.sin(lat))) ** (E / 2.0)


# projection constants, precomputed to plain floats
N = (math.log(_m(LAT1)) - math.log(_m(LAT2))) / (math.log(_t(LAT1)) - math.log(_t(LAT2)))
BIG_F = _m(LAT1) / (N * _t(LAT1) ** N)
RHO0 = A * BIG_F * _t(LAT0) ** N


def lambert93_to_wgs84_np(x: np.ndarray, y: np.ndarray):
    """Inverse LCC-2SP (EPSG 9802 method), vectorized. Returns
    (lon_deg, lat_deg)."""
    dx = x - X0
    dy = RHO0 - (y - Y0)
    rho = np.sqrt(dx * dx + dy * dy)
    theta = np.arctan2(dx, dy)
    lon = LON0 + theta / N
    t = (rho / (A * BIG_F)) ** (1.0 / N)
    lat = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(N_ITER):
        es = E * np.sin(lat)
        lat = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - es) / (1.0 + es)) ** (E / 2.0))
    return np.degrees(lon), np.degrees(lat)


_OUT = T.StructType([
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
])


@F.pandas_udf(_OUT)
def lambert93_to_wgs84_udf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
    lon, lat = lambert93_to_wgs84_np(x.to_numpy(), y.to_numpy())
    return pd.DataFrame({"lon": lon, "lat": lat})


def oracle_select_cols(x_col: str, y_col: str, digits: int = 9) -> str:
    """ANSI-SQL twin of the inverse projection (same formula, same
    literal constants, same fixed iteration count), written as a chain
    of lateral column aliases (DuckDB resolves them left-to-right) so
    the fixed-point iteration stays linear in size. Outputs rounded to
    ``digits`` decimals of a degree (1e-9 deg ~ 0.1 mm) to absorb
    last-ULP libm differences between JVMs/libcs."""
    steps = [
        f"({x_col} - {X0!r}) AS dx",
        f"({RHO0!r} - ({y_col} - {Y0!r})) AS dyr",
        "sqrt(dx * dx + dyr * dyr) AS rho",
        f"pow(rho / {A * BIG_F!r}, {1.0 / N!r}) AS tt",
        "(pi() / 2.0 - 2.0 * atan(tt)) AS lat_0",
    ]
    for i in range(N_ITER):
        steps.append(
            f"(pi() / 2.0 - 2.0 * atan(tt * pow("
            f"(1.0 - {E!r} * sin(lat_{i})) / (1.0 + {E!r} * sin(lat_{i})),"
            f" {E / 2.0!r}))) AS lat_{i + 1}")
    steps.append(
        f"round(degrees({LON0!r} + atan2(dx, dyr) / {N!r}), {digits}) AS lon")
    steps.append(f"round(degrees(lat_{N_ITER}), {digits}) AS lat")
    return ",\n       ".join(steps)
