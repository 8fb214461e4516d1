"""Kernel tests for wave 135: Equal Earth forward vs a direct numpy
implementation (published coefficients, spot values), equal-area
symmetry properties, and UTM scale behavior (k0 on the central
meridian, growing with |dlon|)."""

from __future__ import annotations

import math

import pytest

from bano_spark.geo.equalearth import equal_earth_bands, utm_scale_audit

A1, A2, A3, A4 = 1.340264, -0.081106, 0.000893, 0.003796


def _ee(lon, lat):
    lam, phi = math.radians(lon), math.radians(lat)
    th = math.asin(math.sqrt(3) / 2 * math.sin(phi))
    t2, t6 = th * th, th ** 6
    dy = A1 + 3 * A2 * t2 + t6 * (7 * A3 + 9 * A4 * t2)
    x = 2 * math.sqrt(3) / 3 * lam * math.cos(th) / dy
    y = th * (A1 + A2 * t2 + t6 * (A3 + A4 * t2))
    return x, y


def test_equal_earth_vs_reference(spark):
    pts = [(-180.0, 0.0), (180.0, 0.0), (0.0, 45.0), (90.0, -60.0),
           (-120.0, 79.9), (30.0, -79.9)]
    df = spark.createDataFrame(pts, "lon: double, lat: double")
    rows = {r["band"]: r for r in equal_earth_bands(df).collect()}
    # single-point bands give exact per-point values (quantized)
    for lon, lat in pts:
        band = math.floor(lat / 10.0)
        x, y = _ee(lon, lat)
        r = rows[band]
        if r["n"] == 1:
            assert r["mean_abs_x"] == pytest.approx(abs(x), abs=2e-6)
            assert r["mean_y"] == pytest.approx(y, abs=2e-6)
    # equator, lon 180: published x extent ~2.7066 (R=1)
    x180, _ = _ee(180.0, 0.0)
    assert x180 == pytest.approx(2.7066, abs=1e-3)
    # poleward y approaches ~1.312 (R=1)
    _, ytop = _ee(0.0, 89.99)
    assert ytop == pytest.approx(1.3173, abs=1e-2)


def test_equal_earth_band_rollup(spark):
    pts = [(float(lon), 5.0) for lon in range(-170, 171, 10)]
    df = spark.createDataFrame(pts, "lon: double, lat: double")
    rows = equal_earth_bands(df).collect()
    assert len(rows) == 1 and rows[0]["band"] == 0
    ref = sum(abs(_ee(lon, 5.0)[0]) for lon, _ in pts) / len(pts)
    assert rows[0]["mean_abs_x"] == pytest.approx(ref, abs=1e-5)


def test_utm_scale_behavior(spark):
    # zone 31 spans 0..6E, central meridian 3E
    pts = [(3.0, 45.0), (0.01, 45.0), (5.99, 45.0), (3.0, 0.0),
           (0.01, 0.0)]
    df = spark.createDataFrame(pts, "lon: double, lat: double")
    row = {r["zone"]: r for r in utm_scale_audit(df).collect()}[31]
    assert row["n"] == 5
    # k = k0 exactly on the central meridian; max at equator edge
    k_edge = 0.9996 / math.sqrt(
        1 - (math.cos(0.0) * math.sin(math.radians(0.01 - 3))) ** 2)
    assert row["max_k"] == pytest.approx(k_edge, abs=1e-6)
    assert row["max_k"] > 0.9996
    assert row["n_over_tol"] == sum(
        1 for lon, lat in pts
        if 0.9996 / math.sqrt(
            1 - (math.cos(math.radians(lat))
                 * math.sin(math.radians(lon - 3))) ** 2) > 1.0005)
