"""Kernel tests for wave 141: XTD/ATD vs direct python great-circle
formulas, on-route zero cross-track, and corridor nesting."""

from __future__ import annotations

import math

import pytest

from bano_spark.geo.crosstrack import (R_KM, corridor_counts,
                                       cross_track_band_stats)

_PHI1, _LAM1 = math.radians(45.0), 0.0
_TH12 = 1.1391218793946567


def _ref(lon, lat):
    phi3, lam3 = math.radians(lat), math.radians(lon)
    dl = lam3 - _LAM1
    d13 = 2 * math.asin(math.sqrt(
        math.sin((phi3 - _PHI1) / 2) ** 2
        + math.cos(_PHI1) * math.cos(phi3) * math.sin(dl / 2) ** 2))
    th13 = math.atan2(math.sin(dl) * math.cos(phi3),
                      math.cos(_PHI1) * math.sin(phi3)
                      - math.sin(_PHI1) * math.cos(phi3) * math.cos(dl))
    xtd = math.asin(math.sin(d13) * math.sin(th13 - _TH12))
    atd = math.acos(max(-1.0, min(1.0,
                                  math.cos(d13) / math.cos(xtd))))
    return xtd * R_KM, atd * R_KM


def _df(spark, pts):
    return spark.createDataFrame(pts, "lon: double, lat: double")


def test_xtd_vs_reference_single_points(spark):
    pts = [(5.0, 47.0), (15.0, 44.0), (25.0, 52.0), (35.0, 49.0)]
    rows = {r["band"]: r for r in
            cross_track_band_stats(_df(spark, pts)).collect()}
    for lon, lat in pts:
        band = math.floor(lon / 10.0)
        x, a = _ref(lon, lat)
        r = rows[band]
        assert r["n"] == 1
        assert r["mean_abs_xtd_km"] == pytest.approx(abs(x), abs=1e-2)
        assert r["max_atd_km"] == pytest.approx(a, abs=1e-4)


def test_point_on_route_has_zero_xtd(spark):
    # the route start itself (slightly along): XTD ~ 0
    pts = [(0.0, 45.0)]
    r = cross_track_band_stats(_df(spark, pts)).collect()[0]
    assert r["mean_abs_xtd_km"] == pytest.approx(0.0, abs=1e-6)
    # a point due north of the start is left of track: |XTD| > 0
    r2 = cross_track_band_stats(
        _df(spark, [(0.0, 48.0)])).collect()[0]
    assert r2["mean_abs_xtd_km"] > 100


def test_corridor_nesting(spark):
    pts = [(float(5 + i % 30), 40.0 + (i * 7 % 150) / 10.0)
           for i in range(300)]
    rows = corridor_counts(_df(spark, pts), [25.0, 100.0, 400.0]) \
        .collect()
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], {})[r["width_km"]] = r["n_in"]
    for band, d in by_band.items():
        assert d[25.0] <= d[100.0] <= d[400.0]
