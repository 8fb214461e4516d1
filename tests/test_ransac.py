"""Kernel tests for wave 134: ransac_line vs a step-by-step python
RANSAC (same hash-seeded samples), robustness vs OLS on planted
outliers, and a clean-data case where both agree."""

from __future__ import annotations

import pytest

from bano_spark.operators.ransac import ransac_candidates, ransac_line

_M31 = 2147483648
_A1, _B1 = 2654435761, 101
_A2, _B2 = 1103515245, 57


def _ref(pts, n_cand=16, tol=2.5):
    n = len(pts)
    best = None
    for s in range(n_cand):
        x1, y1 = pts[(s * _A1 + _B1) % n]
        x2, y2 = pts[(s * _A2 + _B2) % n]
        if x1 == x2:
            inl, a, b = -1, None, None
        else:
            b = (y2 - y1) / (x2 - x1)
            a = y1 - b * x1
            inl = sum(1 for x, y in pts if abs(y - (a + b * x)) <= tol)
        if best is None or (inl, -s) > (best[0], -best[1]):
            best = (inl, s, a, b)
    inl, s, a, b = best
    sel = [(x, y) for x, y in pts if abs(y - (a + b * x)) <= tol]
    ni = len(sel)
    sx = sum(x for x, _ in sel)
    sy = sum(y for _, y in sel)
    sxy = sum(x * y for x, y in sel)
    sxx = sum(x * x for x, _ in sel)
    br = (ni * sxy - sx * sy) / (ni * sxx - sx * sx)
    return s, inl, br, (sy - br * sx) / ni


def _outlier_pts(n=500):
    # outlier period 7, coprime with the sampler's mod-n cosets (a
    # period-5 pattern aliases: one sample slot lands on outliers for
    # EVERY candidate — worth knowing, but not what this test pins)
    pts = []
    for i in range(n):
        u1 = (i * 2654435761 + 13) % _M31
        u2 = (i * 1103515245 + 12345) % _M31
        x = u1 % 50
        y = u2 % 300 if i % 7 == 0 else 10 + 4 * x + (u2 % 5) - 2
        pts.append((x, y))
    return pts


def test_ransac_vs_reference(spark):
    pts = _outlier_pts()
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(pts)],
        "grp: string, id: bigint, x: bigint, y: bigint")
    row = ransac_line(df, "grp", "x", "y", "id").collect()[0]
    s, inl, br, ar = _ref(pts)
    assert row["best_cand"] == s and row["inliers"] == inl
    assert row["slope_ransac"] == pytest.approx(br, abs=1e-6)
    assert row["icept_ransac"] == pytest.approx(ar, abs=1e-6)
    # robustness: RANSAC slope closer to planted 4 than OLS
    assert abs(row["slope_ransac"] - 4) < abs(row["slope_ols"] - 4)
    assert abs(row["slope_ransac"] - 4) < 0.3


def test_clean_data_agreement(spark):
    pts = [(x, 5 + 2 * x) for x in range(40)]
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(pts)],
        "grp: string, id: bigint, x: bigint, y: bigint")
    row = ransac_line(df, "grp", "x", "y", "id").collect()[0]
    assert row["slope_ransac"] == pytest.approx(2.0, abs=1e-9)
    assert row["slope_ols"] == pytest.approx(2.0, abs=1e-9)
    assert row["inliers"] == 40


def test_candidate_table_consistent(spark):
    pts = _outlier_pts(300)
    df = spark.createDataFrame(
        [("g", i, x, y) for i, (x, y) in enumerate(pts)],
        "grp: string, id: bigint, x: bigint, y: bigint")
    cands = ransac_candidates(df, "grp", "x", "y", "id").collect()
    assert len(cands) == 16
    best = ransac_line(df, "grp", "x", "y", "id").collect()[0]
    top = max(cands, key=lambda r: (r["inliers"], -r["cand"]))
    assert top["cand"] == best["best_cand"]
    assert top["inliers"] == best["inliers"]
