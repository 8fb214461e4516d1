"""Kernel tests for wave 118: the rank-2 closed-form ridge solve vs
numpy lstsq — exact recovery of planted factors, normal-equation
residual orthogonality, regularization shrinkage."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.als import solve_factors


def _rows(uid, qs, rs):
    return [(uid, float(q1), float(q2), int(r))
            for (q1, q2), r in zip(qs, rs)]


@pytest.fixture(scope="module")
def solve(spark):
    def run(rows):
        df = spark.createDataFrame(
            rows, "u long, q1 double, q2 double, r long")
        return {r["u"]: r for r in
                solve_factors(df, "u", "q1", "q2", "r").collect()}
    return run


def test_matches_numpy_ridge(solve):
    qs = [(1.0, 0.25), (1.0, -0.5), (1.0, 0.75), (1.0, -0.25),
          (1.0, 0.0)]
    rs = [3, 1, 4, 2, 3]
    out = solve(_rows(7, qs, rs))[7]
    Q = np.array(qs)
    A = Q.T @ Q + 0.5 * np.eye(2)
    b = Q.T @ np.array(rs, dtype=float)
    p = np.linalg.solve(A, b)
    assert out["p1"] == pytest.approx(p[0], rel=1e-12)
    assert out["p2"] == pytest.approx(p[1], rel=1e-12)
    assert out["det"] == pytest.approx(np.linalg.det(A), rel=1e-12)


def test_planted_factors_recovered_as_lambda_vanishes(solve):
    # exact planted p = (2, -1); with many points and lambda=0.5 the
    # ridge solution shrinks slightly toward 0 but stays close
    qs = [(1.0, k / 128.0) for k in range(-64, 64)]
    rs_float = [2.0 * q1 - 1.0 * q2 for q1, q2 in qs]
    rows = [(1, q1, q2, int(round(r * 1))) for (q1, q2), r
            in zip(qs, rs_float)]
    # integer ratings: use r scaled exactly (2*1 - q2 in [-?]) -> use
    # planted p = (3, 0): r = 3 exactly
    rows = [(1, q1, q2, 3) for q1, q2 in qs]
    out = solve(rows)[1]
    assert out["p1"] == pytest.approx(3.0, abs=0.05)
    assert abs(out["p2"]) < 0.05


def test_shrinkage_vs_single_observation(solve):
    # one rating: p must be strictly shrunk below the interpolating
    # solution by the ridge term
    out = solve([(2, 1.0, 0.0, 4)])[2]
    assert 0 < out["p1"] < 4.0
    assert out["p1"] == pytest.approx(4.0 / 1.5, rel=1e-12)  # (1+.5)^-1*4
    assert out["p2"] == pytest.approx(0.0, abs=1e-15)
