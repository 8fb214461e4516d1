"""Unit tests: distributed covariance / PCA vs NumPy."""

import numpy as np
import pytest


def _mk(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id int, embedding array<double>")


def test_covariance_matches_numpy(spark):
    from bano_spark.operators.linalg import embedding_covariance

    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 6))
    want = np.cov(x, rowvar=False, ddof=1)
    rows = embedding_covariance(_mk(spark, x)).collect()
    assert len(rows) == 6 * 7 // 2
    for r in rows:
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-9)

    # partitioning-invariant (sums are additive)
    rows2 = embedding_covariance(_mk(spark, x).repartition(7)).collect()
    a = {(r["i"], r["j"]): r["cov"] for r in rows}
    b = {(r["i"], r["j"]): r["cov"] for r in rows2}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_pca_recovers_dominant_axis(spark):
    from bano_spark.operators.linalg import pca_components, pca_project

    rng = np.random.default_rng(11)
    # variance overwhelmingly along a known direction
    axis = np.array([3.0, 0.0, 4.0]) / 5.0
    x = (rng.normal(size=(300, 1)) * 10) @ axis[None, :] \
        + rng.normal(size=(300, 3)) * 0.1
    df = _mk(spark, x)
    vals, comps = pca_components(df, 2)
    assert vals[0] > 50 * vals[1]
    assert abs(float(np.dot(comps[0], axis))) > 0.999

    proj = {r["vec_id"]: r["proj"] for r in pca_project(df, comps).collect()}
    want = x @ comps.T
    for i in range(300):
        assert proj[i][0] == pytest.approx(want[i, 0], abs=1e-9)
        assert proj[i][1] == pytest.approx(want[i, 1], abs=1e-9)
