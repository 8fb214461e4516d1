"""Hand-computed checks for the wave-59 operators: Chaikin smoothing,
Tissot distortion, circular dispersion."""

import math

from pyspark.sql import functions as F

from bano_spark.operators.geodesy import tissot_mercator_stats
from bano_spark.operators.simplify import chaikin_length_stats, chaikin_smooth
from bano_spark.operators.trajectory import circular_dispersion


def _L(spark, pts):
    return spark.createDataFrame(
        [(1, i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "user_id bigint, seq bigint, x double, y double")


def test_chaikin_one_round_right_angle(spark):
    # L-shape (0,0)-(10,0)-(10,10): one round gives the classic
    # 4-point cut: (0,0),(2.5,0),(7.5,0),(10,2.5),(10,7.5),(10,10)
    out = chaikin_smooth(_L(spark, [(0, 0), (10, 0), (10, 10)]),
                         iters=1).orderBy("seq").collect()
    coords = [(r["x"], r["y"]) for r in out]
    assert coords == [(0.0, 0.0), (2.5, 0.0), (7.5, 0.0),
                      (10.0, 2.5), (10.0, 7.5), (10.0, 10.0)]


def test_chaikin_shortens_and_counts(spark):
    df = _L(spark, [(0, 0), (10, 0), (10, 10), (20, 10)])
    out = chaikin_length_stats(df, iters=2).collect()[0]
    assert out["n_verts_in"] == 4
    # n -> 2(n-1) + 2 per round: 4 -> 8 -> 16
    assert out["n_verts_out"] == 16
    raw_len = 10 + 10 + 10
    assert out["smoothed_length"] < raw_len
    assert out["smoothed_length"] > 20  # still connects the ends


def test_chaikin_straight_line_invariant_length(spark):
    df = _L(spark, [(0, 0), (10, 0), (20, 0), (30, 0)])
    out = chaikin_length_stats(df, iters=2).collect()[0]
    assert out["smoothed_length"] == 30.0  # collinear: no shortening


def test_tissot_equator_and_60n(spark):
    pts = spark.createDataFrame([(1, 0.0), (2, 60.0)],
                                "user_id bigint, lat double")
    out = {r["user_id"]: r for r in
           tissot_mercator_stats(pts).collect()}
    assert out[1]["mean_scale"] == 1.0
    assert abs(out[2]["mean_scale"] - 2.0) < 1e-6  # sec(60) = 2
    assert abs(out[2]["mean_areal"] - 4.0) < 1e-5


def test_circular_dispersion_concentrated_vs_uniform(spark):
    # all moves due east -> R ~ 1, tiny variance, huge kappa;
    # 4 cardinal moves -> R = 0, variance 1, kappa ~ 0
    rows = [(1, 1.0, 0.0)] * 8 + \
           [(2, 1.0, 0.0), (2, -1.0, 0.0), (2, 0.0, 1.0), (2, 0.0, -1.0)]
    df = spark.createDataFrame(rows, "user_id bigint, dx double, dy double")
    out = {r["user_id"]: r for r in circular_dispersion(df).collect()}
    assert out[1]["circ_var"] < 1e-5
    assert out[1]["mean_bearing_deg"] == 0.0
    assert out[1]["kappa"] > 1e5  # capped-R concentrated branch
    assert out[2]["circ_var"] == 1.0
    assert out[2]["kappa"] == 0.0
