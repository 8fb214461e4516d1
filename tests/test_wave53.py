"""Hand-computed checks for the wave-53 operators: single-changepoint
split, log loss, rhumb-line legs, quadkey decode round-trip."""

import math

from pyspark.sql import functions as F

from bano_spark.geo import tiles
from bano_spark.operators.geodesy import rhumb_legs
from bano_spark.operators.quantiles import log_loss
from bano_spark.operators.temporal import changepoint_split


def test_changepoint_step(spark):
    # a clean level shift: 0,0,0,0 -> 10,10,10 splits after t=4
    rows = [("a", t, 0) for t in range(1, 5)] + \
           [("a", t, 10) for t in range(5, 8)]
    df = spark.createDataFrame(rows, "k string, t int, y long")
    out = changepoint_split(df, "k", "t", "y").collect()[0]
    assert out["split_t"] == 4
    assert out["n_left"] == 4 and out["n_right"] == 3
    assert out["sse_reduction"] == 1.0  # both segments constant


def test_changepoint_constant_series_null(spark):
    df = spark.createDataFrame([("a", t, 5) for t in range(1, 6)],
                               "k string, t int, y long")
    out = changepoint_split(df, "k", "t", "y").collect()[0]
    assert out["sse_reduction"] is None  # SSE_total = 0 -> guarded


def test_log_loss_known_value(spark):
    df = spark.createDataFrame([(0.8, True), (0.4, False)],
                               "p double, label boolean")
    out = log_loss(df, "p", "label").collect()[0]
    expect = -(math.log(0.8) + math.log(0.6)) / 2
    assert out["log_loss"] == round(expect, 6)
    assert out["n"] == 2 and out["base_rate"] == 0.5


def test_log_loss_clips_degenerate(spark):
    df = spark.createDataFrame([(0.0, True)], "p double, label boolean")
    out = log_loss(df, "p", "label", eps=1e-6).collect()[0]
    assert out["log_loss"] == round(-math.log(1e-6), 6)


def test_rhumb_east_leg(spark):
    # one due-east leg along latitude 0: distance = R * dlon
    df = spark.createDataFrame(
        [(1, 1, 1, 0.0, 0.0), (1, 2, 2, 1.0, 0.0)],
        "user_id bigint, ts bigint, event_id bigint, lon double, lat double")
    out = rhumb_legs(df, order_cols=["ts", "event_id"],
                     round_to=2).collect()[0]
    assert out["n_legs"] == 1
    assert out["rhumb_total_m"] == round(
        6371000.0 * math.radians(1.0), 2)
    assert out["net_bearing_deg"] == 90.0


def test_quadkey_roundtrip_exhaustive(spark):
    z = 4
    df = spark.createDataFrame(
        [(x, y) for x in range(2 ** z) for y in range(2 ** z)],
        "tx bigint, ty bigint")
    d = df.withColumn("qk", tiles.quadkey(F.col("tx"), F.col("ty"), z))
    tx2, ty2 = tiles.quadkey_decode(F.col("qk"), z)
    bad = d.filter((tx2 != F.col("tx")) | (ty2 != F.col("ty"))).count()
    assert bad == 0
    # prefix property: the z-1 parent shares the first z-1 digits
    one = d.filter((F.col("tx") == 5) & (F.col("ty") == 9)).first()["qk"]
    parent = (tiles.quadkey(F.lit(2), F.lit(4), z - 1))
    pref = spark.range(1).select(parent.alias("p")).first()["p"]
    assert one.startswith(pref)
