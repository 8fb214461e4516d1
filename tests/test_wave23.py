"""Wave-23 operator unit tests: curvature closed forms (paraboloid,
plane), flow-length exact step counts, geodesic destination
round-trips, novelty extremes, and Good-Turing on a planted Zipf
spectrum."""

import math


def test_curvature_paraboloid(spark):
    from bano_spark.operators.raster import terrain_curvature

    # z = x^2 + y^2 (convex bowl), cell = 1: D = E = 1, F = 0,
    # general = -2*(1+1)*100 = -400 at every interior cell with
    # nonzero gradient (the center cell (1,1) of a 3x3 around origin
    # has G=H=... nonzero if offset from the bowl bottom)
    dem = spark.createDataFrame(
        [(x, y, x * x + y * y) for x in range(5) for y in range(5)],
        "gx long, gy long, z long")
    out = {(r["gx"], r["gy"]): r for r in
           terrain_curvature(dem, 1.0).collect()}
    r = out[(2, 3)]
    assert r["curv_general"] == -400.0
    # plane: all second derivatives zero
    flat = spark.createDataFrame(
        [(x, y, 7 * x) for x in range(4) for y in range(4)],
        "gx long, gy long, z long")
    for r in terrain_curvature(flat, 1.0).collect():
        assert (r["curv_general"], r["curv_profile"],
                r["curv_plan"]) == (0.0, 0.0, 0.0)


def test_flow_path_length_line(spark):
    from bano_spark.operators.raster import flow_path_length

    # strictly descending line: cell k is k steps (cardinal) from the
    # sink at x=4
    dem = spark.createDataFrame(
        [(x, 0, 10 - x) for x in range(5)], "gx long, gy long, z long")
    out = {(r["gx"], r["gy"]): r for r in
           flow_path_length(dem, 30.0).collect()}
    for x in range(5):
        r = out[(x, 0)]
        assert (r["n_cardinal"], r["n_diagonal"]) == (4 - x, 0)
        assert r["path_len"] == round((4 - x) * 30.0, 6)


def test_flow_path_length_diagonal(spark):
    from bano_spark.operators.raster import flow_path_length

    # diagonal descent: (0,0) -> (1,1) -> (2,2)
    dem = spark.createDataFrame(
        [(k, k, 10 - k) for k in range(3)], "gx long, gy long, z long")
    out = {(r["gx"], r["gy"]): r for r in
           flow_path_length(dem, 1.0).collect()}
    assert out[(0, 0)]["n_diagonal"] == 2
    assert out[(0, 0)]["path_len"] == round(2 * math.sqrt(2.0), 6)


def test_destination_point_cardinal(spark):
    from bano_spark.operators.geodesy import _EARTH_R, destination_point
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0.0, 0.0, 0.0), (0.0, 0.0, 90.0)],
                               "lon double, lat double, b double")
    lon2, lat2 = destination_point(F.col("lon"), F.col("lat"),
                                   F.col("b"), 111194.9)
    out = df.select(F.col("b"), F.round(lon2, 3).alias("lon2"),
                    F.round(lat2, 3).alias("lat2")).collect()
    deg = math.degrees(111194.9 / _EARTH_R)
    r = {row["b"]: row for row in out}
    # due north from the equator: ~1 degree of latitude
    assert r[0.0]["lat2"] == round(deg, 3) and r[0.0]["lon2"] == 0.0
    # due east along the equator: ~1 degree of longitude
    assert r[90.0]["lon2"] == round(deg, 3) and r[90.0]["lat2"] == 0.0


def test_ngram_novelty_extremes(spark):
    from bano_spark.operators.webtext import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "p q r s t u")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(docs, 5).collect()}
    assert out[1]["novelty"] == 1.0      # first occurrence
    assert out[2]["novelty"] == 0.0      # full copy of doc 1
    assert out[3]["novelty"] == 1.0      # disjoint vocabulary
    assert out[1]["n_grams"] == 2        # 6 tokens -> two 5-grams


def test_good_turing_monotone_fit(spark):
    from bano_spark.operators.textstats import good_turing

    # planted spectrum: many singletons, few repeats (Zipf-ish)
    words = [f"w{i}" for i in range(40)]
    text1 = " ".join(words)                     # 40 singletons...
    text2 = " ".join(words[:10])                # ...10 become doubles
    docs = spark.createDataFrame(
        [(1, text1), (2, text2)], "doc_id long, text string")
    out = {r["r"]: r for r in good_turing(docs).collect()}
    assert out[1]["s_r"] == 30 and out[2]["s_r"] == 10
    # smoothed counts stay positive and ordered
    assert 0 < out[1]["r_star"] < out[2]["r_star"]
