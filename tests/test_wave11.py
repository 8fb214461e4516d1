"""Wave-11 operator unit tests: DTW pinned to the naive O(r^2) DP,
the shared CTE generator pinned to the column path on Spark SQL, and
burstiness closed-form cases."""

import math

import pytest
from pyspark.sql import functions as F


def _naive_dtw(a, b):
    n, m = len(a), len(b)
    inf = float("inf")
    d = [[inf] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = math.dist(a[i - 1], b[j - 1])
            d[i][j] = c + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return d[n][m]


def _mk_traj(spark, tracks):
    rows = [(tid, s + 1, float(x), float(y))
            for tid, pts in tracks.items()
            for s, (x, y) in enumerate(pts)]
    return spark.createDataFrame(
        rows, "user_id long, seq long, x double, y double")


def test_dtw_matches_naive_dp(spark):
    from bano_spark.operators.trajectory import dtw_pairs

    a = [(0, 0), (1, 0), (2, 0), (3, 1), (4, 2), (5, 2), (6, 2), (7, 3)]
    b = [(0, 1), (1, 1), (2, 2), (3, 2), (4, 4), (5, 3), (6, 3), (7, 4)]
    traj = _mk_traj(spark, {1: a, 2: b})
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = dtw_pairs(traj, pairs, 8).first()
    assert row["dtw"] == pytest.approx(_naive_dtw(a, b), rel=1e-12)


def test_dtw_identical_tracks_zero(spark):
    from bano_spark.operators.trajectory import dtw_pairs

    a = [(i, 2 * i) for i in range(8)]
    traj = _mk_traj(spark, {1: a, 2: a})
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = dtw_pairs(traj, pairs, 8).first()
    assert row["dtw"] == pytest.approx(0.0, abs=1e-12)


def test_dtw_short_track_pair_dropped(spark):
    from bano_spark.operators.trajectory import dtw_pairs

    traj = _mk_traj(spark, {1: [(i, 0) for i in range(8)],
                            2: [(i, 1) for i in range(5)]})  # too short
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert dtw_pairs(traj, pairs, 8).count() == 0


def test_dtw_cte_sql_spark_dialect_matches_operator(spark):
    from bano_spark.operators.trajectory import dtw_cte_sql, dtw_pairs

    a = [(0, 0), (2, 1), (3, 5), (6, 5), (8, 2), (9, 0), (11, 1), (12, 4)]
    b = [(1, 1), (2, 3), (4, 6), (5, 4), (7, 3), (10, 1), (11, 3), (13, 5)]
    traj = _mk_traj(spark, {10: a, 11: b})
    traj.createOrReplaceTempView("dtw_traj")
    pairs = spark.createDataFrame([(10, 11)], "id_a long, id_b long")
    via_op = dtw_pairs(traj, pairs, 8).first()["dtw"]
    cost = """
      SELECT 10 AS id_a, 11 AS id_b, a.seq AS i, b.seq AS j,
             sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)) AS c
      FROM dtw_traj a JOIN dtw_traj b
        ON a.user_id = 10 AND b.user_id = 11"""
    sql = ("WITH " + dtw_cte_sql(cost, 8, "spark").lstrip()
           + "\nSELECT d FROM dtw_d8 WHERE j = 8")
    via_sql = spark.sql(sql).first()["d"]
    assert via_sql == via_op  # identical algebra -> bit-identical


def test_burstiness_regular_and_bursty(spark):
    from bano_spark.operators.temporal import interarrival_burstiness

    # key 1: perfectly regular 60s gaps -> sigma 0 -> B = -1
    rows = [(1, f"2024-01-01 00:{m:02d}:00") for m in range(6)]
    # key 2: bursty -- five 1s gaps then one huge gap
    rows += [(2, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:01"),
             (2, "2024-01-01 00:00:02"), (2, "2024-01-01 00:00:03"),
             (2, "2024-01-01 10:00:00")]
    df = spark.createDataFrame(rows, "k long, ts string") \
        .select("k", F.to_timestamp("ts").alias("ts"))
    out = {r["k"]: r for r in
           interarrival_burstiness(df, "k", "ts").collect()}
    assert out[1]["n_gaps"] == 5
    assert out[1]["std_gap_sec"] == pytest.approx(0.0, abs=1e-6)
    assert out[1]["burstiness"] == pytest.approx(-1.0, abs=1e-9)
    gaps = [1.0, 1.0, 1.0, 35997.0]
    mu = sum(gaps) / 4
    sd = math.sqrt(sum(g * g for g in gaps) / 4 - mu * mu)
    assert out[2]["burstiness"] == pytest.approx((sd - mu) / (sd + mu))
    assert out[2]["burstiness"] > 0.2  # clearly bursty side of Poisson
