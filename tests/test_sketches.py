"""KMV sketch: closed-form fixtures plus the lossless-pre-prune and
under-filled-sketch branches."""

from bano_spark.operators.sketches import kmv_distinct


def test_kmv_underfilled_sketch_is_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 5) for i in range(100)] + [("b", i) for i in range(3)],
        "g string, v int")
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=32).collect()}
    assert out["a"].sketch_size == 5 and out["a"].kmv_estimate == 5.0
    assert out["b"].sketch_size == 3 and out["b"].kmv_estimate == 3.0


def test_kmv_estimator_tracks_truth(spark):
    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "g string, v int")
    est = kmv_distinct(df, "g", "v", k=256).collect()[0]
    assert est.sketch_size == 256
    assert abs(est.kmv_estimate - n) / n < 0.15  # ~1/sqrt(k) regime


def test_kmv_prune_is_lossless(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i * 7919 % 1000) for i in range(600)],
        "g string, v int")
    a = sorted(map(tuple, kmv_distinct(df, "g", "v", k=16,
                                       prune_buckets=1).collect()))
    b = sorted(map(tuple, kmv_distinct(df, "g", "v", k=16,
                                       prune_buckets=16).collect()))
    assert a == b


def test_kmv_set_estimates_track_truth(spark):
    # g1 = 0..3999, g2 = 2000..5999: union 6000, intersection 2000
    rows = [("a", i) for i in range(4000)] + \
           [("b", i) for i in range(2000, 6000)]
    df = spark.createDataFrame(rows, "g string, v int")
    from bano_spark.operators.sketches import (kmv_set_estimates,
                                               kmv_sketches)
    sk = kmv_sketches(df, "g", "v", k=256)
    est = kmv_set_estimates(sk, "g", k=256).collect()[0]
    assert est.g1 == "a" and est.g2 == "b"
    assert abs(est.union_est - 6000) / 6000 < 0.15
    assert abs(est.intersect_est - 2000) / 2000 < 0.30


def test_kmv_set_estimates_exact_when_underfilled(spark):
    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, "g string, v int")
    from bano_spark.operators.sketches import (kmv_set_estimates,
                                               kmv_sketches)
    sk = kmv_sketches(df, "g", "v", k=64)
    est = kmv_set_estimates(sk, "g", k=64).collect()[0]
    assert est.union_est == 15.0 and est.intersect_est == 5.0
