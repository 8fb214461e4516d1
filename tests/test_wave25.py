"""Wave-25 operator unit tests: ring validity cases, redirect cycles,
co-citation arithmetic, ACF closed forms."""


def _ring(spark, rid, pts):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("ring_id", T.StringType()),
        T.StructField("verts", T.ArrayType(T.ArrayType(T.DoubleType())))])
    return spark.createDataFrame([(rid, pts)], schema)


def test_ring_validity_cases(spark):
    from bano_spark.operators.geodesy import ring_validity

    sq = _ring(spark, "sq", [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0],
                             [0.0, 4.0], [0.0, 0.0]])
    cw = _ring(spark, "cw", [[0.0, 0.0], [0.0, 4.0], [4.0, 4.0],
                             [4.0, 0.0], [0.0, 0.0]])
    open_ring = _ring(spark, "open", [[0.0, 0.0], [4.0, 0.0],
                                      [4.0, 4.0], [0.0, 4.0]])
    bow = _ring(spark, "bow", [[0.0, 0.0], [10.0, 10.0], [10.0, 0.0],
                               [0.0, 10.0], [0.0, 0.0]])
    rings = sq.unionByName(cw).unionByName(open_ring).unionByName(bow)
    out = {r["ring_id"]: r for r in ring_validity(rings).collect()}
    assert out["sq"]["orientation"] == "ccw"
    assert out["sq"]["signed_area"] == 16.0 and out["sq"]["is_valid"]
    assert out["cw"]["orientation"] == "cw"
    assert out["cw"]["signed_area"] == -16.0 and out["cw"]["is_valid"]
    assert not out["open"]["closed"] and not out["open"]["is_valid"]
    assert out["bow"]["n_crossings"] == 1
    assert out["bow"]["orientation"] == "degenerate"
    assert not out["bow"]["is_valid"]


def test_redirect_resolution_chain_and_cycle(spark):
    from bano_spark.operators.webtext import resolve_redirects

    links = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 2),        # chain 3->2->1->0
         (10, 11), (11, 10)],                   # 2-cycle
        "url_id long, target_id long")
    out = {r["url_id"]: (r["canonical_id"], r["resolved"])
           for r in resolve_redirects(links, rounds=4).collect()}
    assert out[3] == (0, True) and out[1] == (0, True)
    assert out[0] == (0, True)
    assert out[10] == (None, False) and out[11] == (None, False)


def test_cocitation_coupling_counts(spark):
    from bano_spark.operators.graph import cocitation_coupling

    # citers 1,2 both cite a and b; a and b both cite t
    edges = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 100), (2, 101), (100, 7), (101, 7)],
        "src long, dst long")
    out = {(r["node_a"], r["node_b"]): (r["cocitation"], r["coupling"])
           for r in cocitation_coupling(edges).collect()}
    assert out[(100, 101)] == (2, 1)   # co-cited by 1,2; both cite 7
    assert out[(1, 2)] == (0, 2)       # share two targets


def test_acf_constant_and_alternating(spark):
    from datetime import datetime, timedelta

    from bano_spark.operators.temporal import acf_profile

    base = datetime(2024, 1, 1)
    # alternating +1/-1 series: acf(1) ~ -1, acf(2) ~ +1
    rows = [("a", base + timedelta(hours=h), 1.0 if h % 2 == 0 else -1.0)
            for h in range(40)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["lag"]: r["acf"]
           for r in acf_profile(df, "k", "ts", "v", max_lag=2).collect()}
    assert out[1] < -0.9 and out[2] > 0.9
