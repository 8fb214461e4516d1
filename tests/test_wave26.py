"""Wave-26 operator unit tests: Strahler on a hand-built river tree,
cross-K on planted co-location, sequence support semantics, rolling
slope on a linear series, quotation jaccard."""


def test_strahler_classic_tree(spark):
    from bano_spark.operators.raster import strahler_order

    # a Y-network: two order-1 headwaters at (0,2) and (2,2) flow
    # into (1,1), which flows into the sink (1,0).
    # heights force: (0,2),(2,2) -> (1,1) -> (1,0)
    dem = spark.createDataFrame(
        [(0, 2, 10), (2, 2, 10), (1, 1, 5), (1, 0, 0)],
        "gx long, gy long, z long")
    out = {(r["gx"], r["gy"]): r["strahler"]
           for r in strahler_order(dem).collect()}
    assert out[(0, 2)] == 1 and out[(2, 2)] == 1
    assert out[(1, 1)] == 2          # two order-1 children -> 2
    assert out[(1, 0)] == 2          # one order-2 child -> stays 2


def test_strahler_single_chain_stays_one(spark):
    from bano_spark.operators.raster import strahler_order

    dem = spark.createDataFrame(
        [(x, 0, 10 - x) for x in range(6)], "gx long, gy long, z long")
    out = strahler_order(dem).collect()
    assert all(r["strahler"] == 1 for r in out)


def test_cross_k_colocated_vs_separated(spark):
    from bano_spark.operators.spatialstats import cross_k

    # type a and b interleaved in one tight cluster -> K_ab large;
    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 5), 0.0)
            for i in range(20)]
    pts = spark.createDataFrame(
        rows, "event_id long, ptype string, x double, y double")
    out = {r["r"]: r for r in
           cross_k(pts, [10.0], 100.0 * 100.0).collect()}
    assert out[10.0]["n_pairs"] == 100  # all 10x10 within r

    far = [(i, "a", 0.0, 0.0) for i in range(5)] + \
          [(100 + i, "b", 5000.0, 0.0) for i in range(5)]
    pts2 = spark.createDataFrame(
        far, "event_id long, ptype string, x double, y double")
    out2 = cross_k(pts2, [10.0], 1.0).collect()
    assert out2[0]["n_pairs"] == 0


def test_sequence_patterns_gap_and_order(spark):
    from datetime import datetime, timedelta

    from bano_spark.operators.eventflow import sequence_patterns

    base = datetime(2024, 1, 1)
    rows = [
        (1, base, "A"), (1, base + timedelta(seconds=100), "B"),
        (2, base, "A"), (2, base + timedelta(seconds=100), "B"),
        (3, base, "B"), (3, base + timedelta(seconds=100), "A"),
        (3, base + timedelta(seconds=5000), "B"),  # outside gap
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {(r["type_a"], r["type_b"]): r["support"]
           for r in sequence_patterns(ev, 1000, 2).collect()}
    assert out[("A", "B")] == 2
    assert ("B", "A") not in out  # support 1 < 2


def test_rolling_slope_linear_series(spark):
    from datetime import datetime, timedelta

    from bano_spark.operators.temporal import rolling_trend_slope

    base = datetime(2024, 1, 1)
    rows = [("k", base + timedelta(hours=h), 5.0 * h) for h in range(30)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = rolling_trend_slope(df, "k", "ts", "v", window=10).collect()
    assert all(r["slope"] == 5.0 for r in out)


def test_cross_host_quotations_planted(spark):
    from bano_spark.operators.webtext import cross_host_quotations

    q = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, "h1", "local alpha beta " + q),
         (2, "h2", "other gamma delta " + q),
         (3, "h3", "totally unrelated words only here nothing shared x y")],
        "doc_id long, host string, text string")
    out = {(r["host_a"], r["host_b"]): r["shared_grams"]
           for r in cross_host_quotations(docs, "host", 8).collect()}
    assert out[("h1", "h2")] >= 1
    assert ("h1", "h3") not in out
