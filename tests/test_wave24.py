"""Wave-24 operator unit tests: closest-facility tie-breaking and
allocation, HLL sliding-merge vs whole-window sketch, Delta
symmetry/zero, attribution window edges, PRF exclusion."""


def test_closest_facility_allocation_and_ties(spark):
    from bano_spark.operators.graph import multi_source_sssp

    # path graph 0-1-2-3-4 (unit weights), facilities at 0 and 4:
    # node 2 is equidistant -> smaller label wins
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(4)], "src long, dst long, w double")
    seeds = spark.createDataFrame([(0, 0), (4, 4)], "node long, lbl long")
    out = {r["node"]: (r["dist"], r["lbl"])
           for r in multi_source_sssp(edges, seeds).collect()}
    assert out[0] == (0.0, 0) and out[4] == (0.0, 4)
    assert out[1] == (1.0, 0) and out[3] == (1.0, 4)
    assert out[2] == (2.0, 0)  # tie -> min label


def test_closest_facility_negative_weight_raises(spark):
    import pytest

    from bano_spark.operators.graph import multi_source_sssp

    edges = spark.createDataFrame([(0, 1, -1.0)],
                                  "src long, dst long, w double")
    seeds = spark.createDataFrame([(0, 0)], "node long, lbl long")
    with pytest.raises(ValueError):
        multi_source_sssp(edges, seeds)


def test_hll_sliding_equals_whole_window_sketch(spark):
    from pyspark.sql import functions as F

    from bano_spark.operators.sketches import (
        hll_estimate_col, hll_sketch, hll_sliding_merge,
    )

    rows = [(b, f"u{b}_{i}") for b in range(4) for i in range(20)]
    df = spark.createDataFrame(rows, "b long, v string")
    sk = hll_sketch(df, "b", "v", p=6)
    slid = {r["b"]: r for r in
            hll_sliding_merge(sk, "b", 6, 2, round_to=6).collect()}
    # window [2,3] merged = sketch of rows with b in {2,3}
    whole = hll_sketch(df.filter(F.col("b") >= 2)
                       .withColumn("g", F.lit(1)), "g", "v", p=6)
    want = whole.select(F.round(hll_estimate_col("registers", 6), 6)
                        .alias("e")).collect()[0]["e"]
    assert slid[3]["estimate"] == want
    assert slid[3]["n_buckets"] == 2
    assert slid[0]["n_buckets"] == 1  # leading edge merges fewer


def test_stylometric_delta_identical_slices_zero(spark):
    from bano_spark.operators.textstats import stylometric_delta

    docs = spark.createDataFrame(
        [(1, "a", "x y z x"), (2, "b", "x y z x"),
         (3, "c", "x x x q q q")],
        "doc_id long, g string, text string")
    out = {(r["g1"], r["g2"]): r["delta"]
           for r in stylometric_delta(docs, "g", top_n=4).collect()}
    assert out[("a", "b")] == 0.0        # identical profiles
    assert out[("a", "c")] > 0.0
    assert out[("a", "c")] == out[("b", "c")]


def test_attribution_window_and_ties(spark):
    from datetime import datetime, timedelta

    from bano_spark.operators.eventflow import attribution_touches

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base - timedelta(seconds=7300), "view"),    # outside
        (2, 1, base - timedelta(seconds=100), "click"),    # first in
        (3, 1, base - timedelta(seconds=50), "signup"),    # last in
        (4, 1, base, "purchase"),
        (5, 2, base, "purchase"),                          # no touch
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {(r["model"], r["touch_type"]): r["n_conversions"]
           for r in attribution_touches(ev, "purchase", 7200).collect()}
    assert out[("first_touch", "click")] == 1
    assert out[("last_touch", "signup")] == 1
    assert ("first_touch", "view") not in out  # outside lookback


def test_prf_excludes_query_terms(spark):
    from bano_spark.operators.search import prf_expand

    docs = spark.createDataFrame(
        [(i, "query anchor filler" + str(i % 2)) for i in range(6)],
        "doc_id long, text string")
    out = prf_expand(docs, ["query"], fb_docs=3, expand_n=5).collect()
    terms = [r["term"] for r in out]
    assert "query" not in terms
    assert "anchor" in terms
