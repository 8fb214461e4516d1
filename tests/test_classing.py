"""Hand-computed checks for the choropleth classification operators
(wave 51)."""

from bano_spark.operators.classing import (
    equal_interval_classes, head_tail_breaks, jenks_natural_breaks,
    quantile_classes)


def test_jenks_three_obvious_clusters(spark):
    vals = [1, 2, 3, 10, 11, 20]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = jenks_natural_breaks(df, "v", k=3).collect()
    assert [r["class"] for r in out] == [1, 2, 3]
    assert [r["upper_bound"] for r in out] == [3, 11, 20]
    # SSE_k = 2 + 0.5 + 0; SSE_1 = 635 - 2209/6
    sse1 = 635 - 2209 / 6
    assert out[0]["gvf"] == round(1 - 2.5 / sse1, 6)


def test_jenks_counts_weighting(spark):
    # duplicated values must weight the DP: 1,1,1,1,9 with k=2 splits
    # {1x4} | {9}, not by distinct-value midpoint
    df = spark.createDataFrame([(1,)] * 4 + [(9,)], "v bigint")
    out = jenks_natural_breaks(df, "v", k=2).collect()
    assert [r["upper_bound"] for r in out] == [1, 9]
    assert out[0]["gvf"] == 1.0  # both classes have zero variance


def test_equal_interval(spark):
    df = spark.createDataFrame([(float(v),) for v in range(10)],
                               "v double")
    out = {r["class"]: r for r in
           equal_interval_classes(df, "v", k=5).collect()}
    assert len(out) == 5
    assert all(out[c]["n_values"] == 2 for c in range(5))
    assert out[4]["max_v"] == 9.0


def test_quantile_classes(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 9)],
                               "v double")
    out = {r["class"]: r for r in
           quantile_classes(df, "v", k=4).collect()}
    assert [out[c]["n_values"] for c in (1, 2, 3, 4)] == [2, 2, 2, 2]
    assert out[1]["min_v"] == 1.0 and out[1]["max_v"] == 2.0
    assert out[4]["min_v"] == 7.0 and out[4]["max_v"] == 8.0


def test_quantile_classes_ties_stay_together(spark):
    # the tied value's mass (3 of 4 rows) straddles the 50% cut, so
    # the whole tie group lands in ONE class (class 2, its last
    # occurrence's block) rather than splitting rows across classes
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (1.0,), (5.0,)], "v double")
    rows = quantile_classes(df, "v", k=2).collect()
    assert len(rows) == 1
    assert rows[0]["class"] == 2 and rows[0]["n_values"] == 4


def test_head_tail_breaks(spark):
    vals = [1, 2, 3, 4, 10, 20, 40, 80]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = {r["level"]: r for r in
           head_tail_breaks(df, "v", levels=2).collect()}
    assert out[1]["break_mean"] == 20.0
    assert out[1]["n_head"] == 2 and out[1]["head_frac"] == 0.25
    assert out[2]["break_mean"] == 60.0
    assert out[2]["n_head"] == 1 and out[2]["head_frac"] == 0.5
