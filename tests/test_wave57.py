"""Hand-computed checks for the wave-57 operators: isotonic
calibration (minimax PAV) and Bradley-Terry strengths."""

from bano_spark.operators.quantiles import isotonic_calibration
from bano_spark.operators.ranking import bradley_terry


def test_isotonic_pools_violators(spark):
    # rates by bin: 0.0, 1.0, 0.0 -> PAV pools bins 2 and 3 to 0.5
    rows = ([(0.05, False)] * 4
            + [(0.15, True)] * 2 + [(0.25, False)] * 2)
    df = spark.createDataFrame(rows, "p double, label boolean")
    out = {r["bin"]: r for r in isotonic_calibration(
        df, "p", "label", n_bins=10).collect()}
    assert out[0]["isotonic_rate"] == 0.0
    assert out[1]["isotonic_rate"] == 0.5
    assert out[2]["isotonic_rate"] == 0.5
    # already-monotone data is untouched
    assert out[1]["rate"] == 1.0 and out[2]["rate"] == 0.0


def test_isotonic_monotone_passthrough(spark):
    rows = [(0.05, False), (0.15, False), (0.15, True),
            (0.25, True), (0.25, True)]
    df = spark.createDataFrame(rows, "p double, label boolean")
    out = {r["bin"]: r["isotonic_rate"] for r in isotonic_calibration(
        df, "p", "label", n_bins=10).collect()}
    assert out[0] == 0.0 and out[1] == 0.5 and out[2] == 1.0


def test_bradley_terry_dominant_item(spark):
    # a beats b 9:1; b beats c 9:1 -> strengths a > b > c
    rows = ([("a", "b")] * 9 + [("b", "a")]
            + [("b", "c")] * 9 + [("c", "b")])
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r["item"]: r for r in bradley_terry(df, iters=20).collect()}
    assert out["a"]["strength"] > out["b"]["strength"] > out["c"]["strength"]
    assert out["a"]["wins"] == 9 and out["c"]["wins"] == 1
    total = sum(r["strength"] for r in out.values())
    assert abs(total - 1.0) < 1e-5


def test_bradley_terry_symmetric(spark):
    rows = [("a", "b")] * 5 + [("b", "a")] * 5
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r["item"]: r["strength"] for r in
           bradley_terry(df, iters=10).collect()}
    assert out["a"] == out["b"] == 0.5
