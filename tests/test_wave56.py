"""Hand-computed checks for the wave-56 GMM-EM operator."""

from pyspark.sql import functions as F

from bano_spark.operators.clustering import gmm_em_1d


def _quant(df):
    return df.select((F.floor(F.col("v") * 4) / 4).alias("x"))


def test_gmm_separates_two_clusters(spark):
    # two tight, well-separated clusters: EM must put one mean near
    # each and split the weights evenly
    vals = [0.0, 0.25, 0.5, 0.75, 1.0] + [99.0, 99.25, 99.5, 99.75, 100.0]
    df = _quant(spark.createDataFrame([(v,) for v in vals], "v double"))
    out = {r["component"]: r for r in gmm_em_1d(df, "x", iters=5).collect()}
    assert abs(out[1]["mu"] - 0.5) < 0.5
    assert abs(out[2]["mu"] - 99.5) < 0.5
    assert abs(out[1]["weight"] - 0.5) < 0.05
    assert out[1]["sigma"] < 5 and out[2]["sigma"] < 5


def test_gmm_weights_follow_mass(spark):
    # 8 points near 0, 2 near 100: weights ~0.8/0.2
    vals = [0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 99.5, 100.0]
    df = _quant(spark.createDataFrame([(v,) for v in vals], "v double"))
    out = {r["component"]: r for r in gmm_em_1d(df, "x", iters=8).collect()}
    assert abs(out[1]["weight"] - 0.8) < 0.05
    assert abs(out[2]["weight"] - 0.2) < 0.05


def test_gmm_constant_input_guard(spark):
    # a constant column: variance floor keeps every density finite
    df = _quant(spark.createDataFrame([(5.0,)] * 6, "v double"))
    out = gmm_em_1d(df, "x", iters=3).collect()
    assert len(out) == 2
    for r in out:
        assert r["mu"] == 5.0
        assert r["sigma"] >= 0.0
