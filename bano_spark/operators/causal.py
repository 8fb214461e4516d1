"""Instrumental-variable estimation with a binary instrument — the
Wald estimator, its first-stage strength F, and the OLS comparison
(Angrist & Pischke's canonical just-identified IV; completes the
causal family next to did_estimator / cuped_adjustment).

    beta_IV  = (ybar_1 - ybar_0) / (xbar_1 - xbar_0)
    F_first  = (xbar_1 - xbar_0)^2 / (s2_pooled * (1/n1 + 1/n0))
    beta_OLS = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)

Exactness: with integer x, y, z every sufficient statistic (counts,
sums, sums of squares/products) is an exact integer aggregate; the
estimators are fixed chains of divisions — bit-identical across
engines UNROUNDED. One groupBy, map-side combinable, keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["wald_iv"]


def wald_iv(df: DataFrame, grp: str, z: str = "z", x: str = "x",
            y: str = "y") -> DataFrame:
    """Per group: arm sizes/sums (exact ints), the Wald IV estimate,
    first-stage F, OLS slope, and the confounding bias (all exact
    unrounded doubles)."""
    zc = F.col(z)
    g = (df.groupBy(grp).agg(
        F.sum(F.when(zc == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(zc == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(zc == 1, F.col(x)).otherwise(0)).cast("bigint")
        .alias("sx1"),
        F.sum(F.when(zc == 0, F.col(x)).otherwise(0)).cast("bigint")
        .alias("sx0"),
        F.sum(F.when(zc == 1, F.col(y)).otherwise(0)).cast("bigint")
        .alias("sy1"),
        F.sum(F.when(zc == 0, F.col(y)).otherwise(0)).cast("bigint")
        .alias("sy0"),
        F.sum(F.when(zc == 1, F.col(x) * F.col(x)).otherwise(0))
        .cast("bigint").alias("sxx1"),
        F.sum(F.when(zc == 0, F.col(x) * F.col(x)).otherwise(0))
        .cast("bigint").alias("sxx0"),
        F.sum(F.col(x) * F.col(y)).cast("bigint").alias("sxy"),
        F.sum(F.col(x) * F.col(x)).cast("bigint").alias("sxx"),
        F.sum(F.col(x)).cast("bigint").alias("sx"),
        F.sum(F.col(y)).cast("bigint").alias("sy"),
        F.count(F.lit(1)).cast("bigint").alias("n")))
    dx = (F.col("sx1").cast("double") / F.col("n1").cast("double")
          - F.col("sx0").cast("double") / F.col("n0").cast("double"))
    dy = (F.col("sy1").cast("double") / F.col("n1").cast("double")
          - F.col("sy0").cast("double") / F.col("n0").cast("double"))
    ss1 = (F.col("sxx1").cast("double")
           - (F.col("sx1") * F.col("sx1")).cast("double")
           / F.col("n1").cast("double"))
    ss0 = (F.col("sxx0").cast("double")
           - (F.col("sx0") * F.col("sx0")).cast("double")
           / F.col("n0").cast("double"))
    s2p = (ss1 + ss0) / (F.col("n1") + F.col("n0") - 2).cast("double")
    fstat = (dx * dx) / (s2p * (F.lit(1.0) / F.col("n1").cast("double")
                                + F.lit(1.0)
                                / F.col("n0").cast("double")))
    ols = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
           .cast("double")
           / (F.col("n") * F.col("sxx")
              - F.col("sx") * F.col("sx")).cast("double"))
    return (g.withColumn("beta_iv", dy / dx)
            .withColumn("f_first_stage", fstat)
            .withColumn("beta_ols", ols)
            .withColumn("ols_bias", ols - dy / dx))
