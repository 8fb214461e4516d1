"""Alternating Least Squares matrix factorization, one exact
alternation at rank d=2 — the closed-form core of the Koren/Bell/
Volinsky collaborative-filtering family (and Spark MLlib's ALS),
re-expressed as pure keyed aggregates + 2x2 inverse arithmetic so the
math is engine-exact and oracle-checkable.

Per user u with ratings r over items with fixed factors q in R^2:

    A = sum_i q_i q_i^T + lambda I   (2x2, map-side-combinable sums)
    b = sum_i q_i r_i
    p_u = A^{-1} b  via the closed 2x2 inverse:
          det = a11*a22 - a12^2
          p1 = (a22*b1 - a12*b2)/det,  p2 = (a11*b2 - a12*b1)/det

Exactness contract: initial item factors are DYADIC rationals
(k/128), ratings are integers, lambda = 0.5 — so every entry of A and
b is an exact multiple of 2^-14 within range, the cross-row SUMS are
order-free, and p is a fixed chain of products + ONE division per
component: bit-identical across engines unrounded. Before the second
half-step (item update) the learned user factors are re-quantized to
dyadic (round(p * 4096) / 4096 — the perceptron-IPM in-fold
quantization precedent), restoring order-free summability.

Scale shape: each half-step is ONE groupBy on the entity key with
5 map-side-combinable sums — the d^2 sufficient-statistics pattern
that scales to any rating count; no Gramian broadcast, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["solve_factors", "QUANT"]

QUANT = 4096
LAMBDA = 0.5


def solve_factors(ratings: DataFrame, key: str, f1: str, f2: str,
                  r: str = "r", *, lam: float = LAMBDA) -> DataFrame:
    """One least-squares half-step: per ``key``, solve the rank-2
    ridge system against fixed factor columns (f1, f2) and rating r.
    Returns key, n, a11..b2 (exact sums), det, p1, p2."""
    g = (ratings.groupBy(key)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col(f1) * F.col(f1)).alias("s11"),
              F.sum(F.col(f1) * F.col(f2)).alias("s12"),
              F.sum(F.col(f2) * F.col(f2)).alias("s22"),
              F.sum(F.col(f1) * F.col(r)).alias("b1"),
              F.sum(F.col(f2) * F.col(r)).alias("b2")))
    d = (g.withColumn("a11", F.col("s11") + F.lit(lam))
         .withColumn("a12", F.col("s12"))
         .withColumn("a22", F.col("s22") + F.lit(lam))
         .withColumn("det", F.col("a11") * F.col("a22")
                     - F.col("a12") * F.col("a12")))
    return (d.withColumn("p1", (F.col("a22") * F.col("b1")
                                - F.col("a12") * F.col("b2"))
                         / F.col("det"))
            .withColumn("p2", (F.col("a11") * F.col("b2")
                               - F.col("a12") * F.col("b1"))
                        / F.col("det")))
