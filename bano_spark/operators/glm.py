"""Generalized linear models fit by IRLS as pure aggregation —
logistic regression with one feature + intercept, each Newton step a
closed-form 2x2 solve over per-group sufficient statistics (the GLM
sibling of operators/als.py's closed-form ridge solves and
linalg.ridge_regression_gram).

Scale design: one groupBy per Newton step (map-side combinable sums of
w, wx, wx^2, r, rx), betas carried as an O(groups) frame broadcast
back onto the data — the data is scanned `steps` times and never
shuffled on anything but the group key; no driver-side math beyond
the plan.

Exactness: the per-row sigmoid is MICRO-QUANTIZED — p_q =
floor(p * 2^qbits) / 2^qbits — so weights w = p_q(1-p_q) and
residuals y - p_q live on a dyadic 2^(-2*qbits) grid and every
aggregated sum is exact in double (total magnitude << 2^(53-2*qbits));
the Newton update is then a deterministic chain of divisions. The only
cross-engine freedom left is libm exp() 1-ulp wobble flipping a floor
at a dyadic boundary — integer-derived fixtures make that measure-zero
in practice (the wave-88 naive-bayes micro-nat pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["logit_irls"]


def logit_irls(df: DataFrame, grp: str, x: str = "x", y: str = "y",
               steps: int = 2, qbits: int = 14) -> DataFrame:
    """Fit sigmoid(b0 + b1*x) per group by `steps` IRLS rounds from
    (0, 0). Returns one row per group: n, b0, b1, and per-step Newton
    deltas d0_k / d1_k (the convergence evidence)."""
    q = float(1 << qbits)
    betas = (df.select(grp).distinct()
             .withColumn("b0", F.lit(0.0)).withColumn("b1", F.lit(0.0)))
    dcols: list[str] = []
    for step in range(1, steps + 1):
        j = df.join(F.broadcast(betas), grp)
        z = F.col("b0") + F.col("b1") * F.col(x)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        pq = F.floor(p * F.lit(q)) / F.lit(q)
        w = pq * (F.lit(1.0) - pq)
        r = F.col(y).cast("double") - pq
        carry = [F.max(c).alias(c) for c in ["b0", "b1"] + dcols]
        g = j.groupBy(grp).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(w).alias("sw"),
            F.sum(w * F.col(x)).alias("swx"),
            F.sum(w * F.col(x) * F.col(x)).alias("swxx"),
            F.sum(r).alias("sr"),
            F.sum(r * F.col(x)).alias("srx"),
            *carry)
        det = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
        d0 = (F.col("swxx") * F.col("sr")
              - F.col("swx") * F.col("srx")) / det
        d1 = (F.col("sw") * F.col("srx")
              - F.col("swx") * F.col("sr")) / det
        dn0, dn1 = f"d0_{step}", f"d1_{step}"
        betas = (g.withColumn(dn0, d0).withColumn(dn1, d1)
                 .select(grp, "n",
                         (F.col("b0") + F.col(dn0)).alias("b0"),
                         (F.col("b1") + F.col(dn1)).alias("b1"),
                         *dcols, dn0, dn1))
        dcols = dcols + [dn0, dn1]
    return betas
