"""Model-diagnostic test statistics as distributed aggregates —
Jarque-Bera normality (moment-based), Ljung-Box serial-correlation
portmanteau, and the Breusch-Pagan heteroscedasticity LM test.

These complete the engine's inference surface next to welch_ttest /
durbin_watson_residuals / ks_two_sample: JB answers "are these
residuals normal enough for the t-based CIs I just published?",
Ljung-Box answers "is this per-user series white noise or did my
model leave structure on the table?", and BP answers "is the OLS
homoscedasticity assumption violated (so the published SEs are
wrong)?" — the standard post-regression audit triple.

Exactness contract (the engine-wide pattern, cf. operators/causal.py):
all sufficient statistics are exact integer (or dyadic-rational)
aggregates, and each statistic is a FIXED chain of double divisions on
that single aggregate row — bit-identical across engines and
topologies unrounded. Jarque-Bera needs raw moments up to x^4, so the
bigint sums stay exact while n * max(x)^4 < 2^63; with the bounded
fixtures used here (x <= ~100) that is ~9e10 rows per group — beyond
that, switch the sums to double (exact to 2^53) and document the ulp.

Scale shape: jarque_bera and ljung_box are ONE map-side-combinable
hash aggregate each (ljung_box additionally pays one per-group sort
for the lag window — partition-bounded, never global); breusch_pagan
is two aggregation passes with the O(groups) coefficient table
broadcast back between them (the IRLS carry pattern of operators/glm).
Nothing here collects to the driver.

Reference parity: the reference has no inference layer (plain
PostGIS SQL); this generalizes its batch-QA counts
(`bano/outils_de_gestion.py:7-37`) into publishable model audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["jarque_bera", "ljung_box", "breusch_pagan"]

# chi-square 95% critical values used by the reject flags
CHI2_95 = {1: 3.8414588206941245, 2: 5.991464547107979,
           3: 7.814727903251178, 4: 9.487729036781154,
           5: 11.070497693516351}


def jarque_bera(df: DataFrame, grp: str, x: str) -> DataFrame:
    """Per-group Jarque-Bera statistic JB = n/6 * (S^2 + (K-3)^2 / 4)
    from exact raw-moment sums (x must be integer-valued).

    Returns (grp, n, skewness, ex_kurtosis, jb_stat, reject_5pct);
    skew/kurtosis rounded to 6, the reject flag compares the
    UNROUNDED statistic to the chi2(2) critical value.
    """
    xc = F.col(x)
    a = df.groupBy(grp).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xc).cast("bigint").alias("s1"),
        F.sum(xc * xc).cast("bigint").alias("s2"),
        F.sum(xc * xc * xc).cast("bigint").alias("s3"),
        F.sum(xc * xc * xc * xc).cast("bigint").alias("s4"))
    n = F.col("n").cast("double")
    m = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - m * m
    m3 = r3 - F.lit(3.0) * m * r2 + F.lit(2.0) * m * m * m
    m4 = (r4 - F.lit(4.0) * m * r3 + F.lit(6.0) * m * m * r2
          - F.lit(3.0) * m * m * m * m)
    skew = m3 / F.sqrt(m2 * m2 * m2)
    kurt = m4 / (m2 * m2)
    jb = n / F.lit(6.0) * (skew * skew
                           + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0))
                           / F.lit(4.0))
    return a.select(
        grp, "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt - F.lit(3.0), 6).alias("ex_kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
        (jb > F.lit(CHI2_95[2])).alias("reject_5pct"))


def ljung_box(df: DataFrame, grp: str, order_col: str, x: str, *,
              max_lag: int = 5, min_n: int = 20) -> DataFrame:
    """Per-group Ljung-Box portmanteau Q over lags 1..max_lag:

        Q = n (n+2) * sum_k rho_k^2 / (n - k)

    with rho_k the lag-k sample autocorrelation about the full-series
    mean. The centered cross-products are expanded ALGEBRAICALLY into
    raw integer sums (sum x_t*x_{t-k}, the two one-sided sums over the
    overlap window, and the global sum/sum-of-squares), so the only
    floating-point work is the fixed O(max_lag) chain on the aggregate
    row — no centered doubles are ever summed, which is what makes the
    result order-independent and engine-exact.

    Scale: one window (per-group sort on ``order_col`` — the partition
    is one group's series, never global) producing max_lag lag
    columns, then ONE hash aggregate. Groups shorter than ``min_n``
    rows are dropped (the asymptotic chi-square needs n >> max_lag).
    Returns (grp, n, rho1..rho3, q_lb, reject_5pct).
    """
    if max_lag not in CHI2_95:
        raise ValueError(f"max_lag must be in {sorted(CHI2_95)}")
    xc = F.col(x)
    w = Window.partitionBy(grp).orderBy(order_col)
    d = df.select(grp, xc.alias("_x"),
                  *[F.lag(xc, k).over(w).alias(f"_l{k}")
                    for k in range(1, max_lag + 1)])
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_x").cast("bigint").alias("s"),
            F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("ss")]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        has = lk.isNotNull()
        aggs += [
            F.sum(F.when(has, F.col("_x") * lk).otherwise(0))
            .cast("bigint").alias(f"p{k}"),
            F.sum(F.when(has, F.col("_x")).otherwise(0))
            .cast("bigint").alias(f"a{k}"),
            F.sum(F.when(has, lk).otherwise(0))
            .cast("bigint").alias(f"b{k}"),
        ]
    a = d.groupBy(grp).agg(*aggs).filter(F.col("n") >= min_n)
    n = F.col("n").cast("double")
    m = F.col("s").cast("double") / n
    denom = F.col("ss").cast("double") - n * m * m
    rhos = []
    for k in range(1, max_lag + 1):
        ck = (F.col(f"p{k}").cast("double")
              - m * (F.col(f"a{k}") + F.col(f"b{k}")).cast("double")
              + (n - F.lit(float(k))) * m * m)
        rhos.append(ck / denom)
    q = sum((r * r / (n - F.lit(float(k + 1)))
             for k, r in enumerate(rhos)),
            start=F.lit(0.0)) * n * (n + F.lit(2.0))
    out = [grp, "n"]
    for k in range(1, min(3, max_lag) + 1):
        out.append(F.round(rhos[k - 1], 6).alias(f"rho{k}"))
    out += [F.round(q, 6).alias("q_lb"),
            (q > F.lit(CHI2_95[max_lag])).alias("reject_5pct")]
    return a.select(*out)


def breusch_pagan(df: DataFrame, grp: str, x: str, y: str, *,
                  scale: int = 8) -> DataFrame:
    """Per-group Breusch-Pagan (Koenker robust form) LM test:
    OLS-fit y ~ x, regress the squared residual on x, LM = n * R2_aux,
    chi2(1) under homoscedasticity.

    Stage 1 computes the per-group OLS coefficients from exact integer
    sums (one hash aggregate); the O(groups) coefficient table is
    broadcast-joined back; stage 2 micro-quantizes each residual to
    the 1/``scale`` dyadic grid BEFORE squaring (z = floor(e*scale)^2
    / scale^2), so every stage-2 sum is an exact dyadic rational and
    the LM statistic is order-independent and engine-exact (the
    wave-122/124 quantization contract; the quantization bias is
    O(1/scale) on residuals of magnitude >> 1/scale and is part of the
    operator's published definition, mirrored by the oracle).

    Returns (grp, n, beta0, beta1, r2_aux, lm_stat, hetero_5pct).
    """
    xc, yc = F.col(x), F.col(y)
    s1 = df.groupBy(grp).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xc).cast("bigint").alias("sx"),
        F.sum(yc).cast("bigint").alias("sy"),
        F.sum(xc * yc).cast("bigint").alias("sxy"),
        F.sum(xc * xc).cast("bigint").alias("sxx"))
    n = F.col("n").cast("double")
    b1 = ((n * F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sy").cast("double"))
          / (n * F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx").cast("double")))
    coef = s1.select(grp, "n",
                     b1.alias("b1"),
                     ((F.col("sy").cast("double")
                       - b1 * F.col("sx").cast("double")) / n).alias("b0"))
    j = df.join(F.broadcast(coef), grp)
    e = yc.cast("double") - F.col("b0") - F.col("b1") * xc.cast("double")
    zq = F.floor(e * F.lit(float(scale))).cast("double")
    z = zq * zq / F.lit(float(scale * scale))
    s2 = (j.withColumn("_z", z)
          .groupBy(grp).agg(
              F.count(F.lit(1)).cast("bigint").alias("n"),
              F.first("b0").alias("b0"), F.first("b1").alias("b1"),
              F.sum("_z").alias("sz"),
              F.sum(F.col("_z") * xc.cast("double")).alias("szx"),
              F.sum(F.col("_z") * F.col("_z")).alias("szz"),
              F.sum(xc).cast("bigint").alias("sx"),
              F.sum(xc * xc).cast("bigint").alias("sxx")))
    m = F.col("n").cast("double")
    cov = m * F.col("szx") - F.col("sx").cast("double") * F.col("sz")
    vx = (m * F.col("sxx").cast("double")
          - F.col("sx").cast("double") * F.col("sx").cast("double"))
    vz = m * F.col("szz") - F.col("sz") * F.col("sz")
    r2 = cov * cov / (vx * vz)
    lm = m * r2
    return s2.select(
        grp, "n",
        F.round("b0", 6).alias("beta0"),
        F.round("b1", 6).alias("beta1"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(lm, 6).alias("lm_stat"),
        (lm > F.lit(CHI2_95[1])).alias("hetero_5pct"))
