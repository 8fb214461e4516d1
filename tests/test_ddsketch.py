"""Kernel tests for wave 121: DDSketch bucket math, the alpha
relative-error guarantee vs exact order statistics, shard-merge
equivalence, and the collapse trade-off."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bano_spark.operators.ddsketch import (dd_collapse, dd_gamma,
                                           dd_quantiles, dd_sketch)

ALPHA = 0.05
VALUES = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987,
          1597, 2584, 4181, 6765, 10946]


def _df(spark, vals=VALUES):
    return spark.createDataFrame([("g", v) for v in vals],
                                 "grp: string, x: bigint")


def test_bucket_representative_within_alpha(spark):
    """Every value's bucket representative is within alpha of it —
    the per-value form of the sketch guarantee."""
    g, lng = dd_gamma(ALPHA)
    for v in VALUES:
        b = math.ceil(math.log(v) / lng)
        est = 2.0 * g ** b / (g + 1.0)
        assert abs(est - v) / v <= ALPHA + 1e-12, (v, est)


def test_quantiles_within_alpha_of_exact(spark):
    sk = dd_sketch(_df(spark), "grp", "x", ALPHA)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {r["q"]: r["est"]
           for r in dd_quantiles(sk, "grp", qs, ALPHA).collect()}
    n = len(VALUES)
    for q in qs:
        exact = sorted(VALUES)[max(1, math.ceil(q * n)) - 1]
        assert abs(got[q] - exact) / exact <= ALPHA, (q, got[q], exact)


def test_shard_merge_equals_direct(spark):
    """Summing shard sketches on (key, bucket) reproduces the direct
    sketch exactly — the mergeability contract."""
    df = _df(spark).withColumn("shard", F.col("x") % 3)
    direct = {(r["grp"], r["bucket"]): r["cnt"]
              for r in dd_sketch(df, "grp", "x", ALPHA).collect()}
    shards = dd_sketch(df.withColumn("grp2", F.concat("grp", "shard")),
                       "grp2", "x", ALPHA)
    merged = (shards.withColumn("grp", F.substring("grp2", 1, 1))
              .groupBy("grp", "bucket")
              .agg(F.sum("cnt").cast("bigint").alias("cnt")))
    got = {(r["grp"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == direct


def test_collapse_keeps_upper_breaks_lower(spark):
    """Collapsing to 4 buckets: p99 estimate unchanged, p10 pulled up
    to the collapsed floor (guarantee lost)."""
    sk = dd_sketch(_df(spark), "grp", "x", ALPHA)
    co = dd_collapse(sk, "grp", 4)
    qs = [0.1, 0.99]
    full = {r["q"]: r["est"]
            for r in dd_quantiles(sk, "grp", qs, ALPHA).collect()}
    coll = {r["q"]: r["est"]
            for r in dd_quantiles(co, "grp", qs, ALPHA).collect()}
    assert coll[0.99] == full[0.99]
    assert coll[0.1] > full[0.1] * 10  # floor bucket is way above p10
    assert co.count() == 4
