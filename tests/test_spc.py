"""Kernel tests for wave 152: p-chart z-scores vs hand computation,
each WE rule on a constructed trace, and in-control quiet series."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.spc import p_chart


def _df(spark, defects_per_bucket, w=200):
    rows = []
    i = 0
    for d in defects_per_bucket:
        for j in range(w):
            rows.append(("c1", i, 1 if j < d else 0))
            i += 1
    return spark.createDataFrame(rows,
                                 "c: string, id: bigint, e: int")


def test_z_scores_vs_hand(spark):
    per = [8, 10, 12, 6, 30]
    rows = {r["bucket"]: r for r in
            p_chart(_df(spark, per), "c", "id", "e").collect()}
    pbar = sum(per) / (len(per) * 200.0)
    sig = math.sqrt(pbar * (1 - pbar) / 200.0)
    for b, d in enumerate(per):
        p = d / 200.0
        assert rows[b]["p"] == pytest.approx(p, abs=1e-9)
        assert rows[b]["z_score"] == pytest.approx((p - pbar) / sig,
                                                   abs=1e-6)
    assert rows[4]["rule1_3sigma"]
    assert rows[4]["out_of_control"]


def test_rule4_eight_in_a_row(spark):
    # slight but persistent elevation: 8 consecutive above center
    per = [5] * 8 + [11] * 8
    rows = {r["bucket"]: r for r in
            p_chart(_df(spark, per), "c", "id", "e").collect()}
    assert rows[15]["rule4_8inarow"]
    assert not rows[8]["rule4_8inarow"]  # only 1 on the high side yet
    assert not rows[7]["rule1_3sigma"]


def test_in_control_series_quiet(spark):
    per = [8, 9, 8, 7, 9, 8, 7, 9, 8, 7, 9, 8]
    alternating = p_chart(_df(spark, per), "c", "id", "e").collect()
    assert not any(r["rule1_3sigma"] or r["rule2_2of3_2sigma"]
                   or r["rule3_4of5_1sigma"]
                   for r in alternating)
