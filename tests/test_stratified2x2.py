"""Kernel tests for wave 145: Simpson rollup vs hand-built cells (a
constructed exact paradox), MH vs hand computation, and the
equal-strata no-confounding case where crude == MH."""

from __future__ import annotations

import pytest

from bano_spark.operators.stratified2x2 import (mantel_haenszel,
                                                simpson_rollup)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "s: int, x: int, y: int")


def test_constructed_exact_paradox(spark):
    # classic kidney-stone numbers (Charig 1986, scaled):
    # stratum 0: x=1 81/87 vs x=0 234/270 ; stratum 1: 192/263 vs 55/80
    rows = []
    for s, x, pos, tot in [(0, 1, 81, 87), (0, 0, 234, 270),
                           (1, 1, 192, 263), (1, 0, 55, 80)]:
        rows += [(s, x, 1)] * pos + [(s, x, 0)] * (tot - pos)
    got = {r["s"]: r for r in
           simpson_rollup(_mk(spark, rows), "s", "x", "y").collect()}
    assert got[0]["exposure_helps"] and got[1]["exposure_helps"]
    assert not got[None]["exposure_helps"]  # 273/350 < 289/350
    assert got[None]["n"] == 700
    assert got[0]["exposed_pos"] == 81
    assert got[None]["exposed_rate"] == pytest.approx(273 / 350,
                                                      abs=1e-6)


def test_mh_vs_hand(spark):
    cells = {0: (30, 10, 20, 40), 1: (15, 25, 5, 35)}
    rows = []
    for s, (a, b, c, d) in cells.items():
        rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b \
            + [(s, 0, 1)] * c + [(s, 0, 0)] * d
    row = mantel_haenszel(_mk(spark, rows), "s", "x", "y",
                          2).collect()[0]
    num = sum(a * d / (a + b + c + d) for a, b, c, d in cells.values())
    den = sum(b * c / (a + b + c + d) for a, b, c, d in cells.values())
    assert row["mh_or"] == pytest.approx(num / den, abs=1e-6)
    for s, (a, b, c, d) in cells.items():
        assert row[f"or{s}"] == pytest.approx(a * d / (b * c),
                                              abs=1e-6)
    A = sum(v[0] for v in cells.values())
    B = sum(v[1] for v in cells.values())
    C = sum(v[2] for v in cells.values())
    D = sum(v[3] for v in cells.values())
    assert row["crude_or"] == pytest.approx(A * D / (B * C), abs=1e-6)


def test_identical_strata_no_confounding(spark):
    cells = (24, 16, 12, 28)
    rows = []
    for s in (0, 1):
        a, b, c, d = cells
        rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b \
            + [(s, 0, 1)] * c + [(s, 0, 0)] * d
    row = mantel_haenszel(_mk(spark, rows), "s", "x", "y",
                          2).collect()[0]
    # identical strata: crude == MH == per-stratum OR
    assert row["crude_or"] == pytest.approx(row["mh_or"], abs=1e-6)
    assert row["or0"] == pytest.approx(row["mh_or"], abs=1e-6)
