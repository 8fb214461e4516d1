"""Kernel tests for wave 136: HT/Hajek vs hand-computed references
(including unbiasedness on a full-inclusion design) and
capture-recapture vs closed forms (including the independent-capture
near-recovery)."""

from __future__ import annotations

import pytest

from bano_spark.operators.surveyest import (capture_recapture,
                                            horvitz_thompson)

_M31 = 2147483648


def test_ht_full_inclusion_is_exact(spark):
    rows = [("g", (i * 13) % 50, i % 3, 1) for i in range(200)]
    df = spark.createDataFrame(rows,
                               "grp: string, y: bigint, st: int, incl: int")
    r = horvitz_thompson(df, "grp", "y", "st", "incl",
                         [1.0, 1.0, 1.0]).collect()[0]
    assert r["ht_total"] == r["true_total"]
    assert r["hajek_total"] == pytest.approx(r["true_total"], abs=1e-9)
    assert r["rel_err_ht"] == 0.0


def test_ht_vs_hand_computation(spark):
    pis = [0.2, 0.5]
    rows = []
    for i in range(400):
        u = (i * 2654435761 + 13) % _M31
        st = i % 2
        incl = 1 if (u % 10) < (2 if st == 0 else 5) else 0
        rows.append(("g", (u % 30), st, incl))
    df = spark.createDataFrame(rows,
                               "grp: string, y: bigint, st: int, incl: int")
    r = horvitz_thompson(df, "grp", "y", "st", "incl", pis).collect()[0]
    s = [sum(y for _, y, st, inc in rows if inc and st == j)
         for j in range(2)]
    c = [sum(1 for _, y, st, inc in rows if inc and st == j)
         for j in range(2)]
    ht = 0.0 + (1 / 0.2) * s[0] + (1 / 0.5) * s[1]
    nh = 0.0 + (1 / 0.2) * c[0] + (1 / 0.5) * c[1]
    assert r["ht_total"] == pytest.approx(ht, abs=1e-6)
    assert r["hajek_total"] == pytest.approx(ht / nh * 400, abs=1e-6)
    true = sum(y for _, y, _, _ in rows)
    assert abs(r["ht_total"] - true) / true < 0.2


def test_capture_recapture_closed_form(spark):
    rows = []
    for e in range(500):
        u = (e * 48271 + 3) % _M31
        c1 = 1 if (u >> 3) % 3 == 0 else 0
        c2 = 1 if (u >> 9) % 3 == 0 else 0
        rows.append((e, c1, c2))
    df = spark.createDataFrame(rows, "ent: bigint, c1: int, c2: int")
    r = capture_recapture(df, "ent", "c1", "c2").collect()[0]
    n1 = sum(c1 for _, c1, _ in rows)
    n2 = sum(c2 for _, _, c2 in rows)
    m = sum(1 for _, c1, c2 in rows if c1 and c2)
    assert (r["n1"], r["n2"], r["m"]) == (n1, n2, m)
    assert r["lp_estimate"] == pytest.approx(n1 * n2 / m, abs=1e-6)
    chap = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert r["chapman_estimate"] == pytest.approx(chap, abs=1e-6)
    # independent hash captures: Chapman lands near the truth
    assert abs(r["chapman_estimate"] - 500) / 500 < 0.25


def test_capture_entity_level_or(spark):
    # entity captured if ANY row is
    rows = [(1, 1, 0), (1, 0, 1), (2, 0, 0), (3, 1, 1)]
    df = spark.createDataFrame(rows, "ent: bigint, c1: int, c2: int")
    r = capture_recapture(df, "ent", "c1", "c2").collect()[0]
    assert (r["true_n"], r["n1"], r["n2"], r["m"]) == (3, 2, 2, 2)
