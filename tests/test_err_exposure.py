"""Kernel tests for wave 133: ERR vs a direct cascade computation,
the perfect-vs-reversed ordering inequality, and exposure disparity
sign under a planted boost."""

from __future__ import annotations

import pytest

from bano_spark.operators.err_exposure import err_at_k, exposure_fairness


def _err_ref(grades, k=10):
    p, err = 1.0, 0.0
    for i, g in enumerate(grades[:k], 1):
        r = (2 ** g - 1) / 16.0
        err += p * r / i
        p *= 1.0 - r
    return err


def _mk(spark, items):
    # items: (id, score, grade, attr)
    return spark.createDataFrame(
        [("q1", i, s, g, a) for i, s, g, a in items],
        "q: string, id: bigint, score: bigint, g: bigint, a: bigint")


def test_err_vs_reference(spark):
    items = [(i, 100 - i, (i * 7) % 4, i % 2) for i in range(20)]
    df = _mk(spark, items)
    row = err_at_k(df, "q", "score", "id", "g", k=10).collect()[0]
    grades = [g for _, _, g, _ in sorted(items, key=lambda r: -r[1])]
    assert row["err"] == pytest.approx(_err_ref(grades), abs=1e-6)
    assert row["n_items"] == 20


def test_err_ordering_inequality(spark):
    # graded docs ranked best-first beats worst-first
    best = [(i, 100 - i, 3 - min(i, 3), 0) for i in range(8)]
    worst = [(i, 100 - i, min(i, 3), 0) for i in range(8)]
    e_best = err_at_k(_mk(spark, best), "q", "score", "id",
                      "g").collect()[0]["err"]
    e_worst = err_at_k(_mk(spark, worst), "q", "score", "id",
                       "g").collect()[0]["err"]
    assert e_best > e_worst


def test_exposure_disparity_sign(spark):
    # group a occupies the top 5 ranks but has equal total relevance
    items = ([(i, 100 - i, 2, 1) for i in range(5)]
             + [(5 + i, 50 - i, 2, 0) for i in range(5)])
    row = exposure_fairness(_mk(spark, items), "q", "score", "id",
                            "g", "a", k=10).collect()[0]
    # exposure: a holds ranks 1..5 -> sum 1/i for i=1..5
    exp_a = sum(1.0 / i for i in range(1, 6))
    exp_b = sum(1.0 / i for i in range(6, 11))
    assert row["exp_a"] == pytest.approx(exp_a, abs=1e-6)
    assert row["exp_b"] == pytest.approx(exp_b, abs=1e-6)
    assert row["rel_a"] == row["rel_b"] == 10
    assert row["rel_share_a"] == pytest.approx(0.5, abs=1e-9)
    assert row["disparity"] == pytest.approx(
        exp_a / (exp_a + exp_b) - 0.5, abs=1e-6)
    assert row["disparity"] > 0.2
