"""Kernel tests for wave 125: ordered-EMD t-closeness vs a hand fold
(identical-distribution zero, disjoint-support maximum, scipy-style
cumulative check) and the Laplace pseudo-noise inverse CDF."""

from __future__ import annotations

import math

import pytest

from bano_spark.operators.privacy import dp_laplace_histogram, t_closeness


def _df(spark, rows):
    return spark.createDataFrame(rows, "cls: bigint, lv: bigint")


def test_identical_distribution_zero_emd(spark):
    rows = [(c, lv) for c in (0, 1) for lv in range(4) for _ in range(5)]
    out = {r["cls"]: r["emd"]
           for r in t_closeness(_df(spark, rows), "cls", "lv", 4).collect()}
    assert out[0] == pytest.approx(0.0, abs=1e-15)
    assert out[1] == pytest.approx(0.0, abs=1e-15)


def test_disjoint_support_max_emd(spark):
    # class 0 all at level 0, class 1 all at level m-1; global is
    # half/half -> each class EMD = (1/(m-1)) * sum |cum diffs| = 0.5
    m = 4
    rows = [(0, 0)] * 8 + [(1, m - 1)] * 8
    out = {r["cls"]: r["emd"]
           for r in t_closeness(_df(spark, rows), "cls", "lv", m).collect()}
    assert out[0] == pytest.approx(0.5, abs=1e-12)
    assert out[1] == pytest.approx(0.5, abs=1e-12)


def test_emd_matches_hand_fold(spark):
    rows = ([(0, 0)] * 3 + [(0, 1)] * 1 + [(0, 2)] * 2
            + [(1, 1)] * 4 + [(1, 3)] * 2)
    m = 4
    out = {r["cls"]: r["emd"]
           for r in t_closeness(_df(spark, rows), "cls", "lv", m).collect()}

    def emd(counts, tot):
        n = sum(counts)
        gl = [3 / 12, 5 / 12, 2 / 12, 2 / 12]
        cum, t = 0.0, 0.0
        for i in range(m):
            cum += counts[i] / n - gl[i]
            t += abs(cum)
        return t / (m - 1)

    assert out[0] == pytest.approx(emd([3, 1, 2, 0], 6), rel=1e-12)
    assert out[1] == pytest.approx(emd([0, 4, 0, 2], 6), rel=1e-12)


def test_laplace_noise_scales_with_inverse_eps(spark):
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(7)]
    df = spark.createDataFrame(rows, "cat: string, event_id: bigint")
    out = dp_laplace_histogram(df, "cat", [0.1, 1.0]).collect()
    by = {(r["cat"], r["eps"]): r for r in out}
    for cat in ("a", "b"):
        lo, hi = by[(cat, 1.0)], by[(cat, 0.1)]
        # same uniform modulo the eps seed shift -> error roughly 10x;
        # at least strictly larger and finite
        assert math.isfinite(hi["noisy"]) and math.isfinite(lo["noisy"])
        assert hi["abs_err"] > lo["abs_err"]
    assert by[("a", 1.0)]["true_n"] == 20
