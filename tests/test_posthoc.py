"""Kernel tests for wave 146: Tukey/Bonferroni vs numpy hand
computation; planted-shift detection pattern; null case."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.posthoc import bonferroni_pairs, tukey_hsd


def _data(shift):
    rows = []
    for gi, g in enumerate(["a", "b", "c"]):
        for i in range(400):
            y = (i * 37 + gi * 11) % 31 + shift.get(g, 0)
            rows.append((g, y))
    return rows


def test_tukey_vs_numpy(spark):
    rows = _data({"b": 5})
    df = spark.createDataFrame(rows, "g: string, y: bigint")
    got = {(r["g1"], r["g2"]): r for r in
           tukey_hsd(df, "g", "y", ["a", "b", "c"]).collect()}
    arrs = {g: np.array([y for gg, y in rows if gg == g], float)
            for g in "abc"}
    sse = sum(((a - a.mean()) ** 2).sum() for a in arrs.values())
    mse = sse / (sum(len(a) for a in arrs.values()) - 3)
    for (g1, g2), r in got.items():
        d = arrs[g1].mean() - arrs[g2].mean()
        se = np.sqrt(0.5 * mse * (1 / len(arrs[g1])
                                  + 1 / len(arrs[g2])))
        assert r["mean_diff"] == pytest.approx(d, abs=1e-6)
        assert r["q_stat"] == pytest.approx(abs(d) / se, abs=1e-5)
    assert got[("a", "b")]["significant"]
    assert got[("b", "c")]["significant"]
    assert not got[("a", "c")]["significant"]


def test_bonferroni_matches_pattern(spark):
    rows = _data({"b": 5})
    df = spark.createDataFrame(rows, "g: string, y: bigint")
    got = {(r["g1"], r["g2"]): r["significant"] for r in
           bonferroni_pairs(df, "g", "y", ["a", "b", "c"]).collect()}
    assert got[("a", "b")] and got[("b", "c")]
    assert not got[("a", "c")]


def test_null_case_nothing_significant(spark):
    rows = _data({})
    df = spark.createDataFrame(rows, "g: string, y: bigint")
    assert not any(r["significant"] for r in
                   tukey_hsd(df, "g", "y",
                             ["a", "b", "c"]).collect())
