"""Kernel tests for wave 147: OBF looks vs numpy prefix z
computation; monotone boundary schedule; null vs planted stopping."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.groupseq import OBF_K4, obf_looks

_M31 = 2147483648


def _rows(effect):
    out = []
    for i in range(2000):
        u1 = (i * 2654435761 + 13) % _M31
        u2 = (i * 1103515245 + 12345) % _M31
        x = u1 % 2
        out.append((i, x, u2 % 40 + effect * x))
    return out


def _z_at(rows, frac):
    cut = [r for r in rows if r[0] * 4 < len(rows) * frac]
    t = np.array([y for _, x, y in cut if x == 1], float)
    c = np.array([y for _, x, y in cut if x == 0], float)
    s2p = (((t - t.mean()) ** 2).sum() + ((c - c.mean()) ** 2).sum()) \
        / (len(t) + len(c) - 2)
    se = np.sqrt(s2p * (1 / len(t) + 1 / len(c)))
    return (t.mean() - c.mean()) / se


def test_looks_vs_numpy(spark):
    rows = _rows(3)
    df = spark.createDataFrame(rows, "t: bigint, x: int, y: bigint")
    got = {r["look"]: r for r in
           obf_looks(df, "t", "x", "y").collect()}
    for l in range(1, 5):
        assert got[l]["z_stat"] == pytest.approx(_z_at(rows, l),
                                                 abs=1e-5)
        assert got[l]["boundary"] == pytest.approx(OBF_K4[l - 1])
    assert list(OBF_K4) == sorted(OBF_K4, reverse=True)


def test_planted_effect_stops_null_does_not(spark):
    strong = spark.createDataFrame(_rows(5),
                                   "t: bigint, x: int, y: bigint")
    gs = obf_looks(strong, "t", "x", "y").collect()
    assert gs[0]["first_crossing"] is not None
    assert any(r["crossed"] for r in gs)
    null = spark.createDataFrame(_rows(0),
                                 "t: bigint, x: int, y: bigint")
    gn = obf_looks(null, "t", "x", "y").collect()
    assert gn[0]["first_crossing"] is None
    assert not any(r["crossed"] for r in gn)
