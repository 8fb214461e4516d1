"""Kernel tests for wave 126: Jarque-Bera vs numpy moments,
Ljung-Box vs a direct numpy autocorrelation computation,
Breusch-Pagan vs numpy lstsq on the quantized squared residuals."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.diagnostics import (CHI2_95, breusch_pagan,
                                              jarque_bera, ljung_box)


def _jb_numpy(x):
    x = np.asarray(x, dtype=float)
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    s = m3 / m2 ** 1.5
    k = m4 / m2 ** 2
    return s, k - 3.0, n / 6.0 * (s * s + (k - 3.0) ** 2 / 4.0)


def test_jarque_bera_vs_numpy(spark):
    xs = [(i * 37 + 11) % 23 for i in range(300)]
    ys = [((i * 29 + 5) % 9) ** 2 for i in range(300)]  # skewed
    df = spark.createDataFrame(
        [("u", v) for v in xs] + [("sq", v) for v in ys],
        "grp: string, x: bigint")
    rows = {r["grp"]: r for r in jarque_bera(df, "grp", "x").collect()}
    for g, data in [("u", xs), ("sq", ys)]:
        s, ek, jb = _jb_numpy(data)
        assert rows[g]["skewness"] == pytest.approx(s, abs=1e-6)
        assert rows[g]["ex_kurtosis"] == pytest.approx(ek, abs=1e-6)
        assert rows[g]["jb_stat"] == pytest.approx(jb, rel=1e-6)
    assert rows["sq"]["jb_stat"] > rows["u"]["jb_stat"]


def _lb_numpy(x, lags):
    x = np.asarray(x, dtype=float)
    n = len(x)
    xc = x - x.mean()
    denom = (xc ** 2).sum()
    q = 0.0
    rhos = []
    for k in range(1, lags + 1):
        rho = (xc[k:] * xc[:-k]).sum() / denom
        rhos.append(rho)
        q += rho * rho / (n - k)
    return rhos, n * (n + 2.0) * q


def test_ljung_box_vs_numpy(spark):
    white = [(i * 31 + 7) % 17 for i in range(120)]
    per4 = [(i % 4) * 10 + (i * 13) % 3 for i in range(120)]
    rows = []
    for g, xs in [("w", white), ("p", per4)]:
        rows += [(g, i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "grp: string, ord: bigint, x: bigint")
    got = {r["grp"]: r for r in
           ljung_box(df, "grp", "ord", "x", max_lag=5).collect()}
    for g, xs in [("w", white), ("p", per4)]:
        rhos, q = _lb_numpy(xs, 5)
        assert got[g]["q_lb"] == pytest.approx(q, rel=1e-6)
        assert got[g]["rho1"] == pytest.approx(rhos[0], abs=1e-6)
        assert got[g]["rho3"] == pytest.approx(rhos[2], abs=1e-6)
    assert got["p"]["reject_5pct"] and got["p"]["q_lb"] > 100
    assert got["w"]["q_lb"] < got["p"]["q_lb"]


def test_ljung_box_min_n_filter(spark):
    df = spark.createDataFrame([("s", i, i % 3) for i in range(10)],
                               "grp: string, ord: bigint, x: bigint")
    assert ljung_box(df, "grp", "ord", "x", min_n=20).count() == 0


def test_breusch_pagan_vs_numpy(spark):
    rows = []
    for i in range(500):
        x = (i * 37 + 3) % 40
        e_het = ((i * 17 + 5) % (2 * x + 1)) - x      # var grows with x
        e_hom = ((i * 17 + 5) % 11) - 5
        rows.append(("het", x, 2 + 4 * x + e_het))
        rows.append(("hom", x, 2 + 4 * x + e_hom))
    df = spark.createDataFrame(rows, "grp: string, x: bigint, y: bigint")
    got = {r["grp"]: r for r in
           breusch_pagan(df, "grp", "x", "y", scale=8).collect()}

    for g in ("het", "hom"):
        xs = np.array([r[1] for r in rows if r[0] == g], dtype=float)
        ys = np.array([r[2] for r in rows if r[0] == g], dtype=float)
        A = np.vstack([np.ones_like(xs), xs]).T
        b0, b1 = np.linalg.lstsq(A, ys, rcond=None)[0]
        assert got[g]["beta1"] == pytest.approx(b1, abs=1e-5)
        e = ys - b0 - b1 * xs
        z = np.floor(e * 8) ** 2 / 64.0
        r = np.corrcoef(xs, z)[0, 1] ** 2
        lm = len(xs) * r
        assert got[g]["lm_stat"] == pytest.approx(lm, rel=1e-5)
    assert got["het"]["hetero_5pct"]
    assert not got["hom"]["hetero_5pct"]
    assert got["het"]["lm_stat"] > CHI2_95[1] > got["hom"]["lm_stat"]
