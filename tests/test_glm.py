"""Kernel tests for wave 122: IRLS logistic regression vs a numpy
reference fold — bit-agreement of the quantized Newton steps,
contraction, and separable-direction sanity."""

from __future__ import annotations

import math

import numpy as np

from bano_spark.operators.glm import logit_irls


def _np_irls(x, y, steps=2, qbits=14):
    q = float(1 << qbits)
    b0 = b1 = 0.0
    deltas = []
    for _ in range(steps):
        z = b0 + b1 * x
        p = 1.0 / (1.0 + np.exp(-z))
        pq = np.floor(p * q) / q
        w = pq * (1.0 - pq)
        r = y - pq
        sw, swx, swxx = w.sum(), (w * x).sum(), (w * x * x).sum()
        sr, srx = r.sum(), (r * x).sum()
        det = sw * swxx - swx * swx
        d0 = (swxx * sr - swx * srx) / det
        d1 = (sw * srx - swx * sr) / det
        b0, b1 = b0 + d0, b1 + d1
        deltas.append((d0, d1))
    return b0, b1, deltas


def _fixture():
    rng = np.arange(400)
    x = (rng * 2654435761 % 2**31 // 2048 % 10).astype(float)
    thr = 1.0 / (1.0 + np.exp(2.0 - 0.4 * x))
    u = (rng * 1103515245 + 12345) % 2**31 // 65536 % 16384
    y = (u < 16384.0 * thr).astype(float)
    return x, y


def test_matches_numpy_fold(spark):
    x, y = _fixture()
    df = spark.createDataFrame(
        [("g", float(a), int(b)) for a, b in zip(x, y)],
        "grp: string, x: double, y: bigint")
    row = logit_irls(df, "grp", steps=2).collect()[0]
    b0, b1, deltas = _np_irls(x, y)
    assert math.isclose(row["b0"], b0, rel_tol=1e-12)
    assert math.isclose(row["b1"], b1, rel_tol=1e-12)
    assert math.isclose(row["d0_2"], deltas[1][0], rel_tol=1e-9)


def test_newton_contracts(spark):
    x, y = _fixture()
    _, _, deltas = _np_irls(x, y, steps=3)
    norms = [math.hypot(*d) for d in deltas]
    assert norms[1] < norms[0] and norms[2] < norms[1]


def test_balanced_coin_gives_zero_slope(spark):
    """y independent of x and exactly half/half at each x =>
    step-1 residual sums vanish and beta stays (0, 0)."""
    rows = [("g", float(x), y) for x in range(4) for y in (0, 1)]
    df = spark.createDataFrame(rows * 5, "grp: string, x: double, y: bigint")
    row = logit_irls(df, "grp", steps=2).collect()[0]
    assert row["b0"] == 0.0 and row["b1"] == 0.0


def test_recovers_sign_of_planted_slope(spark):
    x, y = _fixture()
    df = spark.createDataFrame(
        [("g", float(a), int(b)) for a, b in zip(x, y)],
        "grp: string, x: double, y: bigint")
    row = logit_irls(df, "grp", steps=2).collect()[0]
    assert row["b1"] > 0.2 and row["b0"] < -1.0
