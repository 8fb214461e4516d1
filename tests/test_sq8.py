"""Kernel tests for wave 149: SQ8 roundtrip vs a numpy
implementation, distortion bound from the per-dim step size, and
identity recall when quantization is exact."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.sq8 import dequantized, sq8_recall


def _emb_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows,
                                 "vec_id: bigint, embedding: array<float>")


def test_roundtrip_vs_numpy(spark):
    rng = [((i * 37 + j * 11) % 100) / 50.0 - 1.0
           for i in range(30) for j in range(64)]
    mat = np.array(rng, dtype=np.float32).reshape(30, 64)
    got = {r["vec_id"]: np.array(r["deq"]) for r in
           dequantized(_emb_df(spark, mat)).collect()}
    m = mat.astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    q = np.clip(np.floor((m - mn) * 255.0 / (mx - mn) + 0.5), 0, 255)
    deq = mn + q * (mx - mn) / 255.0
    for i in range(30):
        assert got[i] == pytest.approx(deq[i], abs=1e-12)
    # error bounded by half a step per dim
    step = (mx - mn) / 255.0
    assert np.all(np.abs(deq - m) <= step / 2 + 1e-12)


def test_recall_identity_on_8bit_grid(spark):
    # values already on the exact code grid: quantization is lossless
    # and the quantized ranking equals the exact one
    base = np.zeros((40, 64), dtype=np.float32)
    for i in range(40):
        for j in range(64):
            base[i, j] = ((i * 7 + j * 3) % 256) / 255.0
    rows = sq8_recall(_emb_df(spark, base), qmod=10, k=5).collect()
    assert rows and all(r["recall_at_k"] == pytest.approx(1.0)
                        for r in rows)


def test_recall_reasonable_on_random(spark):
    rng = np.random.RandomState(7)
    mat = rng.randn(60, 64).astype(np.float32) * 0.1
    rows = sq8_recall(_emb_df(spark, mat), qmod=15, k=5).collect()
    assert rows
    mean_rec = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert mean_rec > 0.6  # int8 at 64 dims keeps most neighbors
