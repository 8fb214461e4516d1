"""Kernel tests for wave 155: DCT-II basis orthonormality, known
closed-form coefficients, and the in-row Parseval self-check."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bano_spark.operators.spectral import dct2_basis, dct2_compaction


def test_basis_orthonormal():
    T = np.array(dct2_basis(32))
    eye = T @ T.T
    assert np.abs(eye - np.eye(32)).max() < 1e-12


def test_constant_series_compacts_to_dc(spark):
    # constant x: ALL energy in c0 = sqrt(N) * v; compaction == 1
    rows = [("u", i, 0, 5.0) for i in range(32)]
    df = spark.createDataFrame(
        rows, "g: string, t: bigint, tb: bigint, v: double")
    out = dct2_compaction(df, "g", ["t", "tb"], "v").collect()[0]
    assert out["c0"] == pytest.approx(math.sqrt(32) * 5.0, abs=1e-6)
    for k in range(1, 8):
        assert out[f"c{k}"] == pytest.approx(0.0, abs=1e-6)
    assert out["compaction"] == pytest.approx(1.0, abs=1e-9)
    assert out["parseval_ok"]


def test_single_cosine_lands_in_one_bin(spark):
    # x_n = cos(pi (n+1/2) k0 / N) is the k0-th basis row (unscaled):
    # all energy in c_{k0}
    N, k0 = 32, 5
    vals = [math.cos(math.pi * (n + 0.5) * k0 / N) for n in range(N)]
    df = spark.createDataFrame(
        [("u", n, 0, v) for n, v in enumerate(vals)],
        "g: string, t: bigint, tb: bigint, v: double")
    out = dct2_compaction(df, "g", ["t", "tb"], "v").collect()[0]
    for k in range(8):
        if k == k0:
            assert abs(out[f"c{k}"]) > 1.0
        else:
            assert out[f"c{k}"] == pytest.approx(0.0, abs=1e-6)
    assert out["parseval_ok"]


def test_short_series_dropped_and_keep_validated(spark):
    df = spark.createDataFrame([("u", i, 0, 1.0) for i in range(10)],
                               "g: string, t: bigint, tb: bigint, v: double")
    assert dct2_compaction(df, "g", ["t", "tb"], "v").count() == 0
    with pytest.raises(ValueError):
        dct2_compaction(df, "g", ["t", "tb"], "v", n=32, keep=33)
