"""Kernel tests for wave 156: Hadamard matrix properties, butterfly
equivalence, and the flatness semantics on hand vectors."""

from __future__ import annotations

import numpy as np
import pytest

from bano_spark.operators.hadamard import (fwht_rotation_audit,
                                           hadamard_matrix)


def test_matrix_orthogonal_pm1():
    H = np.array(hadamard_matrix(64), dtype=np.float64)
    assert set(np.unique(H)) == {-1.0, 1.0}
    assert np.array_equal(H @ H.T, 64.0 * np.eye(64))
    with pytest.raises(ValueError):
        hadamard_matrix(48)


def test_impulse_flattens_maximally(spark):
    # an impulse e_0 is the worst-case outlier: H e_0 = first column
    # (all +-1), so max|X|/n = 1/n and flatten_ratio = n
    vec = [1.0] + [0.0] * 63
    df = spark.createDataFrame([(0, vec, 0)],
                               "vec_id: bigint, embedding: array<double>, label: int")
    row = fwht_rotation_audit(df, qmod=1).collect()[0]
    assert row.flatten_ratio == pytest.approx(64.0, abs=1e-6)
    assert row.parseval_ok


def test_constant_vector_concentrates(spark):
    # constant x: H x = (n*v, 0, ...) — rotation CONCENTRATES it:
    # flatten_ratio = v / (n*v/n) = 1
    vec = [2.0] * 64
    df = spark.createDataFrame([(0, vec, 0)],
                               "vec_id: bigint, embedding: array<double>, label: int")
    row = fwht_rotation_audit(df, qmod=1).collect()[0]
    assert row.flatten_ratio == pytest.approx(1.0, abs=1e-9)
    assert row.energy == pytest.approx(64 * 4.0, abs=1e-6)
    assert row.parseval_ok


def test_wrong_dim_dropped(spark):
    df = spark.createDataFrame([(0, [1.0] * 32, 0)],
                               "vec_id: bigint, embedding: array<double>, label: int")
    assert fwht_rotation_audit(df, qmod=1).count() == 0
