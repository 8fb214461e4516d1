"""Kernel tests for wave 96: IBLT encode/peel vs ground truth on
constructed diffs, including the incomplete-decode (overload) case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bano_spark.operators.reconcile import (iblt_cells, iblt_decode,
                                            iblt_residue)


def _keys_df(spark, a, b):
    rows = [(k, 1) for k in a] + [(k, -1) for k in b]
    return spark.createDataFrame(rows, "key long, side long")


def test_iblt_decodes_exact_difference(spark):
    a = set(range(1, 1001))
    b = (a - {7, 77, 777}) | {5000, 6000}
    keys = _keys_df(spark, a, b)
    cells = iblt_cells(keys, "key", "side", 64)
    dec = {(r["key"], r["side"])
           for r in iblt_decode(cells, 64).collect()}
    want = {(7, 1), (77, 1), (777, 1), (5000, -1), (6000, -1)}
    assert dec == want
    assert iblt_residue(cells, spark.createDataFrame(
        sorted(want), "key long, side long"), 64).count() == 0


def test_iblt_identical_sets_decode_empty(spark):
    a = set(range(100, 200))
    keys = _keys_df(spark, a, a)
    cells = iblt_cells(keys, "key", "side", 32)
    # identical sets cancel cell-wise: the digest is all zeros
    assert cells.filter((F.col("cnt") != 0) | (F.col("ks") != 0)
                        | (F.col("hs") != 0)).count() == 0
    assert iblt_decode(cells, 32).count() == 0


def test_iblt_overload_reports_residue(spark):
    # diff of 60 keys into only 16 cells: peeling cannot finish; the
    # residue must be nonzero and decoded must be a SUBSET of truth.
    a = set(range(1, 2001))
    removed = set(range(1, 1800, 30))
    b = a - removed
    keys = _keys_df(spark, a, b)
    cells = iblt_cells(keys, "key", "side", 16)
    dec = iblt_decode(cells, 16)
    got = {(r["key"], r["side"]) for r in dec.collect()}
    want = {(k, 1) for k in removed}
    assert got <= want
    if got != want:
        assert iblt_residue(cells, dec, 16).count() > 0
