"""Kernel tests for wave 120: Merkle range-tree digests vs an
independent pure-Python fold — path-to-root dirtiness, input-order
invariance, empty-leaf sentinel, sibling-swap sensitivity."""

from __future__ import annotations

import pytest

from bano_spark.operators.merkle import (COMBINE, M, ROW_A, ROW_B, ROW_C,
                                         merkle_diff, merkle_tree)


def _py_tree(rows, leaves=8):
    """Independent reference: dict (level, node) -> digest."""
    depth = leaves.bit_length() - 1
    leaf = [0] * leaves
    for k, v in rows:
        leaf[k % leaves] = (leaf[k % leaves]
                            + (k * ROW_A + v * ROW_B + ROW_C) % M) % M
    out = {}
    cur = leaf
    for lvl in range(depth, -1, -1):
        for node, d in enumerate(cur):
            out[(lvl, node)] = d
        cur = [(cur[2 * i] * COMBINE + cur[2 * i + 1]) % M
               for i in range(len(cur) // 2)]
    return out


ROWS = [(0, 5), (1, 7), (3, 2), (8, 11), (9, 1), (17, 4), (22, 9)]


def _spark_tree(spark, rows, leaves=8):
    df = spark.createDataFrame(rows, "k: bigint, v: bigint")
    t = merkle_tree(spark, df, "k", "v", leaves=leaves)
    return {(r["level"], r["node"]): r["digest"] for r in t.collect()}


def test_tree_matches_python_fold(spark):
    assert _spark_tree(spark, ROWS) == _py_tree(ROWS)


def test_order_invariance(spark):
    got = _spark_tree(spark, list(reversed(ROWS)))
    assert got == _py_tree(ROWS)


def test_empty_leaves_are_zero(spark):
    t = _spark_tree(spark, [(1, 1)])
    # leaves 0, 2..7 empty
    assert t[(3, 0)] == 0 and t[(3, 5)] == 0
    assert t[(3, 1)] == (1 * ROW_A + 1 * ROW_B + ROW_C) % M


def test_single_mutation_dirties_exactly_the_root_path(spark):
    mutated = [(k, v + 1 if k == 17 else v) for k, v in ROWS]
    ta = merkle_tree(spark, spark.createDataFrame(
        ROWS, "k: bigint, v: bigint"), "k", "v", leaves=8)
    tb = merkle_tree(spark, spark.createDataFrame(
        mutated, "k: bigint, v: bigint"), "k", "v", leaves=8)
    dirty = {(r["level"], r["node"])
             for r in merkle_diff(ta, tb).filter("differs").collect()}
    # key 17 -> leaf 1; path: (3,1) (2,0) (1,0) (0,0)
    assert dirty == {(3, 1), (2, 0), (1, 0), (0, 0)}


def test_sibling_swap_detected(spark):
    # moving a row from leaf 2 to leaf 3 changes both leaves and the
    # shared parent: position-sensitive combine must flag it
    a = [(2, 5)]
    b = [(3, 5)]
    ta = merkle_tree(spark, spark.createDataFrame(
        a, "k: bigint, v: bigint"), "k", "v", leaves=8)
    tb = merkle_tree(spark, spark.createDataFrame(
        b, "k: bigint, v: bigint"), "k", "v", leaves=8)
    dirty = {(r["level"], r["node"])
             for r in merkle_diff(ta, tb).filter("differs").collect()}
    assert (3, 2) in dirty and (3, 3) in dirty and (2, 1) in dirty


def test_non_power_of_two_raises(spark):
    df = spark.createDataFrame(ROWS, "k: bigint, v: bigint")
    with pytest.raises(ValueError):
        merkle_tree(spark, df, "k", "v", leaves=48)
