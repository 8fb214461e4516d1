"""Kernel tests for wave 101: varint ladder boundaries, Rice argmin vs
brute force, roaring container classification (array/run/bitmap)."""

from __future__ import annotations

from bano_spark.operators.indexcomp import (
    rice_optimal, roaring_advisor, varint_size)


def _df(spark, ids, term="t"):
    return spark.createDataFrame([(term, i) for i in ids],
                                 "term string, gid long")


def test_varint_ladder_boundaries(spark):
    # gaps from -1: ids [126, 254, 16637, 2113789] give gaps
    # [127, 128, 16383, 2097152] -> bytes [1, 2, 2, 4]
    ids = [126, 254, 16637, 2113789]
    row = varint_size(_df(spark, ids)).collect()[0]
    assert row["df"] == 4
    assert row["varint_bytes"] == 1 + 2 + 2 + 4
    assert row["raw_bytes"] == 16
    assert row["max_gap"] == 2097152


def test_rice_matches_bruteforce(spark):
    ids = [0, 7, 8, 40, 41, 100, 900, 905, 4000]
    gaps, prev = [], -1
    for i in ids:
        gaps.append(i - prev)
        prev = i
    best = min(((sum((g - 1) >> b for g in gaps)
                 + len(gaps) * (b + 1), b) for b in range(15)))
    row = rice_optimal(_df(spark, ids)).collect()[0]
    assert (row["best_bits"], row["best_b"]) == best
    assert row["df"] == len(ids)


def test_rice_tiebreak_smallest_b(spark):
    # single gap of 1: cost(b) = 0 + (b+1), strictly increasing -> b=0;
    # constant lists exercise the tie rule deterministically anyway
    row = rice_optimal(_df(spark, [0])).collect()[0]
    assert row["best_b"] == 0


def test_roaring_classification(spark):
    # container 0: dense run 0..99 -> run (2+4 < 200);
    # container 1: two sparse ids -> array (4 < 10);
    # container 2: 4100 ids spaced by 2 (no runs merge) ->
    #   array 8200 > bitmap 8192, run 2+4*4100 -> bitmap
    ids = (list(range(100)) + [65536, 65600]
           + [2 * 65536 + 2 * k for k in range(4100)])
    row = roaring_advisor(_df(spark, ids)).collect()[0]
    assert row["n_containers"] == 3
    assert (row["n_run"], row["n_array"], row["n_bitmap"]) == (1, 1, 1)
    assert row["total_bytes"] == (2 + 4 * 1) + (2 * 2) + 8192
