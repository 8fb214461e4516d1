"""Kernel tests for wave 132: lossy_count_sketch vs a step-by-step
python simulator (entries, counts AND deltas), the deficiency
theorem on every key, and a forced-prune case."""

from __future__ import annotations

import pytest

from bano_spark.operators.lossycount import (lossy_count_sketch,
                                             lossy_hitters_audit)

_M31 = 2147483648


def _sim(stream, w):
    es = {}
    for i, k in enumerate(stream, 1):
        b = (i + w - 1) // w
        if k in es:
            es[k][0] += 1
        else:
            es[k] = [1, b - 1]
        if i % w == 0:
            es = {k: v for k, v in es.items() if v[0] + v[1] > b}
    return es


def _stream(n=600):
    out = []
    for i in range(n):
        u = (i * 2654435761 + 13) % _M31
        out.append(u % 6 if u % 10 < 6 else 6 + u % 40)
    return out


def test_sketch_vs_simulator(spark):
    stream = _stream()
    w = 25
    df = spark.createDataFrame(
        [("g", i, k) for i, k in enumerate(stream)],
        "grp: string, t: bigint, k: bigint")
    got = {r["key"]: (r["est_count"], r["delta"]) for r in
           lossy_count_sketch(df, "grp", "t", "k", w=w).collect()}
    ref = {k: tuple(v) for k, v in _sim(stream, w).items()}
    assert got == ref


def test_deficiency_theorem_all_keys(spark):
    stream = _stream(1000)
    w = 20
    df = spark.createDataFrame(
        [("g", i, k) for i, k in enumerate(stream)],
        "grp: string, t: bigint, k: bigint")
    true = {}
    for k in stream:
        true[k] = true.get(k, 0) + 1
    n = len(stream)
    got = {r["key"]: r["est_count"] for r in
           lossy_count_sketch(df, "grp", "t", "k", w=w).collect()}
    for k, est in got.items():
        assert est <= true[k] <= est + n // w
    # every key above eps*N must survive
    for k, f in true.items():
        if f > n // w:
            assert k in got


def test_forced_prune_drops_singletons(spark):
    # 30 distinct singletons then repeats of one key: the singletons
    # get pruned at boundaries, the hot key survives exactly counted
    stream = list(range(100, 130)) + [7] * 70
    df = spark.createDataFrame(
        [("g", i, k) for i, k in enumerate(stream)],
        "grp: string, t: bigint, k: bigint")
    got = {r["key"]: r["est_count"] for r in
           lossy_count_sketch(df, "grp", "t", "k", w=10).collect()}
    assert got[7] == 70
    assert all(k == 7 or k >= 100 for k in got)
    assert len(got) < 31  # some singletons pruned
    ref = _sim(stream, 10)
    assert {k: v[0] for k, v in ref.items()} == got


def test_audit_flags(spark):
    stream = _stream(800)
    df = spark.createDataFrame(
        [("g", i, k) for i, k in enumerate(stream)],
        "grp: string, t: bigint, k: bigint")
    rows = lossy_hitters_audit(df, "grp", "t", "k", w=40,
                               support=0.05).collect()
    assert rows and all(r["within_bound"] for r in rows)
    with pytest.raises(ValueError):
        lossy_count_sketch(df, "grp", "t", "k", w=1)
