"""Kernel tests for wave 87: Misra-Gries vs a Python replay of the
fold + merge, the MG guarantee on adversarial streams, and Count-Min
overestimate properties."""

from __future__ import annotations

from collections import Counter

import pytest

from bano_spark.operators.freqsketch import (count_min_estimates,
                                             heavy_hitters_exact,
                                             misra_gries_merge,
                                             misra_gries_shard)


def py_mg(stream, k):
    acc: dict[int, int] = {}
    for x in stream:
        if x in acc:
            acc[x] += 1
        elif len(acc) < k:
            acc[x] = 1
        else:
            acc = {key: c - 1 for key, c in acc.items() if c - 1 > 0}
    return acc


@pytest.fixture(scope="module")
def stream(spark):
    import hashlib
    rows = []
    for i in range(3000):
        h = int(hashlib.md5(f"s{i}".encode()).hexdigest()[:12], 16)
        key = h % 4 if h % 10 < 6 else 4 + h % 97
        rows.append((i, i % 4, key))
    return rows, spark.createDataFrame(rows,
                                       "rid long, shard long, key long")


def test_shard_folds_match_python(stream):
    rows, df = stream
    got = misra_gries_shard(df, "key", "rid", "shard", 6).collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], {})[r["key"]] = r["cnt"]
    for s in range(4):
        seq = [k for rid, sh, k in sorted(rows) if sh == s]
        assert by_shard.get(s, {}) == py_mg(seq, 6), s


def test_merge_guarantee(stream):
    rows, df = stream
    k = 6
    out = heavy_hitters_exact(df, "key", "rid", "shard", k).collect()
    exact = Counter(key for _, _, key in rows)
    n = len(rows)
    surviving = {r["key"] for r in out}
    # every key with frequency > n/(k+1) MUST survive
    for key, c in exact.items():
        if c > n / (k + 1):
            assert key in surviving, (key, c)
    for r in out:
        assert r["exact_count"] == exact[r["key"]]
        assert r["mg_count"] <= r["exact_count"]
        assert bool(r["guarantee_ok"])


def test_merge_subtraction_rule(spark):
    # hand-built summaries: keys 1..10 with totals 10..1, k=3 ->
    # subtract 4th largest (7); survivors 10-7=3, 9-7=2, 8-7=1.
    rows = [(0, key, 11 - key) for key in range(1, 11)]
    df = spark.createDataFrame(rows, "shard long, key long, cnt long")
    got = {r["key"]: r["mg_count"]
           for r in misra_gries_merge(df.select("key", "cnt"),
                                      3).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_count_min_never_underestimates(stream):
    rows, df = stream
    out = count_min_estimates(df, "key", depth=4, width=64).collect()
    exact = Counter(key for _, _, key in rows)
    assert len(out) == len(exact)
    for r in out:
        assert r["exact_count"] == exact[r["key"]]
        assert r["overestimate"] >= 0
        assert r["cm_estimate"] == r["exact_count"] + r["overestimate"]
    # with 101 keys in 64 buckets x 4 rows, most mins are near-exact
    assert sum(1 for r in out if r["overestimate"] == 0) > len(out) // 2
