"""Kernel tests for wave 91: FFD bin packing vs a Python replay and
the skew-advisor integer ceilings."""

from __future__ import annotations

import pytest

from bano_spark.operators.compaction import (ffd_compaction_plan,
                                             join_skew_advisor)


def py_ffd(sizes, cap):
    bins = []
    for s in sorted(sizes, reverse=True):
        for i, rem in enumerate(bins):
            if rem >= s:
                bins[i] = rem - s
                break
        else:
            bins.append(cap - s)
    return len(bins)


@pytest.fixture(scope="module")
def files(spark):
    import hashlib
    rows = []
    for p in range(8):
        n = 5 + p * 4
        for f in range(n):
            h = int(hashlib.md5(f"{p}|{f}".encode()).hexdigest()[:8], 16)
            rows.append((p, p * 1000 + f, 1 + h % 900))
    return rows, spark.createDataFrame(
        rows, "part long, fid long, size_bytes long")


def test_ffd_matches_python(files):
    rows, df = files
    got = {r["part"]: r for r in
           ffd_compaction_plan(df, "part", "fid", "size_bytes",
                               1000).collect()}
    for p in range(8):
        sizes = [s for pp, _, s in rows if pp == p]
        want = py_ffd(sizes, 1000)
        r = got[p]
        assert r["n_bins"] == want, p
        assert r["n_files"] == len(sizes)
        assert r["total_bytes"] == sum(sizes)
        lb = -(-sum(sizes) // 1000)
        assert r["lb_bins"] == lb
        assert r["n_bins"] * 9 <= lb * 11 + 6  # FFD guarantee
        assert bool(r["ffd_ok"])


def test_ffd_oversized_file_gets_own_bin(spark):
    df = spark.createDataFrame([(1, 1, 1500), (1, 2, 400), (1, 3, 400)],
                               "part long, fid long, size_bytes long")
    r = ffd_compaction_plan(df, "part", "fid", "size_bytes",
                            1000).collect()[0]
    # 1500 alone (negative remaining), 400+400 share one bin
    assert r["n_bins"] == 2


def test_skew_advisor_arithmetic(spark):
    # key 0: 60 rows; keys 1..20: 2 rows each -> n=100, keys=21, max=60
    rows = [(0,)] * 60 + [(k,) for k in range(1, 21) for _ in range(2)]
    df = spark.createDataFrame(rows, "key long")
    r = join_skew_advisor(df, "key").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (100, 21, 60)
    # salt = ceil(60*21/100) = ceil(12.6) = 13
    assert r["salt_factor"] == 13
    # post-salt max = ceil(60/13) = 5
    assert r["post_salt_max_rows"] == 5
    assert r["skew_ratio"] == round(60 * 21 / 100, 6)
    assert r["post_salt_ratio"] == round(5 * 21 / 100, 6)
