"""Kernel tests for wave 103: longest-prefix-match semantics (most
specific wins, unrouted NULLs, duplicate-block canonicalization) and
the subnet rollup bit math."""

from __future__ import annotations

from bano_spark.operators.ipnet import dedupe_blocks, lpm_join, subnet_rollup


def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


def test_lpm_most_specific_wins(spark):
    ips = spark.createDataFrame(
        [(_ip(10, 1, 2, 3),), (_ip(10, 1, 9, 9),), (_ip(99, 0, 0, 1),)],
        "ip long")
    blocks = spark.createDataFrame(
        [(1, _ip(10, 0, 0, 0), 8),
         (2, _ip(10, 1, 0, 0), 16),
         (3, _ip(10, 1, 2, 0), 24)],
        "route_id long, network long, prefix_len int")
    got = {r["ip"]: (r["route_id"], r["matched_len"])
           for r in lpm_join(ips, blocks).collect()}
    assert got[_ip(10, 1, 2, 3)] == (3, 24)   # /24 beats /16 and /8
    assert got[_ip(10, 1, 9, 9)] == (2, 16)   # /16 beats /8
    assert got[_ip(99, 0, 0, 1)] == (None, None)  # unrouted


def test_duplicate_blocks_keep_min_route(spark):
    # two /8 rows whose networks mask to the same 10/8 -> min route id
    blocks = spark.createDataFrame(
        [(7, _ip(10, 200, 1, 1), 8), (5, _ip(10, 3, 3, 3), 8)],
        "route_id long, network long, prefix_len int")
    dim = dedupe_blocks(blocks).collect()
    assert len(dim) == 1 and dim[0]["route_id"] == 5
    assert dim[0]["net_key"] == 10

    ips = spark.createDataFrame([(_ip(10, 77, 0, 1),)], "ip long")
    got = lpm_join(ips, blocks).collect()[0]
    assert (got["route_id"], got["matched_len"]) == (5, 8)


def test_subnet_rollup_counts(spark):
    ips = spark.createDataFrame(
        [(_ip(10, 1, 2, 3),), (_ip(10, 1, 2, 200),),
         (_ip(10, 1, 7, 1),), (_ip(10, 2, 0, 1),)], "ip long")
    got = {r["net16"]: (r["n_ips"], r["n_slash24"])
           for r in subnet_rollup(ips).collect()}
    assert got[(10 << 8) | 1] == (3, 2)  # 10.1.2.x x2 + 10.1.7.x
    assert got[(10 << 8) | 2] == (1, 1)
