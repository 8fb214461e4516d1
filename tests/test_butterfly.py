"""Kernel tests for wave 111: butterfly counting vs brute-force
4-cycle enumeration on small graphs — K22/K23 closed forms, side
symmetry, caterpillar identity."""

from __future__ import annotations

from itertools import combinations

import pytest

from bano_spark.operators.butterfly import global_motifs, side_costs


def _brute_butterflies(edges):
    es = set(edges)
    lefts = sorted({u for u, _ in edges})
    rights = sorted({v for _, v in edges})
    n = 0
    for u1, u2 in combinations(lefts, 2):
        for v1, v2 in combinations(rights, 2):
            if {(u1, v1), (u1, v2), (u2, v1), (u2, v2)} <= es:
                n += 1
    return n


GRAPHS = {
    # K_{2,2}: exactly one butterfly
    "k22": [(1, 10), (1, 11), (2, 10), (2, 11)],
    # K_{2,3}: C(3,2) = 3 butterflies
    "k23": [(u, v) for u in (1, 2) for v in (10, 11, 12)],
    # path (no butterfly) + a hub
    "path": [(1, 10), (2, 10), (2, 11), (3, 11)],
    # two overlapping K22s sharing an edge
    "overlap": [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (3, 10),
                (3, 12), (1, 12)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_census_vs_bruteforce(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "c long, p long")
    row = global_motifs(df, "c", "p").collect()[0]
    assert row["butterflies"] == _brute_butterflies(edges), name
    assert row["n_edges"] == len(edges)
    # wedge identity: sum over right vertices of C(d, 2)
    from collections import Counter
    dr = Counter(v for _, v in edges)
    assert row["wedges"] == sum(d * (d - 1) // 2 for d in dr.values())
    # caterpillar identity: sum over edges of (du-1)(dv-1)
    dl = Counter(u for u, _ in edges)
    assert row["caterpillars"] == sum(
        (dl[u] - 1) * (dr[v] - 1) for u, v in edges)


def test_side_symmetry(spark):
    # butterflies counted pivoting on either side must agree
    edges = GRAPHS["overlap"]
    df = spark.createDataFrame(edges, "c long, p long")
    fwd = global_motifs(df, "c", "p").collect()[0]["butterflies"]
    rev = global_motifs(df.select(F_p := "p", "c"), "p", "c") \
        .collect()[0]["butterflies"]
    assert fwd == rev


def test_side_costs_skew(spark):
    # a right hub of degree 5 dominates right-pivot wedges
    edges = [(u, 99) for u in range(5)] + [(0, 1), (0, 2)]
    df = spark.createDataFrame(edges, "c long, p long")
    rows = {r["pivot_side"]: r for r in side_costs(df, "c", "p").collect()}
    assert rows["right"]["max_degree"] == 5
    assert rows["right"]["wedges"] == 10
    assert rows["left"]["wedges"] == 3 + 0  # d(0)=3 -> C(3,2)=3
