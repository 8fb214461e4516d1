"""Sorted-neighborhood blocking vs the textbook single-node
formulation, on random keys with heavy ties (the low-cardinality case
the composite bucketing exists for)."""

import random

from bano_spark.operators.linkage import global_rank, sorted_neighborhood_pairs


def test_global_rank_matches_sort_order(spark):
    rng = random.Random(11)
    rows = [(i, rng.choice(["aa", "ab", "ba", "bb", "zz"]))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "key"]).repartition(8)
    got = {r["id"]: r["rank"]
           for r in global_rank(df, "key", "id").collect()}
    want = {rid: i + 1
            for i, (rid, _) in enumerate(sorted(rows, key=lambda p: (p[1], p[0])))}
    assert got == want


def test_snm_pairs_match_bruteforce(spark):
    rng = random.Random(23)
    rows = [(i, "k%02d" % rng.randint(0, 9)) for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "key"]).repartition(6)
    for w in (1, 3, 5):
        got = {(r["id_a"], r["id_b"]) for r in
               sorted_neighborhood_pairs(df, "key", "id", window=w).collect()}
        order = sorted(rows, key=lambda p: (p[1], p[0]))
        want = {(order[i][0], order[j][0])
                for i in range(len(order))
                for j in range(i + 1, min(i + w + 1, len(order)))}
        assert got == want
